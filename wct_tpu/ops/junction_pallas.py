"""Fused cascade-junction Pallas kernel (decoder tail → encoder head).

Between cascade levels, the 512²-resolution tier does six memory-bound
passes over full-size feature maps (measured in-cascade at 512px
batch-16, scripts/profile_trace.py / DESIGN.md §3):

    upsample 256²→512²   broadcast      2.1 ms
    dec conv 64→64+relu  fusion         7.4 ms
    dec conv 64→3        fusion         5.6 ms
    enc conv0+1_1+relu   fusion         2.1 ms
    enc conv1_2+relu     fusion         7.1 ms
    maxpool 512²→256²    fusion         1.9 ms
                                       ≈26.3 ms per junction, ×4/frame

Every intermediate is a ~537 MB (logical) map that XLA round-trips
through HBM. This kernel runs the whole junction per 16-row output
tile with every intermediate in VMEM: HBM traffic collapses to
read d [B,256,256,64] + write pooled [B,256,256,64].

Design rules (all measured, DESIGN.md §3):
- HBM blocks stay NHWC (what the surrounding XLA cascade produces);
  only the SMALL 256²-res d/out tiles are transposed to channel-on-
  sublane form in VMEM — the big 512²-res intermediates are born and
  die in [C, rows, W] form, W on lanes, no padding anywhere.
- Convs are tap-stacked matmuls  w[Co, 9·Ci] @ z[9·Ci, rows, W]  — the
  tap stack concatenates on an UNTILED dim (free) and there are no
  output shifted-adds (the failure mode of ops/conv_pallas.py).
- Reflect padding follows the reference semantics EXACTLY: each conv
  reflects ITS OWN input. Interior tiles take real halo rows from the
  upsampled d neighborhood; image-boundary tiles overwrite the few
  halo rows with per-level reflect rows via ``jnp.where`` on the tile
  index (computing a conv on an input-extended domain does NOT equal
  reflect-of-output at the edge — a 3-tap conv of reversed inputs
  differs unless the kernel is symmetric).

Weight preparation (XLA side, wct_tpu.models.cascade wires it):
- dec conv 64→64 / 64→3: used as-is.
- enc conv0 (1×1 preprocessing) folds into conv1_1 (both linear):
  w'[ky,kx] = W₀ @ w[ky,kx],  b' = b₁ + b₀ @ Σ_{ky,kx} w[ky,kx].

Reference parity: this computes decoder tail (model.py:~85–140) +
encoder head (model.py:~15–80) of eridgd/WCT-TF bit-for-bit in math,
with bf16 operands and f32 accumulation like the XLA path; only
matmul association differs (ULP-level).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Output tile height at 512-res. 16 ⇒ d tiles of 8 rows at 256-res.
_T = 16
_SR = 2  # rows per conv-matmul sub-chunk (VMEM-bounded: z is [576, _SR, W])


def _cs_conv(xp, wmat, bias, relu):
    """Channel-on-sublane 3×3 VALID conv, value → value.

    ``xp [Ci, R, W+2]`` (column-extended input), ``wmat [Co, 9·Ci]``
    (tap-major: (dy, dx, ci)), ``bias [Co, 1, 1]`` (pre-shaped — a
    rank-changing ``bias[:, None, None]`` is a Mosaic-unsupported
    shape cast), → ``[Co, R−2, W]``. Only for SMALL inputs: on the
    512-tier use ``_cs_conv_ref`` — Mosaic stack-allocates every
    unrolled sub-chunk's z/y buffer of a value-form conv at once and
    blows the 16 MB scoped-VMEM limit.
    """
    ci, R, Wp = xp.shape
    W = Wp - 2
    rows_out = R - 2
    outs = []
    r = 0
    while r < rows_out:
        sr = min(_SR, rows_out - r)
        taps = []
        for dy in range(3):
            for dx in range(3):
                taps.append(xp[:, r + dy : r + dy + sr, dx : dx + W])
        z = jnp.concatenate(taps, axis=0)  # [9*ci, sr, W]
        y = jax.lax.dot_general(
            wmat, z,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Co, sr, W] f32
        y = y + bias
        if relu:
            y = jnp.maximum(y, 0.0)
        outs.append(y.astype(xp.dtype))
        r += sr
    return jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]


def _cs_conv_ref(src_ref, wmat, bias, relu, dst_ref, dst_colext):
    """Scratch-ref conv: read col-extended ``src_ref [Ci, R, W+2]``,
    write ``[Co, R−2, W]`` rows into ``dst_ref`` (at column offset 1
    when ``dst_colext`` so the destination is itself col-extended).
    The per-chunk STORE breaks the SSA chain, so Mosaic reuses the
    z/y buffers across chunks instead of stack-allocating all of them.
    """
    co = wmat.shape[0]
    ci = wmat.shape[1] // 9
    _, R, Wp = src_ref.shape
    W = Wp - 2
    rows_out = R - 2
    c0 = 1 if dst_colext else 0
    r = 0
    while r < rows_out:
        sr = min(_SR, rows_out - r)
        taps = []
        for dy in range(3):
            for dx in range(3):
                taps.append(
                    src_ref[0:ci, r + dy : r + dy + sr, dx : dx + W]
                )
        z = jnp.concatenate(taps, axis=0)
        y = jax.lax.dot_general(
            wmat, z,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = y + bias
        if relu:
            y = jnp.maximum(y, 0.0)
        dst_ref[0:co, r : r + sr, c0 : c0 + W] = y.astype(dst_ref.dtype)
        r += sr


def _fix_rows_ref(ref, rt, n_tiles, top_fixes, bot_fixes):
    """_fix_rows operating in place on a scratch ref."""
    is_top = rt == 0
    is_bot = rt == n_tiles - 1
    for dst, src in top_fixes:
        ref[:, dst : dst + 1] = jnp.where(
            is_top, ref[:, src : src + 1], ref[:, dst : dst + 1]
        )
    for dst, src in bot_fixes:
        ref[:, dst : dst + 1] = jnp.where(
            is_bot, ref[:, src : src + 1], ref[:, dst : dst + 1]
        )


def _colext_ref(ref, W):
    """Fill a col-extended scratch's reflect halo columns in place."""
    ref[:, :, 0:1] = ref[:, :, 2:3]
    ref[:, :, W + 1 : W + 2] = ref[:, :, W - 1 : W]


def _colext(x):
    """Per-level column reflect: [C, R, W] → [C, R, W+2]."""
    W = x.shape[2]
    return jnp.concatenate([x[:, :, 1:2], x, x[:, :, W - 2 : W - 1]], axis=2)


def _pool2_cs(x, sel_even, sel_odd):
    """2×2 max pool in channel-on-sublane form WITHOUT strided slices
    (Mosaic lowers them to an unsupported gather): row pairs via
    explicit slices, lane pairs via even/odd selection matmuls
    (``sel_even/sel_odd [W, W/2]``, one-hot columns)."""
    C, R, W = x.shape
    rows = [
        jnp.maximum(x[:, 2 * i : 2 * i + 1], x[:, 2 * i + 1 : 2 * i + 2])
        for i in range(R // 2)
    ]
    xr = jnp.concatenate(rows, axis=1)  # [C, R/2, W]
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    even = dot(xr, sel_even).astype(x.dtype)
    odd = dot(xr, sel_odd).astype(x.dtype)
    return jnp.maximum(even, odd)  # [C, R/2, W/2]


def _sel_mats(W, dtype):
    """Even/odd lane-selection matrices [W, W/2] for _pool2_cs."""
    eye = jnp.eye(W // 2, dtype=jnp.float32)
    zero = jnp.zeros_like(eye)
    even = jnp.stack([eye, zero], axis=1).reshape(W, W // 2)
    odd = jnp.stack([zero, eye], axis=1).reshape(W, W // 2)
    return even.astype(dtype), odd.astype(dtype)


def _t_cs(x):
    """[R, W, C] → [C, R, W] via an identity matmul (Mosaic rejects
    in-kernel 3-D ``jnp.transpose`` / shape casts; an MXU contraction
    against I_C moves values exactly — 1·x sums of one term)."""
    c = x.shape[2]
    eye = jnp.eye(c, dtype=x.dtype)
    # tpu.matmul requires a 32-bit accumulator; the cast back is exact
    # (every output element is 1·x of a single term)
    return jax.lax.dot_general(
        eye, x,
        dimension_numbers=(((1,), (2,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _t_sc(x):
    """[C, R, W] → [R, W, C] via an identity matmul (see _t_cs)."""
    c = x.shape[0]
    eye = jnp.eye(c, dtype=x.dtype)
    return jax.lax.dot_general(
        x, eye,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _fix_rows(x, rt, n_tiles, top_fixes, bot_fixes):
    """Overwrite boundary-tile halo rows with per-level reflect rows.

    ``top_fixes`` = [(dst_row, src_row), ...] applied when rt == 0;
    ``bot_fixes`` likewise when rt == n_tiles − 1. Row indices are into
    dim 1 of ``x [C, R, W]``. Uses width-1 slices (no squeeze — Mosaic
    rejects rank-changing shape casts)."""
    is_top = rt == 0
    is_bot = rt == n_tiles - 1
    rows = [x[:, i : i + 1] for i in range(x.shape[1])]
    for dst, src in top_fixes:
        rows[dst] = jnp.where(is_top, rows[src], rows[dst])
    for dst, src in bot_fixes:
        rows[dst] = jnp.where(is_bot, rows[src], rows[dst])
    return jnp.concatenate(rows, axis=1)


def _junction_kernel(
    dt_ref, db_ref, dg_ref, eye2_ref, sel_e_ref, sel_o_ref,
    wd1_ref, bd1_ref, wd2_ref, bd2_ref,
    we1_ref, be1_ref, we2_ref, be2_ref,
    out_ref, u_s, m_s, rgb_s, e1_s, e2_s,
    *, W, n_tiles, deep, clip,
):
    rt = pl.program_id(1)

    # ---- gather d rows 8·rt−2 .. 8·rt+9 (clamped) and upsample ----
    d_h = jnp.concatenate([dt_ref[0], db_ref[0], dg_ref[0]], axis=0)
    d = _t_cs(d_h)  # [64, 12, 256]
    # 2× nearest upsample WITHOUT jnp.repeat (Mosaic lowers repeat to
    # an unsupported >2D gather): rows by slice-interleave concat,
    # columns by a matmul with the [wd, 2wd] interleave matrix
    # (E[j, 2j] = E[j, 2j+1] = 1) — exact value duplication.
    rows = []
    for i in range(d.shape[1]):
        rows += [d[:, i : i + 1], d[:, i : i + 1]]
    d2 = jnp.concatenate(rows, axis=1)  # [64, 24, wd]
    # column-interleave matmul in two half-row chunks: the f32
    # accumulator for the whole [64, 24, W] tile alone would be ~3 MB
    # of scoped VMEM (the per-chunk store lets Mosaic reuse it)
    for r0, r1 in ((0, 12), (12, 24)):
        u_s[:, r0:r1, 1 : W + 1] = jax.lax.dot_general(
            d2[:, r0:r1], eye2_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(u_s.dtype)
    # u rows cover 16rt−4 .. 16rt+19. Boundary reflect (512-res):
    _fix_rows_ref(
        u_s, rt, n_tiles,
        top_fixes=[(0, 8), (1, 7), (2, 6), (3, 5)],
        bot_fixes=[(20, 18), (21, 17), (22, 16), (23, 15)],
    )
    _colext_ref(u_s, W)

    # ---- decoder conv 64→64 + relu: m rows 16rt−3 .. 16rt+18 ----
    _cs_conv_ref(u_s, wd1_ref[:], bd1_ref[:], True, m_s, dst_colext=True)
    _fix_rows_ref(
        m_s, rt, n_tiles,
        top_fixes=[(0, 6), (1, 5), (2, 4)],
        bot_fixes=[(19, 17), (20, 16), (21, 15)],
    )
    _colext_ref(m_s, W)

    # ---- decoder final conv 64→3 (linear): rgb rows 16rt−2 .. +17 ----
    _cs_conv_ref(m_s, wd2_ref[:], bd2_ref[:], False, rgb_s, dst_colext=True)
    if clip:
        rgb_s[:, :, 1 : W + 1] = jnp.clip(rgb_s[:, :, 1 : W + 1], 0.0, 1.0)
    _fix_rows_ref(
        rgb_s, rt, n_tiles,
        top_fixes=[(0, 4), (1, 3)],
        bot_fixes=[(18, 16), (19, 15)],
    )
    _colext_ref(rgb_s, W)

    # ---- encoder conv0∘conv1_1 + relu: e1 rows 16rt−1 .. +16 ----
    _cs_conv_ref(rgb_s, we1_ref[:], be1_ref[:], True, e1_s, dst_colext=True)

    if not deep:
        # output = relu1_1 features, rows 16rt..16rt+15, stored in
        # 4-row chunks (the full-tile transpose's f32 accumulator +
        # the 2× larger full-res out block overflow scoped VMEM)
        for r in range(0, _T, 4):
            out_ref[0, r : r + 4] = _t_sc(
                e1_s[:, 1 + r : 5 + r, 1 : W + 1]
            ).astype(out_ref.dtype)
        return

    _fix_rows_ref(
        e1_s, rt, n_tiles,
        top_fixes=[(0, 2)],
        bot_fixes=[(17, 15)],
    )
    _colext_ref(e1_s, W)

    # ---- encoder conv1_2 + relu: e2 rows 16rt .. 16rt+15 ----
    _cs_conv_ref(e1_s, we2_ref[:], be2_ref[:], True, e2_s, dst_colext=False)

    # ---- 2×2 max pool → [64, 8, W/2] ----
    pooled = _pool2_cs(e2_s[:, :, :], sel_e_ref[:], sel_o_ref[:])

    out_ref[0] = _t_sc(pooled).astype(out_ref.dtype)


def _tap_mat(w, dtype):
    """[3,3,ci,co] HWIO → [co, 9·ci] tap-major (dy, dx, ci)."""
    co = w.shape[3]
    return jnp.transpose(w, (3, 0, 1, 2)).reshape(co, -1).astype(dtype)


def fold_conv0(w0, b0, w11, b11):
    """Fold the 1×1 preprocessing conv into conv1_1 (both linear).

    ``w0 [1,1,3,3]``, ``w11 [3,3,3,64]`` →
    ``(w' [3,3,3,64], b' [64])`` with conv'(x) = conv1_1(conv0(x)).
    """
    w0m = w0[0, 0].astype(jnp.float32)        # [3in, 3out]
    w11f = w11.astype(jnp.float32)
    w_f = jnp.einsum("ij,yxjo->yxio", w0m, w11f)
    b_f = b11.astype(jnp.float32) + jnp.einsum(
        "j,yxjo->o", b0.astype(jnp.float32), w11f
    )
    return w_f, b_f


def _head_kernel(
    xt_ref, xb_ref, xg_ref, sel_e_ref, sel_o_ref,
    we1_ref, be1_ref, we2_ref, be2_ref,
    out_ref, rgb_s, e1_s, e2_s, *, W, n_tiles,
):
    rt = pl.program_id(1)
    # Planar [B, 3, H, W] input: blocks arrive channel-on-sublane with
    # no reshape (Mosaic cannot compile lane-split shape casts). Ghost
    # blocks are 8 rows (rows are second-to-minor → 8-aligned); only
    # the 2 rows adjacent to the body are used.
    rgb_s[:, :, 1 : W + 1] = jnp.concatenate(
        [xt_ref[0, :, 6:8], xb_ref[0], xg_ref[0, :, 0:2]], axis=1
    )
    # rgb rows cover 16rt−2 .. 16rt+17; image-boundary reflect fixes
    _fix_rows_ref(
        rgb_s, rt, n_tiles,
        top_fixes=[(0, 4), (1, 3)],
        bot_fixes=[(18, 16), (19, 15)],
    )
    _colext_ref(rgb_s, W)
    _cs_conv_ref(rgb_s, we1_ref[:], be1_ref[:], True, e1_s, dst_colext=True)
    _fix_rows_ref(
        e1_s, rt, n_tiles, top_fixes=[(0, 2)], bot_fixes=[(17, 15)]
    )
    _colext_ref(e1_s, W)
    _cs_conv_ref(e1_s, we2_ref[:], be2_ref[:], True, e2_s, dst_colext=False)
    pooled = _pool2_cs(e2_s[:, :, :], sel_e_ref[:], sel_o_ref[:])
    out_ref[0] = _t_sc(pooled).astype(out_ref.dtype)


def encoder_head(
    img: jax.Array,
    enc_w0: jax.Array, enc_b0: jax.Array,
    enc_w11: jax.Array, enc_b11: jax.Array,
    enc_w12: jax.Array, enc_b12: jax.Array,
) -> jax.Array:
    """Fused [conv0∘conv1_1 → relu → conv1_2 → relu → pool1] on RGB.

    ``img [B, H, W, 3]`` → post-pool1 encoder state ``[B, H/2, W/2, 64]``
    (feed ``vgg.encode_from_pool1`` for deeper targets). The RGB input
    is consumed through a PLANAR ``[B, 3, H, W]`` transpose (tiny, 2
    bytes/px) — a [.,.,.,3] NHWC block would be lane-padded 3→128
    (42× DMA amplification), and in-kernel lane-split reshapes do not
    compile. Requires H % 16 == 0, W % 16 == 0.
    """
    B, H, W, c = img.shape
    assert c == 3 and H % _T == 0 and W % 16 == 0, (img.shape,)
    n_tiles = H // _T
    dtype = img.dtype
    planar = jnp.transpose(img, (0, 3, 1, 2))

    ew, eb = fold_conv0(enc_w0, enc_b0, enc_w11, enc_b11)
    sel_e, sel_o = _sel_mats(W, dtype)
    mats = [
        sel_e, sel_o,
        _tap_mat(ew, dtype), eb.astype(jnp.float32).reshape(-1, 1, 1),
        _tap_mat(enc_w12, dtype),
        enc_b12.astype(jnp.float32).reshape(-1, 1, 1),
    ]

    def top_map(bi, rt):
        return (bi, 0, jnp.maximum(2 * rt - 1, 0), 0)

    def bot_map(bi, rt):
        return (bi, 0, jnp.minimum(2 * rt + 2, H // 8 - 1), 0)

    in_specs = [
        pl.BlockSpec((1, 3, 8, W), top_map),
        pl.BlockSpec((1, 3, _T, W), lambda bi, rt: (bi, 0, rt, 0)),
        pl.BlockSpec((1, 3, 8, W), bot_map),
    ]
    for mat in mats:
        in_specs.append(
            pl.BlockSpec(mat.shape,
                         (lambda bi, rt, nd=mat.ndim: (0,) * nd),
                         memory_space=pltpu.VMEM)
        )
    kern = functools.partial(_head_kernel, W=W, n_tiles=n_tiles)
    interpret = jax.default_backend() != "tpu"
    scratch = [
        pltpu.VMEM((3, 20, W + 2), dtype),   # rgb (col-extended)
        pltpu.VMEM((64, 18, W + 2), dtype),  # e1
        pltpu.VMEM((64, 16, W), dtype),      # e2
    ]
    return pl.pallas_call(
        kern,
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, _T // 2, W // 2, 64), lambda bi, rt: (bi, rt, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((B, H // 2, W // 2, 64), dtype),
        scratch_shapes=scratch,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * 9 * (3 * 64 + 64 * 64),
            bytes_accessed=B * H * W * (3 + 16) * 2,
            transcendentals=0,
        ),
    )(planar, planar, planar, *mats)


def _tail_kernel(xt_ref, xb_ref, xg_ref, w_ref, b_ref, out_ref, x_s,
                 *, W, clip):
    xh = jnp.concatenate([xt_ref[0], xb_ref[0], xg_ref[0]], axis=0)
    x_s[:, :, 1 : W + 1] = _t_cs(xh)  # [64, 18, W]
    _colext_ref(x_s, W)
    # chunks write straight into the planar out block
    co = w_ref.shape[1]
    r = 0
    while r < _T:
        sr = min(_SR, _T - r)
        taps = []
        for dy in range(3):
            for dx in range(3):
                taps.append(x_s[:, r + dy : r + dy + sr, dx : dx + W])
        z = jnp.concatenate(taps, axis=0)
        y = jax.lax.dot_general(
            w_ref[0], z,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = y + b_ref[0]
        if clip:
            y = jnp.clip(y, 0.0, 1.0)
        out_ref[0, :, r : r + sr] = y.astype(out_ref.dtype)
        r += sr


def decoder_tail(
    f: jax.Array, w: jax.Array, b: jax.Array, clip: bool = False
) -> jax.Array:
    """Final 64→3 decoder conv with PER-IMAGE weights, RGB out.

    ``f [B, H, W, 64]`` relu1_1-level features, ``w [B, 3, 3, 64, 3]``,
    ``b [B, 3]`` → RGB ``[B, H, W, 3]``. Per-image weights exist so the
    cascade can fold each image's WCT/AdaIN affine INTO this conv
    (models/cascade.py) — the route XLA's ``batch_group_count`` conv
    makes ~4.4× slower than a shared conv (DESIGN.md §3), but which is
    native to Pallas: the weight BlockSpec simply indexes by the batch
    grid coordinate. Ghost-row index maps encode the reflect rule, so
    this single conv needs no boundary fix-ups. RGB is written PLANAR
    ``[B, 3, H, W]`` (lane-padding dodge; in-kernel lane-merge
    reshapes do not compile) and transposed back outside (tiny).
    Requires H % 16 == 0, W % 16 == 0, C = 64.
    """
    B, H, W, c = f.shape
    assert c == 64 and H % _T == 0 and W % 16 == 0, (f.shape,)
    dtype = f.dtype
    # [B,3,3,64,3] → per-image tap-major [B, 3, 576]
    wmat = jnp.transpose(w, (0, 4, 1, 2, 3)).reshape(B, 3, 9 * 64)
    wmat = wmat.astype(dtype)
    # [B, 3, 1, 1]: pre-shaped for the in-kernel broadcast add AND so
    # every block dim equals the array dim (Mosaic's block-shape rule)
    b32 = b.astype(jnp.float32)[:, :, None, None]

    def top_map(bi, rt):
        return (bi, jnp.abs(rt * _T - 1), 0, 0)

    def bot_map(bi, rt):
        g = rt * _T + _T
        return (bi, jnp.minimum(g, 2 * (H - 1) - g), 0, 0)

    kern = functools.partial(_tail_kernel, W=W, clip=clip)
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        kern,
        scratch_shapes=[pltpu.VMEM((64, 18, W + 2), dtype)],
        grid=(B, H // _T),
        in_specs=[
            pl.BlockSpec((1, 1, W, 64), top_map),
            pl.BlockSpec((1, _T, W, 64), lambda bi, rt: (bi, rt, 0, 0)),
            pl.BlockSpec((1, 1, W, 64), bot_map),
            pl.BlockSpec((1, 3, 9 * 64), lambda bi, rt: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 1, 1), lambda bi, rt: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 3, _T, W), lambda bi, rt: (bi, 0, rt, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((B, 3, H, W), dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * 9 * 64 * 3,
            bytes_accessed=B * H * W * (64 + 3) * 2,
            transcendentals=0,
        ),
    )(f, f, f, wmat, b32)
    return jnp.transpose(out, (0, 2, 3, 1))


def junction(
    d: jax.Array,
    dec_w1: jax.Array, dec_b1: jax.Array,
    dec_w2: jax.Array, dec_b2: jax.Array,
    enc_w0: jax.Array, enc_b0: jax.Array,
    enc_w11: jax.Array, enc_b11: jax.Array,
    enc_w12: jax.Array | None = None, enc_b12: jax.Array | None = None,
    *,
    deep: bool = True,
    clip: bool = False,
) -> jax.Array:
    """Fused [upsample → dec conv64→64 → dec conv64→3 → (clip) →
    enc conv0∘conv1_1 → (conv1_2 → pool)] on ``d [B, h, w, 64]`` NHWC.

    ``deep=True`` → pooled relu-conv1_2 output ``[B, h, w, 64]`` (the
    encoder state right after pool1 for the next cascade level);
    ``deep=False`` → relu1_1 features ``[B, 2h, 2w, 64]``.
    Requires 2h % 16 == 0 and 2w % 16 == 0 (block sublane tiling);
    lane efficiency is best when 2w is a multiple of 128 (the 512px
    tier: h = w = 256).
    """
    B, h, wd, c = d.shape
    assert c == 64, "junction is specialized for the 64-channel tier"
    H, W = 2 * h, 2 * wd
    assert H % _T == 0 and W % 16 == 0, (H, W)
    n_tiles = H // _T
    dtype = d.dtype

    ew, eb = fold_conv0(enc_w0, enc_b0, enc_w11, enc_b11)
    # column-interleave matrix for the in-kernel 2× upsample
    eye2 = (
        jnp.repeat(jnp.eye(wd, dtype=jnp.float32), 2, axis=1)
    ).astype(dtype)
    sel_e, sel_o = _sel_mats(W, dtype)

    def b3(v):
        return v.astype(jnp.float32).reshape(-1, 1, 1)

    mats = [
        eye2, sel_e, sel_o,
        _tap_mat(dec_w1, dtype), b3(dec_b1),
        _tap_mat(dec_w2, dtype), b3(dec_b2),
        _tap_mat(ew, dtype), b3(eb),
    ]
    if deep:
        assert enc_w12 is not None and enc_b12 is not None
        mats += [_tap_mat(enc_w12, dtype), b3(enc_b12)]
    else:
        # placeholders keep the kernel signature static
        mats += [jnp.zeros((64, 576), dtype), jnp.zeros((64, 1, 1), jnp.float32)]

    # d row-tiles: body 8 rows (256-res) + 2-row ghost blocks above and
    # below (clamped at the image edges; boundary values are then
    # overwritten by the in-kernel reflect fixes).
    def top_map(bi, rt):
        return (bi, jnp.maximum(4 * rt - 1, 0), 0, 0)

    def bot_map(bi, rt):
        return (bi, jnp.minimum(4 * rt + 4, h // 2 - 1), 0, 0)

    in_specs = [
        pl.BlockSpec((1, 2, wd, 64), top_map),
        pl.BlockSpec((1, 8, wd, 64), lambda bi, rt: (bi, rt, 0, 0)),
        pl.BlockSpec((1, 2, wd, 64), bot_map),
    ]
    for mat in mats:
        in_specs.append(
            pl.BlockSpec(mat.shape,
                         (lambda bi, rt, nd=mat.ndim: (0,) * nd),
                         memory_space=pltpu.VMEM)
        )

    if deep:
        out_shape = jax.ShapeDtypeStruct((B, h, wd, 64), dtype)
        out_spec = pl.BlockSpec(
            (1, _T // 2, wd, 64), lambda bi, rt: (bi, rt, 0, 0)
        )
    else:
        out_shape = jax.ShapeDtypeStruct((B, H, W, 64), dtype)
        out_spec = pl.BlockSpec(
            (1, _T, W, 64), lambda bi, rt: (bi, rt, 0, 0)
        )

    kern = functools.partial(
        _junction_kernel, W=W, n_tiles=n_tiles, deep=deep, clip=clip
    )
    interpret = jax.default_backend() != "tpu"
    scratch = [
        pltpu.VMEM((64, 24, W + 2), dtype),  # u (col-extended)
        pltpu.VMEM((64, 22, W + 2), dtype),  # m
        pltpu.VMEM((3, 20, W + 2), dtype),   # rgb
        pltpu.VMEM((64, 18, W + 2), dtype),  # e1
        pltpu.VMEM((64, 16, W), dtype),      # e2
    ]
    return pl.pallas_call(
        kern,
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * 9 * 64 * (64 + 3 + 64 + (64 if deep else 0)),
            bytes_accessed=B * h * wd * 64 * 4,
            transcendentals=0,
        ),
    )(d, d, d, *mats)
