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
_SR = 4  # rows per conv-matmul sub-chunk


def _cs_conv(xp, wmat, bias, relu):
    """Channel-on-sublane 3×3 VALID conv.

    ``xp [Ci, R, W+2]`` (column-extended input), ``wmat [Co, 9·Ci]``
    (tap-major: (dy, dx, ci)), → ``[Co, R−2, W]`` bf16.
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
        y = y + bias[:, None, None]
        if relu:
            y = jnp.maximum(y, 0.0)
        outs.append(y.astype(xp.dtype))
        r += sr
    return jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]


def _colext(x):
    """Per-level column reflect: [C, R, W] → [C, R, W+2]."""
    W = x.shape[2]
    return jnp.concatenate([x[:, :, 1:2], x, x[:, :, W - 2 : W - 1]], axis=2)


def _fix_rows(x, rt, n_tiles, top_fixes, bot_fixes):
    """Overwrite boundary-tile halo rows with per-level reflect rows.

    ``top_fixes`` = [(dst_row, src_row), ...] applied when rt == 0;
    ``bot_fixes`` likewise when rt == n_tiles − 1. Row indices are into
    dim 1 of ``x [C, R, W]``.
    """
    is_top = rt == 0
    is_bot = rt == n_tiles - 1
    rows = [x[:, i] for i in range(x.shape[1])]
    for dst, src in top_fixes:
        rows[dst] = jnp.where(is_top, rows[src], rows[dst])
    for dst, src in bot_fixes:
        rows[dst] = jnp.where(is_bot, rows[src], rows[dst])
    return jnp.stack(rows, axis=1)


def _junction_kernel(
    dt_ref, db_ref, dg_ref,
    wd1_ref, bd1_ref, wd2_ref, bd2_ref,
    we1_ref, be1_ref, we2_ref, be2_ref,
    out_ref, *, W, n_tiles, deep, clip,
):
    rt = pl.program_id(1)

    # ---- gather d rows 8·rt−2 .. 8·rt+9 (clamped) and upsample ----
    d_h = jnp.concatenate([dt_ref[0], db_ref[0], dg_ref[0]], axis=0)
    d = jnp.transpose(d_h, (2, 0, 1))  # [64, 12, 256]
    u = jnp.repeat(jnp.repeat(d, 2, axis=1), 2, axis=2)  # [64, 24, W]
    # u rows cover 16rt−4 .. 16rt+19. Boundary reflect (512-res):
    #   top: global −4..−1 → u[4..1] → local 8,7,6,5
    #   bottom: global W512..W512+3 → reflect → local 18,17,16,15
    u = _fix_rows(
        u, rt, n_tiles,
        top_fixes=[(0, 8), (1, 7), (2, 6), (3, 5)],
        bot_fixes=[(20, 18), (21, 17), (22, 16), (23, 15)],
    )
    # column reflect at 512-res: halo col −1 = col 1, col W = col W−2
    u_ext = _colext(u)

    # ---- decoder conv 64→64 + relu: m rows 16rt−3 .. 16rt+18 ----
    m = _cs_conv(u_ext, wd1_ref[:], bd1_ref[:], relu=True)  # [64, 22, W]
    m = _fix_rows(
        m, rt, n_tiles,
        top_fixes=[(0, 6), (1, 5), (2, 4)],
        bot_fixes=[(19, 17), (20, 16), (21, 15)],
    )

    # ---- decoder final conv 64→3 (linear): rgb rows 16rt−2 .. +17 ----
    rgb = _cs_conv(_colext(m), wd2_ref[:], bd2_ref[:], relu=False)  # [3,20,W]
    if clip:
        rgb = jnp.clip(rgb, 0.0, 1.0)
    rgb = _fix_rows(
        rgb, rt, n_tiles,
        top_fixes=[(0, 4), (1, 3)],
        bot_fixes=[(18, 16), (19, 15)],
    )

    # ---- encoder conv0∘conv1_1 + relu: e1 rows 16rt−1 .. +16 ----
    e1 = _cs_conv(_colext(rgb), we1_ref[:], be1_ref[:], relu=True)  # [64,18,W]

    if not deep:
        # output = relu1_1 features, rows 16rt..16rt+15
        out_ref[0] = jnp.transpose(e1[:, 1:17], (1, 2, 0)).astype(
            out_ref.dtype
        )
        return

    e1 = _fix_rows(
        e1, rt, n_tiles,
        top_fixes=[(0, 2)],
        bot_fixes=[(17, 15)],
    )

    # ---- encoder conv1_2 + relu: e2 rows 16rt .. 16rt+15 ----
    e2 = _cs_conv(_colext(e1), we2_ref[:], be2_ref[:], relu=True)  # [64,16,W]

    # ---- 2×2 max pool → [64, 8, W/2] ----
    pooled = jnp.maximum(e2[:, 0::2], e2[:, 1::2])
    pooled = jnp.maximum(pooled[:, :, 0::2], pooled[:, :, 1::2])

    out_ref[0] = jnp.transpose(pooled, (1, 2, 0)).astype(out_ref.dtype)


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
    xt_ref, xb_ref, xg_ref, we1_ref, be1_ref, we2_ref, be2_ref,
    out_ref, *, W, n_tiles,
):
    rt = pl.program_id(1)
    xh = jnp.concatenate([xt_ref[0], xb_ref[0], xg_ref[0]], axis=0)
    # [20, W*3] flat RGB rows → channel-on-sublane [3, 20, W]
    rgb = jnp.transpose(xh.reshape(xh.shape[0], W, 3), (2, 0, 1))
    # rgb rows cover 16rt−2 .. 16rt+17; image-boundary reflect fixes
    rgb = _fix_rows(
        rgb, rt, n_tiles,
        top_fixes=[(0, 4), (1, 3)],
        bot_fixes=[(18, 16), (19, 15)],
    )
    e1 = _cs_conv(_colext(rgb), we1_ref[:], be1_ref[:], relu=True)
    e1 = _fix_rows(
        e1, rt, n_tiles, top_fixes=[(0, 2)], bot_fixes=[(17, 15)]
    )
    e2 = _cs_conv(_colext(e1), we2_ref[:], be2_ref[:], relu=True)
    pooled = jnp.maximum(e2[:, 0::2], e2[:, 1::2])
    pooled = jnp.maximum(pooled[:, :, 0::2], pooled[:, :, 1::2])
    out_ref[0] = jnp.transpose(pooled, (1, 2, 0)).astype(out_ref.dtype)


def encoder_head(
    img: jax.Array,
    enc_w0: jax.Array, enc_b0: jax.Array,
    enc_w11: jax.Array, enc_b11: jax.Array,
    enc_w12: jax.Array, enc_b12: jax.Array,
) -> jax.Array:
    """Fused [conv0∘conv1_1 → relu → conv1_2 → relu → pool1] on RGB.

    ``img [B, H, W, 3]`` → post-pool1 encoder state ``[B, H/2, W/2, 64]``
    (feed ``vgg.encode_from_pool1`` for deeper targets). The RGB input
    is consumed through a flat ``[B, H, W·3]`` view — a [.,.,.,3] NHWC
    array would be lane-padded 3→128 (42× DMA amplification).
    Requires H % 16 == 0, W % 16 == 0.
    """
    B, H, W, c = img.shape
    assert c == 3 and H % _T == 0 and W % 16 == 0, (img.shape,)
    n_tiles = H // _T
    dtype = img.dtype
    flat = img.reshape(B, H, W * 3)

    ew, eb = fold_conv0(enc_w0, enc_b0, enc_w11, enc_b11)
    mats = [
        _tap_mat(ew, dtype), eb.astype(jnp.float32),
        _tap_mat(enc_w12, dtype), enc_b12.astype(jnp.float32),
    ]

    def top_map(bi, rt):
        return (bi, jnp.maximum(8 * rt - 1, 0), 0)

    def bot_map(bi, rt):
        return (bi, jnp.minimum(8 * rt + 8, H // 2 - 1), 0)

    in_specs = [
        pl.BlockSpec((1, 2, W * 3), top_map),
        pl.BlockSpec((1, _T, W * 3), lambda bi, rt: (bi, rt, 0)),
        pl.BlockSpec((1, 2, W * 3), bot_map),
    ]
    for mat in mats:
        in_specs.append(
            pl.BlockSpec(mat.shape,
                         (lambda bi, rt, nd=mat.ndim: (0,) * nd),
                         memory_space=pltpu.VMEM)
        )
    kern = functools.partial(_head_kernel, W=W, n_tiles=n_tiles)
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        kern,
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, _T // 2, W // 2, 64), lambda bi, rt: (bi, rt, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((B, H // 2, W // 2, 64), dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * 9 * (3 * 64 + 64 * 64),
            bytes_accessed=B * H * W * (3 + 16) * 2,
            transcendentals=0,
        ),
    )(flat, flat, flat, *mats)


def _tail_kernel(xt_ref, xb_ref, xg_ref, w_ref, b_ref, out_ref, *, W,
                 clip):
    xh = jnp.concatenate([xt_ref[0], xb_ref[0], xg_ref[0]], axis=0)
    x = jnp.transpose(xh, (2, 0, 1))  # [64, 18, W]
    y = _cs_conv(_colext(x), w_ref[0], b_ref[0], relu=False)  # [3, 16, W]
    if clip:
        y = jnp.clip(y, 0.0, 1.0)
    out = jnp.transpose(y, (1, 2, 0)).reshape(_T, W * 3)
    out_ref[0] = out.astype(out_ref.dtype)


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
    this single conv needs no boundary fix-ups. RGB is written through
    a flat ``[B, H, W·3]`` buffer (lane-padding dodge) and reshaped.
    Requires H % 16 == 0, W % 16 == 0, C = 64.
    """
    B, H, W, c = f.shape
    assert c == 64 and H % _T == 0 and W % 16 == 0, (f.shape,)
    dtype = f.dtype
    # [B,3,3,64,3] → per-image tap-major [B, 3, 576]
    wmat = jnp.transpose(w, (0, 4, 1, 2, 3)).reshape(B, 3, 9 * 64)
    wmat = wmat.astype(dtype)
    b32 = b.astype(jnp.float32)

    def top_map(bi, rt):
        return (bi, jnp.abs(rt * _T - 1), 0, 0)

    def bot_map(bi, rt):
        g = rt * _T + _T
        return (bi, jnp.minimum(g, 2 * (H - 1) - g), 0, 0)

    kern = functools.partial(_tail_kernel, W=W, clip=clip)
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        kern,
        grid=(B, H // _T),
        in_specs=[
            pl.BlockSpec((1, 1, W, 64), top_map),
            pl.BlockSpec((1, _T, W, 64), lambda bi, rt: (bi, rt, 0, 0)),
            pl.BlockSpec((1, 1, W, 64), bot_map),
            pl.BlockSpec((1, 3, 9 * 64), lambda bi, rt: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda bi, rt: (bi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, _T, W * 3), lambda bi, rt: (bi, rt, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W * 3), dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * 9 * 64 * 3,
            bytes_accessed=B * H * W * (64 + 3) * 2,
            transcendentals=0,
        ),
    )(f, f, f, wmat, b32)
    return out.reshape(B, H, W, 3)


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
    mats = [
        _tap_mat(dec_w1, dtype), dec_b1.astype(jnp.float32),
        _tap_mat(dec_w2, dtype), dec_b2.astype(jnp.float32),
        _tap_mat(ew, dtype), eb.astype(jnp.float32),
    ]
    if deep:
        assert enc_w12 is not None and enc_b12 is not None
        mats += [_tap_mat(enc_w12, dtype), enc_b12.astype(jnp.float32)]
    else:
        # placeholders keep the kernel signature static
        mats += [jnp.zeros((64, 576), dtype), jnp.zeros((64,), jnp.float32)]

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
    return pl.pallas_call(
        kern,
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * 9 * 64 * (64 + 3 + 64 + (64 if deep else 0)),
            bytes_accessed=B * h * wd * 64 * 4,
            transcendentals=0,
        ),
    )(d, d, d, *mats)
