"""Image-pair channel packing for the 64-channel cascade tier (pure XLA).

On TPU v5e, the cascade's 64-channel 512px convs run with half the MXU
lanes idle and on 64→128 lane-padded arrays. Packing IMAGE PAIRS
channel-wise (``[B, H, W, 64] → [B/2, H, W, 128]``, contiguous halves
— a strided ``x[0::2]`` pairing is a 16 ms gather at this size) with
BLOCK-DIAGONAL weights doubles the nominal FLOPs but fills all 128
lanes and removes the padding. Measured on the full junction segment
(upsample → dec conv64→64 → dec conv64→3 → enc conv0∘conv1_1 →
conv1_2 → pool, batch 16 at 512px): 32.7 → 27.6 ms INCLUDING the
pack/unpack concats (scripts/exp_paired_conv.py has the per-conv
numbers).

Math is identical to the unpacked ops: the off-diagonal weight blocks
are exact zeros, so every accumulated product is the same — only the
reduction grouping (and hence fp rounding) differs, as with any XLA
retiling. Used by ``CascadeConfig(pack2_junction=True)`` through the
same cascade state machine as the Pallas junction (which measured
SLOWER than XLA and stays separate — DESIGN.md §3).

Requires an even batch; odd batches take the unpacked path (decided at
trace time from static shapes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from wct_tpu.ops.convs import (
    compose_1x1_into_conv,
    conv2d_reflect,
    conv2d_reflect_ring,
    maxpool2,
    upsample_nearest2,
)
from wct_tpu.ops.wct import DEFAULT_EPS, DEFAULT_TRUNC


def _blockdiag(w: jax.Array) -> jax.Array:
    """[kh, kw, ci, co] → [kh, kw, 2ci, 2co] with two diagonal copies."""
    kh, kw, ci, co = w.shape
    z = jnp.zeros((kh, kw, 2 * ci, 2 * co), w.dtype)
    return z.at[:, :, :ci, :co].set(w).at[:, :, ci:, co:].set(w)


def _dup(b: jax.Array) -> jax.Array:
    return jnp.concatenate([b, b])


def pack(x: jax.Array) -> jax.Array:
    """[B, H, W, C] → [B/2, H, W, 2C]; image i pairs with image i+B/2."""
    B = x.shape[0]
    return jnp.concatenate([x[: B // 2], x[B // 2 :]], axis=-1)


def unpack(x: jax.Array) -> jax.Array:
    """Inverse of ``pack``."""
    c = x.shape[-1] // 2
    return jnp.concatenate([x[..., :c], x[..., c:]], axis=0)


def junction_pack2(
    d: jax.Array,
    dec_w1, dec_b1, dec_w2, dec_b2,
    enc_w0, enc_b0, enc_w11, enc_b11,
    enc_w12=None, enc_b12=None,
    *,
    deep: bool = True,
    clip: bool = False,
    unpack_out: bool = True,
    precision=None,
    ring: bool = False,
    compose_pre: bool = False,
) -> jax.Array:
    """The cascade junction segment on image-paired arrays.

    Same contract as ``junction_pallas.junction``: ``d [B, h, w, 64]``
    (pre-upsample decoder feature) → ``deep=True``: post-pool1 encoder
    state ``[B, h, w, 64]``; ``deep=False``: relu1_1 features
    ``[B, 2h, 2w, 64]``. ``unpack_out=False`` (deep=False only) keeps
    the relu1_1 features PACKED ``[B/2, 2h, 2w, 128]`` so the level-1
    tail (``tail_pack2``) can consume them without re-packing — the
    packed layout has no 64→128 lane padding, so the tail's [N, C]
    reshape is free instead of a physical copy.
    """
    conv = conv2d_reflect_ring if ring else conv2d_reflect
    if compose_pre:
        # conv0 and conv1_1 are adjacent linear ops (any clip sits
        # BEFORE conv0); fold conv0 away, composing BEFORE block-diag.
        enc_w11, enc_b11 = compose_1x1_into_conv(
            enc_w0, enc_b0, enc_w11, enc_b11
        )
    dp = pack(d)
    u = upsample_nearest2(dp)
    m = jax.nn.relu(
        conv(u, _blockdiag(dec_w1), _dup(dec_b1), precision=precision)
    )
    rgb = conv(m, _blockdiag(dec_w2), _dup(dec_b2), precision=precision)
    if clip:
        rgb = jnp.clip(rgb, 0.0, 1.0)
    x = rgb if compose_pre else conv(
        rgb, _blockdiag(enc_w0), _dup(enc_b0), precision=precision
    )
    e1 = jax.nn.relu(
        conv(x, _blockdiag(enc_w11), _dup(enc_b11), precision=precision)
    )
    if not deep:
        return unpack(e1) if unpack_out else e1
    e2 = jax.nn.relu(
        conv(e1, _blockdiag(enc_w12), _dup(enc_b12), precision=precision)
    )
    return unpack(maxpool2(e2))


def head_pack2_shallow(
    img: jax.Array, enc_w0, enc_b0, enc_w11, enc_b11, *, precision=None,
    ring: bool = False, compose_pre: bool = False,
) -> jax.Array:
    """First encode up to relu1_1 on paired images, KEPT PACKED.

    ``[B, H, W, 3] → [B/2, H, W, 128]`` relu1_1 features for
    ``tail_pack2`` (single-level relu1_1 cascades / cascades whose
    first level is relu1_1).
    """
    conv = conv2d_reflect_ring if ring else conv2d_reflect
    if compose_pre:
        enc_w11, enc_b11 = compose_1x1_into_conv(
            enc_w0, enc_b0, enc_w11, enc_b11
        )
    x = pack(img)
    if not compose_pre:
        x = conv(x, _blockdiag(enc_w0), _dup(enc_b0), precision=precision)
    return jax.nn.relu(
        conv(x, _blockdiag(enc_w11), _dup(enc_b11), precision=precision)
    )


def _pair_gram(flat: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-image Grams + means from ONE packed [N, 128] contraction.

    The [128, 128] Gram's diagonal 64-blocks are exactly the two
    images' per-image Grams (cross blocks are discarded): full MXU
    lanes for the price of 2× nominal FLOPs on a C×C-sized op. Uses
    the same canonical reductions as ops/wct.py::_gram (f32 accumulate,
    batch-shape-stable forms).
    """
    from wct_tpu.ops import reductions

    n = flat.shape[0]
    if flat.dtype == jnp.bfloat16:
        mean = reductions.mean0(flat)
        raw = reductions.gram0_lowp(flat)
        cov = (raw - n * jnp.outer(mean, mean)) / (n - 1)
        return cov, mean
    f32 = flat.astype(jnp.float32)
    mean = reductions.mean0(f32)
    centered = f32 - mean[None, :]
    cov = reductions.gram0(centered) / (n - 1)
    return cov, mean


def tail_pack2(
    e1p: jax.Array,
    stats,
    alpha,
    dec_w: jax.Array,
    dec_b: jax.Array,
    *,
    transform: str = "wct",
    adain_stats=None,
    eps: float = DEFAULT_EPS,
    trunc: float = DEFAULT_TRUNC,
    method: str = "eigh",
    soft_trunc: bool = False,
    ns_iters: int | None = None,
    rel_trunc: float | None = None,
    precision=None,
    ring: bool = False,
) -> jax.Array:
    """The relu1_1 level on PACKED features: WCT/AdaIN apply + final conv.

    ``e1p [B/2, H, W, 128]`` (packed relu1_1 features from
    ``junction_pack2(deep=False, unpack_out=False)`` or
    ``head_pack2_shallow``) → unpacked RGB ``[B, H, W, 3]`` (unclipped;
    the cascade clips once at the end).

    Why this exists (DESIGN.md §5.3b): unpacked, this level pays a
    ~14 ms/batch-16 layout-copy tax — the [B, H, W, 64] bf16 map is
    lane-padded 64→128, so the [N, 64] reshape for the apply matmul is
    a physical copy — plus a half-empty final conv. Packed, the
    [N, 128] reshape is free, the apply is a full-lane [N, 128] @
    block-diag [128, 128] matmul (the per-image α-blended transforms on
    the diagonal), and the 64→3 conv becomes a 128→6 conv. Per-image
    statistics come from one packed Gram (``_pair_gram``). No
    batch_group_count convs anywhere (XLA lowers those 4.4× slower —
    DESIGN.md §3).
    """
    from wct_tpu.ops import wct as wct_ops

    b2, h, w, c2 = e1p.shape
    c = c2 // 2
    flat = e1p.reshape(b2, h * w, c2)
    alpha = jnp.asarray(alpha, jnp.float32)

    if transform == "adain":
        # Diagonal transform: per-channel scale/bias — elementwise on
        # the packed lanes, no matmul needed.
        from wct_tpu.ops import adain as adain_ops

        def pair_scale_bias(pair_flat):
            from wct_tpu.ops import reductions

            mu, var = reductions.moments0(pair_flat.astype(jnp.float32))
            s = (
                jnp.concatenate([adain_stats.std, adain_stats.std])
                * jax.lax.rsqrt(var + adain_ops.DEFAULT_EPS)
            )
            scale = alpha * s + (1.0 - alpha)
            mean2 = jnp.concatenate([adain_stats.mean, adain_stats.mean])
            bias = alpha * (mean2 - s * mu)
            return scale, bias

        scale, bias = jax.vmap(pair_scale_bias)(flat)
        out = (
            flat.astype(jnp.float32) * scale[:, None, :] + bias[:, None, :]
        ).astype(e1p.dtype)
    else:
        k_s = stats.kernel.astype(jnp.float32)
        mu_s = stats.mean.astype(jnp.float32)

        def pair_transform(pair_flat):
            cov, mean = _pair_gram(pair_flat)
            eye = jnp.eye(c, dtype=jnp.float32)
            blocks = []
            biases = []
            for i in (0, 1):
                cov_i = cov[i * c : (i + 1) * c, i * c : (i + 1) * c] + eps * eye
                mu_i = mean[i * c : (i + 1) * c]
                w_i = wct_ops._sqrt_kernels(
                    cov_i, -0.5, trunc, method, soft=soft_trunc,
                    ns_iters=ns_iters, rel=rel_trunc,
                )
                t_i = jax.lax.dot_general(
                    w_i, k_s,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                blocks.append(alpha * t_i + (1.0 - alpha) * eye)
                from wct_tpu.ops import reductions

                biases.append(alpha * (mu_s - reductions.vecmat(mu_i, t_i)))
            m128 = (
                jnp.zeros((c2, c2), jnp.float32)
                .at[:c, :c].set(blocks[0])
                .at[c:, c:].set(blocks[1])
            )
            return m128, jnp.concatenate(biases)

        m128, bias = jax.vmap(pair_transform)(flat)
        out = jax.vmap(wct_ops._apply_kernel)(flat, m128)
        out = (out + bias[:, None, :]).astype(e1p.dtype)

    out = out.reshape(b2, h, w, c2)
    rgb = (conv2d_reflect_ring if ring else conv2d_reflect)(
        out, _blockdiag(dec_w), _dup(dec_b), precision=precision
    )
    return unpack(rgb)


def head_pack2(
    img: jax.Array,
    enc_w0, enc_b0, enc_w11, enc_b11, enc_w12, enc_b12,
    *,
    precision=None,
    ring: bool = False,
    compose_pre: bool = False,
) -> jax.Array:
    """First encode's 512-tier on paired images → post-pool1 state."""
    conv = conv2d_reflect_ring if ring else conv2d_reflect
    if compose_pre:
        enc_w11, enc_b11 = compose_1x1_into_conv(
            enc_w0, enc_b0, enc_w11, enc_b11
        )
    x = pack(img)
    if not compose_pre:
        x = conv(x, _blockdiag(enc_w0), _dup(enc_b0), precision=precision)
    e1 = jax.nn.relu(
        conv(x, _blockdiag(enc_w11), _dup(enc_b11), precision=precision)
    )
    e2 = jax.nn.relu(
        conv(e1, _blockdiag(enc_w12), _dup(enc_b12), precision=precision)
    )
    return unpack(maxpool2(e2))
