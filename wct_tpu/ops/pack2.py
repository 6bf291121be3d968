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

from wct_tpu.ops.convs import conv2d_reflect, maxpool2, upsample_nearest2


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
) -> jax.Array:
    """The cascade junction segment on image-paired arrays.

    Same contract as ``junction_pallas.junction``: ``d [B, h, w, 64]``
    (pre-upsample decoder feature) → ``deep=True``: post-pool1 encoder
    state ``[B, h, w, 64]``; ``deep=False``: relu1_1 features
    ``[B, 2h, 2w, 64]``.
    """
    dp = pack(d)
    u = upsample_nearest2(dp)
    m = jax.nn.relu(conv2d_reflect(u, _blockdiag(dec_w1), _dup(dec_b1)))
    rgb = conv2d_reflect(m, _blockdiag(dec_w2), _dup(dec_b2))
    if clip:
        rgb = jnp.clip(rgb, 0.0, 1.0)
    x = conv2d_reflect(rgb, _blockdiag(enc_w0), _dup(enc_b0))
    e1 = jax.nn.relu(conv2d_reflect(x, _blockdiag(enc_w11), _dup(enc_b11)))
    if not deep:
        return unpack(e1)
    e2 = jax.nn.relu(
        conv2d_reflect(e1, _blockdiag(enc_w12), _dup(enc_b12))
    )
    return unpack(maxpool2(e2))


def head_pack2(
    img: jax.Array,
    enc_w0, enc_b0, enc_w11, enc_b11, enc_w12, enc_b12,
) -> jax.Array:
    """First encode's 512-tier on paired images → post-pool1 state."""
    x = pack(img)
    x = conv2d_reflect(x, _blockdiag(enc_w0), _dup(enc_b0))
    e1 = jax.nn.relu(conv2d_reflect(x, _blockdiag(enc_w11), _dup(enc_b11)))
    e2 = jax.nn.relu(
        conv2d_reflect(e1, _blockdiag(enc_w12), _dup(enc_b12))
    )
    return unpack(maxpool2(e2))
