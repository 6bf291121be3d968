"""Convolution primitives: reflect-padded conv, NN-upsample, maxpool.

TPU-native equivalents of WCT-TF's conv toolkit (reference ops.py:~10–35
``pad_reflect`` / ``Conv2DReflect``, reconstructed — SURVEY.md C1):
every conv in the encoder and decoders is reflect-padded so outputs
have no border artifacts, pools are 2×2 max, and decoder upsampling is
2× nearest-neighbor.

All functions are pure and batched: ``x: [B, H, W, C]`` (NHWC), weights
``[kh, kw, in_c, out_c]`` (HWIO) — the layouts XLA's TPU conv emitter
likes. No Keras-style layer objects; params live in pytrees
(``wct_tpu.models``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_DN = ("NHWC", "HWIO", "NHWC")


def pad_reflect(x: jax.Array, pad: int = 1) -> jax.Array:
    """Reflect-pad spatial dims of ``[B, H, W, C]`` (reference ops.py:~10)."""
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def conv2d_reflect(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """Reflect-pad + VALID conv + bias — reference ``Conv2DReflect``.

    Kernel spatial size is read from ``w``; 1×1 convs skip padding.
    Accumulates in float32 (``preferred_element_type``) so bf16
    activations keep f32 accuracy on the MXU.
    """
    kh, kw = w.shape[0], w.shape[1]
    assert kh == kw, "square kernels only"
    x = pad_reflect(x, (kh - 1) // 2)
    # Precision.HIGHEST keeps float32 inputs at true f32 multiply
    # accuracy (fidelity mode); bf16 inputs are unaffected — they hit
    # the MXU natively (which accumulates f32 internally), the
    # throughput mode (CascadeConfig.compute_dtype). Output dtype ==
    # input dtype: upcasting via preferred_element_type breaks the
    # BACKWARD conv under bf16 training (f32 cotangent × bf16 filter is
    # a dtype mismatch in the transpose rule).
    out = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=_DN,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out + b.astype(out.dtype)


def maxpool2(x: jax.Array) -> jax.Array:
    """2×2/stride-2 max pool (reference SpatialMaxPooling → MaxPooling2D)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


def upsample_nearest2(x: jax.Array) -> jax.Array:
    """2× nearest-neighbor upsample (reference UpSampling2D in decoders).

    Implemented as reshape-broadcast (no gather): XLA lowers it to pure
    data movement that fuses with the following conv.
    """
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)
