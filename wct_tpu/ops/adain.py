"""Adaptive instance normalization (AdaIN) feature transform.

Reimplements WCT-TF's ``adain`` op (reference ops.py:~40–60,
reconstructed — SURVEY.md C2): per-channel moment matching

    out = σ_s · (f_c − μ_c) / σ_c + μ_s

selected by the reference's ``--adain`` flag as a cheap alternative to
the full WCT. Pure VPU elementwise work; XLA fuses it into the
surrounding conv graph.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from wct_tpu.ops.reductions import moments0

# Reference uses eps=1e-5 inside the variance normalization
# (tf.nn.moments + rsqrt; ops.py:~45).
DEFAULT_EPS = 1e-5


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AdainStats:
    """Cacheable per-level style moments: ``[C]`` mean and std."""

    mean: jax.Array
    std: jax.Array


def adain_stats(fs: jax.Array, eps: float = DEFAULT_EPS) -> AdainStats:
    """Channel mean/std of style features ``[H, W, C]`` (float32 accum).

    Moments are MXU contractions (ops/reductions.py) so content-side
    use is bitwise-identical at any batch size.
    """
    f32 = fs.astype(jnp.float32).reshape(-1, fs.shape[-1])
    mean, var = moments0(f32)
    return AdainStats(mean=mean, std=jnp.sqrt(var + eps))


def adain_from_stats(
    fc: jax.Array,
    stats: AdainStats,
    alpha: jax.Array | float = 1.0,
    eps: float = DEFAULT_EPS,
) -> jax.Array:
    """AdaIN on content features ``[H, W, C]`` with cached style moments."""
    in_dtype = fc.dtype
    f32 = fc.astype(jnp.float32)
    mu_c, var_c = moments0(f32.reshape(-1, f32.shape[-1]))
    inv_std_c = jax.lax.rsqrt(var_c + eps)
    out = stats.std * (f32 - mu_c) * inv_std_c + stats.mean
    alpha = jnp.asarray(alpha, dtype=jnp.float32)
    return (alpha * out + (1.0 - alpha) * f32).astype(in_dtype)


def adain_transform(
    fc: jax.Array,
    stats: AdainStats,
    alpha: jax.Array | float = 1.0,
    eps: float = DEFAULT_EPS,
) -> tuple[jax.Array, jax.Array]:
    """AdaIN as an explicit per-image DIAGONAL affine: ``(scale [C], bias [C])``.

    ``adain_from_stats(fc, …) == fc * scale + bias`` — the α blend
    folded in. Exposed so the cascade can fold the affine into the
    decoder's first conv (models/decoder.py: ``decode_folded``) instead
    of materializing the transformed feature map.
    """
    f32 = fc.astype(jnp.float32)
    mu_c, var_c = moments0(f32.reshape(-1, f32.shape[-1]))
    s = stats.std * jax.lax.rsqrt(var_c + eps)
    alpha = jnp.asarray(alpha, dtype=jnp.float32)
    scale = alpha * s + (1.0 - alpha)
    bias = alpha * (stats.mean - s * mu_c)
    return scale, bias


def adain(
    fc: jax.Array,
    fs: jax.Array,
    alpha: jax.Array | float = 1.0,
    eps: float = DEFAULT_EPS,
) -> jax.Array:
    """AdaIN transform, single image: ``fc [H,W,C]``, ``fs [H',W',C]``."""
    return adain_from_stats(fc, adain_stats(fs, eps), alpha, eps)
