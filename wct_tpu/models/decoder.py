"""Per-level mirror decoders (reluX_1 features → RGB pixels).

Rebuilds the reference's decoder builder (model.py:~85–140,
reconstructed — SURVEY.md C6): each relu target gets its own decoder
that mirrors the encoder from that layer back to pixels — every max
pool becomes a 2× nearest-neighbor upsample, every conv is a 3×3
reflect-padded conv + ReLU, and the final conv maps to 3 channels with
NO activation (linear). One independent param pytree per level, the
TPU-side analogue of the reference's per-level variable scopes
(``decoder_relu5_1/...``) and per-scope ``tf.train.Saver`` restore.

The decoder spec is DERIVED from ``vgg.ENCODER_LAYERS`` by walking it
backwards, so encoder and decoders can never drift apart.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from wct_tpu.models import vgg
from wct_tpu.ops.convs import conv2d_reflect, upsample_nearest2


def decoder_layers(target: str) -> tuple[tuple, ...]:
    """Mirror layer specs for ``target``: (kind, name, in_c, out_c, k).

    Walks the truncated encoder in reverse, skipping the preprocessing
    conv0; conv in/out channels swap; pools become upsamples. The last
    conv (mirror of conv1_1) emits 3 channels, linear.
    """
    enc = vgg.layers_to(target)
    out: list[tuple] = []
    for spec in reversed(enc):
        if spec[0] == "pool":
            out.append(("upsample", f"up_{spec[1]}"))
        elif spec[0] == "conv":
            _, name, in_c, out_c, k = spec
            out.append(("conv", f"dec_{name}", out_c, in_c, k))
        # conv_pre (conv0) is not mirrored: decoders emit RGB directly.
    return tuple(out)


def init_decoder_params(
    key: jax.Array, target: str, dtype: jnp.dtype = jnp.float32
) -> dict:
    """He-normal random params for the ``target`` decoder."""
    params: dict = {}
    for spec in decoder_layers(target):
        if spec[0] != "conv":
            continue
        _, name, in_c, out_c, k = spec
        key, sub = jax.random.split(key)
        fan_in = k * k * in_c
        w = jax.random.normal(sub, (k, k, in_c, out_c), dtype) * jnp.sqrt(
            2.0 / fan_in
        )
        params[name] = {"w": w, "b": jnp.zeros((out_c,), dtype)}
    return params


def decode(params: dict, f: jax.Array, target: str) -> jax.Array:
    """Decode features ``[B, h, w, C]`` at ``target`` back to ``[B, H, W, 3]``.

    Output is raw (unclipped) RGB in ≈[0, 1]; callers clip
    (reference clips in stylize.py before save).
    """
    layers = decoder_layers(target)
    x = f
    last = len(layers) - 1
    for i, spec in enumerate(layers):
        if spec[0] == "upsample":
            x = upsample_nearest2(x)
            continue
        _, name, *_ = spec
        p = params[name]
        x = conv2d_reflect(x, p["w"], p["b"])
        if i != last:  # final conv is linear (reference model.py:~135)
            x = jax.nn.relu(x)
    return x
