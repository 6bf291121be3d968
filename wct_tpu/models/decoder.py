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
from wct_tpu.ops.convs import (
    conv2d_reflect,
    conv2d_reflect_perimage,
    conv2d_reflect_ring,
    upsample_nearest2,
)


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


def decode(
    params: dict, f: jax.Array, target: str, precision=None, ring: bool = False
) -> jax.Array:
    """Decode features ``[B, h, w, C]`` at ``target`` back to ``[B, H, W, 3]``.

    Output is raw (unclipped) RGB in ≈[0, 1]; callers clip
    (reference clips in stylize.py before save). ``ring`` selects the
    pad-copy-free reflect conv (convs.conv2d_reflect_ring).
    """
    return _decode(
        params, f, decoder_layers(target), start=0, precision=precision,
        ring=ring,
    )


def decode_folded(
    params: dict, f: jax.Array, target: str, m: jax.Array, bias: jax.Array,
    precision=None,
) -> jax.Array:
    """Decode with a per-image affine folded into the first conv.

    ``decode(params, vmap(x ↦ x@M_b + bias_b)(f), target)`` computed
    WITHOUT materializing the transformed feature map: the affine and
    the conv are both linear and reflect padding commutes with a
    per-pixel affine, so

        conv(f @ M + β) = conv'(f),   w'[ky,kx] = M @ w[ky,kx],
                                      b' = b + β @ Σ_{ky,kx} w[ky,kx]

    ``m`` is ``[B, C, C]`` dense (WCT) or ``[B, C]`` diagonal (AdaIN);
    ``bias`` is ``[B, C]``. The folded conv runs with per-image weights
    (ops/convs.py: ``conv2d_reflect_perimage``). Folding the [C, C]
    matrices costs O(9·C³) per image — sub-millisecond against the
    [N, C] feature-map round trip it deletes (N = H·W ≫ C).
    """
    layers = decoder_layers(target)
    _, name, *_ = layers[0]
    p = params[name]
    w_fold, b_fold = fold_affine_into_conv(m, bias, p["w"], p["b"])
    x = conv2d_reflect_perimage(f, w_fold, b_fold, precision=precision)
    if len(layers) > 1:  # final conv is linear (reference model.py:~135)
        x = jax.nn.relu(x)
    return _decode(params, x, layers, start=1, precision=precision)


def fold_affine_into_conv(
    m: jax.Array, bias: jax.Array, w: jax.Array, b: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Fold a per-image affine (x ↦ x@M_b + β_b) into a shared conv.

    ``m [B, C, C]`` dense or ``[B, C]`` diagonal, ``bias [B, C]``,
    ``w [kh, kw, C, Co]``, ``b [Co]`` → per-image
    ``(w' [B, kh, kw, C, Co], b' [B, Co])`` with
    conv'(x) = conv(x @ M + β) (reflect pad commutes with the
    per-pixel affine).
    """
    w32 = w.astype(jnp.float32)
    if m.ndim == 3:
        w_fold = jnp.einsum("bij,yxjo->byxio", m, w32)
    else:
        w_fold = w32[None] * m[:, None, None, :, None]
    b_fold = b.astype(jnp.float32)[None] + jnp.einsum(
        "bj,yxjo->bo", bias, w32
    )
    return w_fold, b_fold


def has_standard_tail(target: str) -> bool:
    """True iff the decoder ends [upsample, conv 64→64, conv 64→3] —
    the shape the fused junction kernel (ops/junction_pallas.py)
    replaces. Holds for every target deeper than relu1_1."""
    layers = decoder_layers(target)
    if len(layers) < 3:
        return False
    up, c1, c2 = layers[-3], layers[-2], layers[-1]
    return (
        up[0] == "upsample"
        and c1[0] == "conv" and c1[2] == 64 and c1[3] == 64
        and c2[0] == "conv" and c2[2] == 64 and c2[3] == 3
    )


def decode_partial(
    params: dict, f: jax.Array, target: str, precision=None, ring: bool = False
) -> jax.Array:
    """Run the decoder UP TO (excluding) its final [upsample, conv,
    conv] tail; the fused junction kernel finishes the job. Every conv
    here gets a ReLU (none is the final linear conv)."""
    layers = decoder_layers(target)
    assert has_standard_tail(target), target
    conv = conv2d_reflect_ring if ring else conv2d_reflect
    x = f
    for spec in layers[:-3]:
        if spec[0] == "upsample":
            x = upsample_nearest2(x)
            continue
        _, name, *_ = spec
        p = params[name]
        x = jax.nn.relu(conv(x, p["w"], p["b"], precision=precision))
    return x


def tail_weights(params: dict, target: str) -> tuple:
    """(w1, b1, w2, b2) of the decoder's final two convs (64→64, 64→3)."""
    layers = decoder_layers(target)
    _, n1, *_ = layers[-2]
    _, n2, *_ = layers[-1]
    return (
        params[n1]["w"], params[n1]["b"],
        params[n2]["w"], params[n2]["b"],
    )


def _decode(
    params: dict, x: jax.Array, layers: tuple, start: int, precision=None,
    ring: bool = False,
) -> jax.Array:
    conv = conv2d_reflect_ring if ring else conv2d_reflect
    last = len(layers) - 1
    for i in range(start, len(layers)):
        spec = layers[i]
        if spec[0] == "upsample":
            x = upsample_nearest2(x)
            continue
        _, name, *_ = spec
        p = params[name]
        x = conv(x, p["w"], p["b"], precision=precision)
        if i != last:
            x = jax.nn.relu(x)
    return x
