"""Functional VGG-19 encoder (normalised VGG, truncated per relu target).

Rebuilds the reference's ``vgg_from_t7`` (model.py:~15–80, reconstructed
— SURVEY.md C5) as a pure-function JAX convnet instead of a Keras graph:

- architecture = the Gatys activation-normalised VGG-19 from
  ``vgg_normalised.t7``: a 1×1 "preprocessing" conv whose weights bake
  in the RGB[0,1]→scaled-BGR-minus-ImageNet-means transform, then
  reflect-padded 3×3 convs + ReLU with 2×2 max pools, up to relu5_1;
- weights live in a plain pytree ``{layer: {"w": [kh,kw,in,out],
  "b": [out]}}`` produced offline by ``wct_tpu.tools.convert_t7`` (the
  reference parses Torch7 at runtime via torchfile; we never do);
- ``encode_multi`` returns SEVERAL relu targets from one trunk pass —
  the style image is encoded at all cascade levels in a single sweep
  (the reference builds five truncated encoders and re-runs them).

Encoder weights are frozen by convention: the trainer simply never
differentiates w.r.t. them (reference keeps them out of
TRAINABLE_VARIABLES, model.py:~75).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from wct_tpu.ops.convs import (
    compose_1x1_into_conv,
    conv2d_reflect,
    conv2d_reflect_ring,
    maxpool2,
)

# (kind, name, in_c, out_c, ksize); order = data flow. relu targets are
# the activations AFTER the correspondingly named conv's ReLU.
ENCODER_LAYERS: tuple[tuple, ...] = (
    ("conv_pre", "conv0", 3, 3, 1),  # preprocessing 1×1, linear
    ("conv", "conv1_1", 3, 64, 3),
    ("conv", "conv1_2", 64, 64, 3),
    ("pool", "pool1"),
    ("conv", "conv2_1", 64, 128, 3),
    ("conv", "conv2_2", 128, 128, 3),
    ("pool", "pool2"),
    ("conv", "conv3_1", 128, 256, 3),
    ("conv", "conv3_2", 256, 256, 3),
    ("conv", "conv3_3", 256, 256, 3),
    ("conv", "conv3_4", 256, 256, 3),
    ("pool", "pool3"),
    ("conv", "conv4_1", 256, 512, 3),
    ("conv", "conv4_2", 512, 512, 3),
    ("conv", "conv4_3", 512, 512, 3),
    ("conv", "conv4_4", 512, 512, 3),
    ("pool", "pool4"),
    ("conv", "conv5_1", 512, 512, 3),
)

RELU_TARGETS = ("relu1_1", "relu2_1", "relu3_1", "relu4_1", "relu5_1")

# relu target → index of its conv in ENCODER_LAYERS (inclusive).
_TARGET_TO_IDX = {
    f"relu{name[4]}_1": i
    for i, spec in enumerate(ENCODER_LAYERS)
    if spec[0] == "conv" and (name := spec[1]).endswith("_1")
}

# Channel count of each relu target's feature map.
TARGET_CHANNELS = {
    t: ENCODER_LAYERS[i][3] for t, i in _TARGET_TO_IDX.items()
}

# Spatial downscale factor of each relu target (pools before it).
TARGET_SCALE = {
    t: 2 ** sum(1 for s in ENCODER_LAYERS[:i] if s[0] == "pool")
    for t, i in _TARGET_TO_IDX.items()
}


def layers_to(target: str) -> tuple[tuple, ...]:
    """Encoder layer specs truncated at ``target`` (inclusive)."""
    if target not in _TARGET_TO_IDX:
        raise ValueError(f"unknown relu target {target!r}; one of {RELU_TARGETS}")
    return ENCODER_LAYERS[: _TARGET_TO_IDX[target] + 1]


def init_encoder_params(
    key: jax.Array, dtype: jnp.dtype = jnp.float32
) -> dict:
    """He-normal random encoder params (stand-in until real VGG weights).

    ``conv0`` initializes to the canonical preprocessing: scale [0,1]
    RGB by 255, swap to BGR, subtract ImageNet means — the transform
    the t7 file bakes into its first conv (reference model.py:~40,
    [verify exact scaling] per SURVEY §A.1).
    """
    params: dict = {}
    for spec in ENCODER_LAYERS:
        if spec[0] == "pool":
            continue
        _, name, in_c, out_c, k = spec
        if name == "conv0":
            w = np.zeros((1, 1, 3, 3), np.float32)
            # out BGR channel = 255 * in RGB channel − mean
            for o, i in enumerate((2, 1, 0)):
                w[0, 0, i, o] = 255.0
            b = -np.array([103.939, 116.779, 123.68], np.float32)
            params[name] = {"w": jnp.asarray(w, dtype), "b": jnp.asarray(b, dtype)}
            continue
        key, sub = jax.random.split(key)
        fan_in = k * k * in_c
        w = jax.random.normal(sub, (k, k, in_c, out_c), dtype) * jnp.sqrt(
            2.0 / fan_in
        )
        params[name] = {"w": w, "b": jnp.zeros((out_c,), dtype)}
    return params


def encode(
    params: dict, x: jax.Array, target: str, precision=None, ring: bool = False,
    compose_pre: bool = False,
) -> jax.Array:
    """Encode images ``[B, H, W, 3]`` (RGB in [0,1]) to ``target`` features."""
    return encode_multi(
        params, x, (target,), precision=precision, ring=ring,
        compose_pre=compose_pre,
    )[target]


_POOL1_IDX = next(
    i for i, s in enumerate(ENCODER_LAYERS) if s[1:2] == ("pool1",)
)


def encode_from_pool1(
    params: dict, x: jax.Array, target: str, precision=None, ring: bool = False
) -> jax.Array:
    """Resume encoding from the post-pool1 state (``x [B, H/2, W/2, 64]``).

    Used with the fused junction kernel (ops/junction_pallas.py), which
    emits the encoder state right after pool1; this runs conv2_1 →
    ``target``. ``target`` must be relu2_1 or deeper.
    """
    idx = _TARGET_TO_IDX[target]
    if idx <= _POOL1_IDX:
        raise ValueError(f"{target} is before pool1; nothing to resume")
    conv = conv2d_reflect_ring if ring else conv2d_reflect
    for spec in ENCODER_LAYERS[_POOL1_IDX + 1 : idx + 1]:
        if spec[0] == "pool":
            x = maxpool2(x)
            continue
        _, name, *_ = spec
        p = params[name]
        x = jax.nn.relu(conv(x, p["w"], p["b"], precision=precision))
    return x


def encode_multi(
    params: dict, x: jax.Array, targets: tuple[str, ...], precision=None,
    ring: bool = False, compose_pre: bool = False,
) -> dict[str, jax.Array]:
    """One trunk pass, returning every requested relu target's features.

    Used to encode the style image at all cascade levels in a single
    sweep (the persistent style cache of BASELINE config 5). ``ring``
    selects the pad-copy-free reflect conv (convs.conv2d_reflect_ring);
    ``compose_pre`` folds the linear 1×1 preprocessing conv0 into
    conv1_1 so conv0's full-resolution HLO never runs (identical math —
    convs.compose_1x1_into_conv; measured −4.9 ms/encode at batch-8
    1024px, DESIGN.md §3).
    """
    deepest = max(_TARGET_TO_IDX[t] for t in targets)
    want = {_TARGET_TO_IDX[t]: t for t in targets}
    conv = conv2d_reflect_ring if ring else conv2d_reflect
    composed = None
    if compose_pre:
        wc, bc = compose_1x1_into_conv(
            params["conv0"]["w"], params["conv0"]["b"],
            params["conv1_1"]["w"], params["conv1_1"]["b"],
        )
        composed = {"w": wc, "b": bc}
    out: dict[str, jax.Array] = {}
    for i, spec in enumerate(ENCODER_LAYERS[: deepest + 1]):
        kind = spec[0]
        if kind == "pool":
            x = maxpool2(x)
            continue
        _, name, *_ = spec
        if composed is not None and name == "conv0":
            continue  # folded into conv1_1
        p = composed if (composed is not None and name == "conv1_1") else params[name]
        x = conv(x, p["w"], p["b"], precision=precision)
        if kind == "conv":  # conv0 (conv_pre) is linear
            x = jax.nn.relu(x)
        if i in want:
            out[want[i]] = x
    return out
