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


def conv2d_reflect(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array,
    precision: jax.lax.Precision | None = None,
) -> jax.Array:
    """Reflect-pad + VALID conv + bias — reference ``Conv2DReflect``.

    Kernel spatial size is read from ``w``; 1×1 convs skip padding.
    Accumulates in float32 (``preferred_element_type``) so bf16
    activations keep f32 accuracy on the MXU.
    """
    kh, kw = w.shape[0], w.shape[1]
    assert kh == kw, "square kernels only"
    x = pad_reflect(x, (kh - 1) // 2)
    # Default Precision.HIGHEST keeps float32 inputs at true f32
    # multiply accuracy (6-pass bf16 on the MXU — fidelity mode);
    # Precision.HIGH (3 passes, ~1e-6 relative error) is the middle
    # throughput option (CascadeConfig.conv_precision='high'). bf16
    # inputs are unaffected either way — they hit the MXU natively
    # (which accumulates f32 internally), the throughput mode
    # (CascadeConfig.compute_dtype). Output dtype == input dtype:
    # upcasting via preferred_element_type breaks the BACKWARD conv
    # under bf16 training (f32 cotangent × bf16 filter is a dtype
    # mismatch in the transpose rule).
    out = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=_DN,
        precision=precision or jax.lax.Precision.HIGHEST,
    )
    return out + b.astype(out.dtype)


def conv2d_reflect_ring(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array,
    precision: jax.lax.Precision | None = None,
) -> jax.Array:
    """Reflect conv WITHOUT materializing the padded copy.

    Same math as ``conv2d_reflect`` (reference ``Conv2DReflect``), but
    the bulk runs as a zero-pad SAME conv — padding fused into the conv
    HLO, so the [B, H+2p, W+2p, C] reflect-padded tensor (a full
    HBM round trip that scales with pixels; measured ~26 ms/conv at
    batch-8 1024px 64ch where the conv itself is traffic-bound) never
    exists. Only the p-px border sees the padding, and those rows/cols
    are recomputed EXACTLY from thin strips with true reflect semantics
    and spliced in with in-place dynamic-update-slices:

    - interior: identical contraction (same taps, same order) as the
      padded conv — bitwise-equal output elements;
    - border: strip convs over ``O(p·(H+W))`` pixels — exact reflect
      values, negligible work.

    Valid for any odd kernel with ``H, W >= 2p`` (VGG/decoders: 3×3,
    p=1). 1×1 kernels skip padding entirely and take the plain path.
    """
    kh, kw = w.shape[0], w.shape[1]
    assert kh == kw, "square kernels only"
    p = (kh - 1) // 2
    if p == 0:
        return conv2d_reflect(x, w, b, precision)
    if x.shape[1] < 2 * p or x.shape[2] < 2 * p:
        # border strips need 2p rows/cols; plain reflect conv only
        # needs p+1, so degrade gracefully for tiny deep-level maps
        # instead of failing inside the .at[].set() splice.
        return conv2d_reflect(x, w, b, precision)
    wd = w.astype(x.dtype)
    prec = precision or jax.lax.Precision.HIGHEST

    def conv(t, pad):
        return jax.lax.conv_general_dilated(
            t, wd, (1, 1), pad, dimension_numbers=_DN, precision=prec
        )

    out = conv(x, "SAME")
    H, W = x.shape[1], x.shape[2]
    # Output rows [0, p) read input rows [-p, 2p): slice the first 2p
    # rows, reflect-extend vertically (reflect of row -i is row i,
    # inside the slice for i <= p), reflect-pad horizontally, VALID.
    pad_h = ((0, 0), (0, 0), (p, p), (0, 0))
    top = jnp.pad(x[:, : 2 * p], ((0, 0), (p, 0), (0, 0), (0, 0)), mode="reflect")
    top = conv(jnp.pad(top, pad_h, mode="reflect"), "VALID")
    bot = jnp.pad(x[:, -2 * p :], ((0, 0), (0, p), (0, 0), (0, 0)), mode="reflect")
    bot = conv(jnp.pad(bot, pad_h, mode="reflect"), "VALID")
    # Full-height side strips (vertical reflect included) own the
    # corners; top/bottom strips compute the same exact values there.
    pad_v = ((0, 0), (p, p), (0, 0), (0, 0))
    left = jnp.pad(x[:, :, : 2 * p], ((0, 0), (0, 0), (p, 0), (0, 0)), mode="reflect")
    left = conv(jnp.pad(left, pad_v, mode="reflect"), "VALID")
    right = jnp.pad(x[:, :, -2 * p :], ((0, 0), (0, 0), (0, p), (0, 0)), mode="reflect")
    right = conv(jnp.pad(right, pad_v, mode="reflect"), "VALID")
    out = (
        out.at[:, :p].set(top)
        .at[:, H - p :].set(bot)
        .at[:, :, :p].set(left)
        .at[:, :, W - p :].set(right)
    )
    return out + b.astype(out.dtype)


def conv2d_reflect_perimage(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array,
    precision: jax.lax.Precision | None = None,
) -> jax.Array:
    """Reflect conv where every batch item has ITS OWN weights.

    ``x: [B, H, W, Ci]``, ``w: [B, kh, kw, Ci, Co]``, ``b: [B, Co]``.
    Lowered as ONE grouped conv via ``batch_group_count=B`` (output
    feature group g is produced from batch item g), not B separate
    convs — XLA keeps it a single MXU contraction with an effective
    [kh·kw·Ci, B·Co] filter matrix.

    This exists for transform folding: the cascade folds each image's
    WCT/AdaIN affine into the decoder's first conv (decoder.py:
    ``decode_folded``), which makes the weights per-image.
    """
    B, H, W, Ci = x.shape
    _, kh, kw, _, Co = w.shape
    assert kh == kw, "square kernels only"
    xp = pad_reflect(x, (kh - 1) // 2)
    # Output-feature order for batch groups is (B, Co): group g's
    # channels are [g*Co, (g+1)*Co) (verified against a per-image loop
    # in tests/test_convs.py).
    rhs = jnp.transpose(w, (1, 2, 3, 0, 4)).reshape(kh, kw, Ci, B * Co)
    out = jax.lax.conv_general_dilated(
        xp,
        rhs.astype(x.dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=_DN,
        batch_group_count=B,
        precision=precision or jax.lax.Precision.HIGHEST,
    )
    out = out.reshape(H, W, B, Co) + b.astype(out.dtype)[None, None]
    return jnp.transpose(out, (2, 0, 1, 3))


def compose_1x1_into_conv(
    w0: jax.Array, b0: jax.Array, w: jax.Array, b: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Fold a preceding linear 1×1 conv into the following conv.

    ``conv(w,b)(conv1x1(w0,b0)(x)) == conv(w',b')(x)`` with
    ``w'[ky,kx] = W0 · w[ky,kx]`` and ``b' = b + b0 · Σ_taps w`` — the
    same commutation as decoder.fold_affine_into_conv (a per-pixel
    affine commutes with reflect padding), but with SHARED weights.

    Used for the encoder's preprocessing conv0 (CascadeConfig
    ``compose_conv0``): its separate HLO is a full-resolution
    3-of-128-lane HBM round trip that XLA only partially fuses —
    measured 57.2 → 52.3 ms for conv0+conv1_1 at batch-8 1024px
    (DESIGN.md §3 round-4 ledger). Composition runs in float32
    (weights are small; the conv casts to the activation dtype).
    """
    assert w0.shape[0] == w0.shape[1] == 1, "first conv must be 1×1"
    m = w0[0, 0].astype(jnp.float32)
    w32 = w.astype(jnp.float32)
    wc = jnp.einsum("ic,yxco->yxio", m, w32)
    bc = b.astype(jnp.float32) + jnp.einsum(
        "c,yxco->o", b0.astype(jnp.float32), w32
    )
    return wc, bc


def quantize_weight_int8(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8 quantization of HWIO weights.

    Returns ``(wq int8 [kh,kw,ci,co], scale f32 [co])`` with
    ``wq * scale ≈ w``. Output-channel granularity keeps the scale
    OUTSIDE the conv's contraction (ci and the taps share one scale),
    so dequantization is a cheap per-channel multiply after the int32
    accumulate.
    """
    scale = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0
    scale = jnp.maximum(scale, 1e-12).astype(jnp.float32)
    wq = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return wq.astype(jnp.int8), scale


def conv2d_reflect_int8(
    x: jax.Array,
    wq: jax.Array,
    w_scale: jax.Array,
    b: jax.Array,
    act_scale: jax.Array | float | None = None,
) -> jax.Array:
    """Reflect conv with int8 weights AND activations (int8-MXU lever).

    The round-5 config-4 experiment (VERDICT r4 item 2): TPU v5e's MXU
    has double int8 throughput, and BASELINE config 4's 64-channel tier
    is lane-starved compute time. Symmetric quantization: activations
    per-TENSOR (dynamic max by default, or a static calibrated
    ``act_scale``), weights per-OUTPUT-CHANNEL
    (``quantize_weight_int8``); conv accumulates int32
    (``preferred_element_type``), dequantizes with one fused
    multiply. Error model: ~|x|_max/254 per activation vs bf16's
    8-bit significand per VALUE — comparable where the dynamic range
    within a tensor is modest (post-ReLU conv features), worse on
    long-tailed tensors; gate like bf16's fidelity envelope.
    """
    kh = wq.shape[0]
    x = pad_reflect(x, (kh - 1) // 2)
    if act_scale is None:
        sx = jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0
    else:
        sx = jnp.asarray(act_scale, jnp.float32)
    sx = jnp.maximum(sx, 1e-12)
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) / sx), -127, 127
    ).astype(jnp.int8)
    yq = jax.lax.conv_general_dilated(
        xq,
        wq,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    )
    y = yq.astype(jnp.float32) * (sx * w_scale)[None, None, None, :]
    return (y + b.astype(jnp.float32)).astype(x.dtype)


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
