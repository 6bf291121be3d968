"""Activation-normalise an encoder: mean post-ReLU activation → 1.

    python -m wct_tpu.tools.normalize_encoder encoder.npz encoder_norm.npz \
        [--images DIR | --synthetic-pool 64] [--size 128] [--seed 0]

The reference's ``vgg_normalised.t7`` is the Gatys *activation-
normalised* VGG-19: each conv's weights are rescaled so that the mean
activation of every output channel over a dataset is exactly 1
(SURVEY.md C5/§3.5 — this is why the reference's loss weights and eps
constants work out of the box). Our He-random stand-in encoder lacks
that property: its conv0 preprocessing emits O(100) values (255·BGR −
ImageNet means) and He-init preserves that scale, so decoder training
optimizes O(1e4) losses with tiny gradients relative to parameter
scale — measured round 2: the relu1_1 decoder was still at pixel-MSE
18.7 after 5000 steps against the unnormalised encoder.

Procedure (exact, layer by layer in data-flow order): run a reference
image pool through the already-normalised prefix, compute each output
channel's mean post-ReLU activation, and scale that channel's weights
and bias by its reciprocal. Positive scaling commutes with ReLU, so
each layer's rescale is exactly a per-channel diagonal of ITS OWN
output — but the diagonals compose through the next layer's weights,
so deep features are a genuinely different (well-conditioned)
function of the input, NOT a rescale of the original deep features.
Decoders must be (re)trained against the normalised encoder;
pre-normalisation checkpoints do not transfer. WCT/AdaIN statistics
and decoder training all become O(1)-conditioned.

``conv0`` (the preprocessing conv) is left untouched: in the t7 its
weights ARE the documented RGB→scaled-BGR-minus-means transform, not a
learned layer (reference model.py:~40, reconstructed).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from wct_tpu.models import vgg
from wct_tpu.ops.convs import conv2d_reflect, maxpool2


def channel_means(params: dict, pool: np.ndarray, chunk: int = 8) -> dict:
    """Mean post-ReLU activation per channel of every conv, over ``pool``.

    The pool is processed in ``chunk``-image slices, but one layer's
    activations for the WHOLE pool are held at once (layer-sequential
    normalisation needs them): peak memory ≈ the widest tier's
    activations for the pool, ~1 GB at 64 images × 256px × 64ch f32.
    Size the pool/resolution accordingly.
    """
    means: dict[str, np.ndarray] = {}
    chunks = [pool[i : i + chunk] for i in range(0, len(pool), chunk)]
    acts = [jnp.asarray(c, jnp.float32) for c in chunks]
    for spec in vgg.ENCODER_LAYERS:
        if spec[0] == "pool":
            acts = [maxpool2(a) for a in acts]
            continue
        kind, name, *_ = spec
        p = params[name]
        outs = []
        while acts:  # consume as we go: avoids 2x peak during overlap
            a = acts.pop(0)
            y = conv2d_reflect(a, p["w"], p["b"])
            if kind != "conv_pre":  # conv0 is linear (preprocessing)
                y = jax.nn.relu(y)
            outs.append(y)
        acts = outs
        # weighted by chunk size (last chunk may be short)
        tot = sum(a.shape[0] * jnp.mean(a, axis=(0, 1, 2)) for a in acts)
        means[name] = np.asarray(tot / len(pool))
    return means


def normalize_encoder(
    params: dict, pool: np.ndarray, chunk: int = 8, floor: float = 1e-4
) -> tuple[dict, dict]:
    """Return (normalised params, report). Layer-sequential and exact:
    each layer's scale is computed on activations produced by the
    already-normalised prefix, so afterwards EVERY conv's channels have
    mean activation 1 over the pool (up to fp roundoff)."""
    out = {k: dict(v) for k, v in params.items()}
    report: dict[str, dict] = {}
    chunks = [pool[i : i + chunk] for i in range(0, len(pool), chunk)]
    acts = [jnp.asarray(c, jnp.float32) for c in chunks]
    for spec in vgg.ENCODER_LAYERS:
        if spec[0] == "pool":
            acts = [maxpool2(a) for a in acts]
            continue
        kind, name, *_ = spec
        p = out[name]
        ys = []
        while acts:  # consume as we go: avoids 2x peak during overlap
            a = acts.pop(0)
            y = conv2d_reflect(a, p["w"], p["b"])
            if kind != "conv_pre":
                y = jax.nn.relu(y)
            ys.append(y)
        if kind == "conv_pre":  # leave the preprocessing conv alone
            acts = ys
            continue
        tot = sum(y.shape[0] * jnp.mean(y, axis=(0, 1, 2)) for y in ys)
        mean = np.asarray(tot / len(pool), np.float32)
        # Dead channels (ReLU never fires on the pool) keep scale 1 —
        # amplifying noise by 1/0 would be worse than leaving them.
        scale = np.where(mean > floor, 1.0 / np.maximum(mean, floor), 1.0)
        s = jnp.asarray(scale, jnp.float32)
        out[name] = {
            "w": (p["w"].astype(jnp.float32) * s[None, None, None, :]),
            "b": (p["b"].astype(jnp.float32) * s),
        }
        # scale>0 commutes with ReLU: relu(s·x) = s·relu(x)
        acts = [y * s[None, None, None, :] for y in ys]
        report[name] = {
            "mean_before": float(mean.mean()),
            "dead_channels": int((mean <= floor).sum()),
        }
    return out, report


def normalize_bundle_compensated(
    bundle: dict, pool: np.ndarray, chunk: int = 8, floor: float = 1e-4,
    stat: str = "mean",
) -> tuple[dict, dict]:
    """FUNCTION-PRESERVING activation normalisation of a trained bundle.

    Round-4 variant (VERDICT r3 item 1): ``normalize_encoder`` rescales
    each conv to unit mean activation but does NOT compensate the next
    layer, so the normalised encoder is a genuinely different function
    and decoders must be retrained. That was fine for a random encoder;
    for a TRAINED one (scripts/train_encoder.py) the function is the
    asset. This version is the Gatys procedure proper:

    - conv ℓ's weights/bias are scaled per-output-channel by
      ``s_ℓ = 1/mean_act`` (positive scales commute with ReLU and with
      max-pooling);
    - the NEXT conv's input weights are multiplied by ``1/s_ℓ``, so
      every layer's pre-scale output — and therefore the whole trunk as
      a function — is unchanged except that layer ℓ's emitted features
      are per-channel rescaled by ``s_ℓ``;
    - each decoder's FIRST conv absorbs its level's ``1/s`` the same
      way, so ``decode(encode(x))`` is preserved to fp roundoff.

    Result: identical reconstruction quality, unit-mean activations
    everywhere (the property the real vgg_normalised.t7 has, and what
    keeps WCT/AdaIN statistics and eps/trunc constants O(1)-scaled).
    Returns ``({'encoder':..., 'decoders':...}, report)``.

    ``stat`` picks the per-channel statistic driven to 1:

    - ``"mean"`` — the Gatys procedure proper (unit mean activation).
    - ``"rms"`` — unit second moment (sqrt(E[y²])). Round-4 measured
      motivation: joint training produced SPIKY channels (relu2_1
      channel 86: mean ≈ 1 but σ ≈ 1600 → a single 2.6e6 covariance
      eigenvalue, 65 eigenvalues within 10× of the 1e-5 WCT spectrum
      mask, and cross-solver whitening deviations up to 0.29 q99).
      Unit-RMS bounds every channel's variance at 1, restoring a clean
      spectrum (measured evmax 5.5, ZERO near-threshold eigenvalues)
      while remaining exactly function-preserving — only the basis WCT
      statistics are computed in changes, which is the point.
    """
    from wct_tpu.models import decoder as dec_lib

    enc = {k: dict(v) for k, v in bundle["encoder"].items()}
    decs = {
        t: {n: dict(c) for n, c in d.items()}
        for t, d in bundle["decoders"].items()
    }
    conv_names = [s[1] for s in vgg.ENCODER_LAYERS if s[0] == "conv"]
    next_conv = dict(zip(conv_names, conv_names[1:]))
    report: dict[str, dict] = {}

    chunks = [pool[i : i + chunk] for i in range(0, len(pool), chunk)]
    acts = [jnp.asarray(c, jnp.float32) for c in chunks]
    for spec in vgg.ENCODER_LAYERS:
        if spec[0] == "pool":
            acts = [maxpool2(a) for a in acts]
            continue
        kind, name, *_ = spec
        p = enc[name]
        ys = []
        while acts:
            a = acts.pop(0)
            y = conv2d_reflect(a, p["w"], p["b"])
            if kind != "conv_pre":
                y = jax.nn.relu(y)
            ys.append(y)
        if kind == "conv_pre":  # preprocessing conv stays verbatim
            acts = ys
            continue
        if stat == "rms":
            tot = sum(
                y.shape[0] * jnp.mean(jnp.square(y), axis=(0, 1, 2))
                for y in ys
            )
            mean = np.sqrt(np.asarray(tot / len(pool), np.float32))
        elif stat == "mean":
            tot = sum(y.shape[0] * jnp.mean(y, axis=(0, 1, 2)) for y in ys)
            mean = np.asarray(tot / len(pool), np.float32)
        else:
            raise ValueError(f"stat must be 'mean' or 'rms', got {stat!r}")
        scale = np.where(mean > floor, 1.0 / np.maximum(mean, floor), 1.0)
        s = jnp.asarray(scale, jnp.float32)
        inv = jnp.asarray(1.0 / scale, jnp.float32)
        enc[name] = {
            "w": p["w"].astype(jnp.float32) * s[None, None, None, :],
            "b": p["b"].astype(jnp.float32) * s,
        }
        # compensate the next encoder conv's input channels (exact)
        nxt = next_conv.get(name)
        if nxt is not None:
            q = enc[nxt]
            enc[nxt] = {
                "w": q["w"].astype(jnp.float32) * inv[None, None, :, None],
                "b": q["b"],
            }
        # compensate the first conv of the decoder that consumes this
        # conv's features (only reluN_1 convs feed decoders)
        level = f"relu{name[4]}_1" if name.endswith("_1") else None
        if level in decs:
            first = dec_lib.decoder_layers(level)[0][1]
            d = decs[level][first]
            decs[level][first] = {
                "w": d["w"].astype(jnp.float32) * inv[None, None, :, None],
                "b": d["b"],
            }
        acts = [y * s[None, None, None, :] for y in ys]
        report[name] = {
            "mean_before": float(mean.mean()),
            "dead_channels": int((mean <= floor).sum()),
        }
    return {"encoder": enc, "decoders": decs}, report


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    p.add_argument("encoder", help="input encoder npz (flat or {'encoder': ...})")
    p.add_argument("out", help="output npz ({'encoder': ...})")
    p.add_argument("--images", default=None, help="reference image dir")
    p.add_argument("--synthetic-pool", type=int, default=64,
                   help="procedural pool size when no --images")
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--chunk", type=int, default=8)
    args = p.parse_args(argv)

    from wct_tpu.train import checkpoint

    tree = checkpoint.load_pytree(args.encoder)
    params = tree["encoder"] if "encoder" in tree else tree
    # Preserve everything else in the input tree (e.g. a full bundle's
    # decoders) — though note decoders trained against the
    # UNNORMALISED encoder do not transfer (module docstring).
    extras = {
        k: v for k, v in tree.items() if k != "encoder"
    } if "encoder" in tree else {}
    if extras:
        print(f"note: passing through non-encoder keys {sorted(extras)}; "
              "decoders trained against the unnormalised encoder must be "
              "retrained", file=sys.stderr)

    if args.images:
        from wct_tpu.utils import images as img_utils

        paths = img_utils.list_images(args.images)
        if not paths:
            print(f"no images under {args.images}", file=sys.stderr)
            return 1
        pool = np.stack([
            img_utils.center_crop(
                img_utils.resize_to(img_utils.get_img(f), args.size), args.size
            )
            for f in paths[: args.synthetic_pool]
        ])
    else:
        from wct_tpu.train.data import synthetic_image

        rng = np.random.default_rng(args.seed)
        pool = np.stack([
            synthetic_image(rng, args.size) for _ in range(args.synthetic_pool)
        ])

    normed, report = normalize_encoder(params, pool, chunk=args.chunk)
    for name, r in report.items():
        print(f"{name:<10} mean activation {r['mean_before']:>10.3f} → 1.0"
              f"  (dead channels: {r['dead_channels']})")

    after = channel_means(normed, pool, chunk=args.chunk)
    worst = max(
        abs(float(np.mean(m)) - 1.0)
        for n, m in after.items() if n != "conv0"
    )
    print(f"post-check: worst |mean−1| over conv layers = {worst:.2e}")

    checkpoint.save_pytree(args.out, {"encoder": normed, **extras})
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
