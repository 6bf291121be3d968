#!/usr/bin/env python
"""Compare stand-in encoder constructions by decoder invertibility.

    python scripts/exp_encoder_variants.py --pool 256 --size 256

Round-3 (VERDICT r2 item 1): the shipped decoders plateau at 12-20 dB
because they invert a He-RANDOM encoder. The real vgg_normalised.t7 is
unobtainable (empty mount, no network), so the encoder weights are a
free choice — and the reference's trained VGG is, measurably, a much
better-conditioned function than a random one. This experiment scores
stand-in constructions by the thing that matters downstream: held-out
reconstruction PSNR of the closed-form layerwise decoder solve
(train/layerwise.py) against each candidate, all candidates
activation-normalised (the Gatys property the t7 artifact has).

Variants:
  he    — He-normal (the r2 baseline, ckpt_r3/encoder.npz lineage)
  orth  — semi-orthogonal over patch space: each conv's [k*k*in, out]
          matrix has orthonormal columns (rows when out > k*k*in), so
          the pre-ReLU map is an isometry onto its range
  crelu — ±-PAIRED semi-orthogonal: out/2 orthonormal patch directions
          u_i, filters [U, -U]. relu(u·p) and relu(-u·p) jointly carry
          u·p EXACTLY, so every conv is linearly invertible on its
          retained subspace — ReLU stops destroying information, and
          the ridge-solved mirror convs (which are linear) can actually
          invert. Pools remain the only lossy stage, as in real VGG.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def semi_orth(rng: np.random.Generator, d_in: int, d_out: int) -> np.ndarray:
    """[d_in, d_out] with orthonormal columns (d_in>=d_out) or rows."""
    a = rng.standard_normal((max(d_in, d_out), min(d_in, d_out)))
    q, _ = np.linalg.qr(a)
    return (q if d_in >= d_out else q.T).astype(np.float32)


def build_encoder(kind: str, seed: int) -> dict:
    import jax
    import jax.numpy as jnp

    from wct_tpu.models import vgg

    params = vgg.init_encoder_params(jax.random.PRNGKey(seed))  # conv0 + he
    if kind == "he":
        return params
    rng = np.random.default_rng(seed)
    for spec in vgg.ENCODER_LAYERS:
        if spec[0] != "conv":
            continue
        _, name, in_c, out_c, k = spec
        d = k * k * in_c
        if kind == "orth":
            w = semi_orth(rng, d, out_c)
        elif kind == "crelu":
            m = out_c // 2
            if m <= d:
                u = semi_orth(rng, d, m)
            else:  # cannot happen in VGG, but keep total
                u = rng.standard_normal((d, m)).astype(np.float32)
            if 2 * m < out_c:  # odd out_c — pad with a random direction
                extra = rng.standard_normal((d, out_c - 2 * m)).astype(np.float32)
                extra /= np.linalg.norm(extra, axis=0, keepdims=True)
                w = np.concatenate([u, -u, extra], axis=1)
            else:
                w = np.concatenate([u, -u], axis=1)
        else:
            raise ValueError(kind)
        params[name] = {
            "w": jnp.asarray(w.reshape(k, k, in_c, out_c)),
            "b": jnp.zeros((out_c,), jnp.float32),
        }
    return params


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--variants", nargs="*", default=["he", "orth", "crelu"])
    ap.add_argument("--pool", type=int, default=256)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--norm-pool", type=int, default=64)
    ap.add_argument("--lam", type=float, default=1e-4)
    ap.add_argument("--subsample", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--n-eval", type=int, default=8)
    ap.add_argument("--eval-seed", type=int, default=12345)
    ap.add_argument("--save-dir", default=None,
                    help="write each variant's normalised encoder npz here")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from wct_tpu.cli.common import enable_compile_cache
    from wct_tpu.models import decoder as dec_lib
    from wct_tpu.models import vgg
    from wct_tpu.tools.normalize_encoder import normalize_encoder
    from wct_tpu.train import checkpoint, layerwise
    from wct_tpu.train.data import synthetic_image

    enable_compile_cache()

    rng = np.random.default_rng(args.seed)
    print(f"generating pools ({args.pool} stats + {args.norm_pool} norm, "
          f"{args.size}px) ...")
    pool = np.stack(
        [
            (synthetic_image(rng, args.size) * 255).astype(np.uint8)
            for _ in range(args.pool)
        ]
    )
    nrng = np.random.default_rng(args.seed + 1)
    norm_pool = np.stack(
        [synthetic_image(nrng, 128) for _ in range(args.norm_pool)]
    )
    erng = np.random.default_rng(args.eval_seed)
    held = np.stack(
        [synthetic_image(erng, args.size) for _ in range(args.n_eval)]
    )
    held_j = jnp.asarray(held)

    results = {}
    for kind in args.variants:
        print(f"\n=== variant {kind} ===")
        enc = build_encoder(kind, args.seed)
        enc, _ = normalize_encoder(enc, norm_pool)
        if args.save_dir:
            out = Path(args.save_dir) / f"encoder_{kind}.npz"
            out.parent.mkdir(parents=True, exist_ok=True)
            checkpoint.save_pytree(out, {"encoder": enc})
            print(f"  saved {out}")

        stats = layerwise.init_stats(layerwise.regression_specs())
        t0 = time.time()
        for i in range(args.pool // args.batch):
            batch = jnp.asarray(pool[i * args.batch : (i + 1) * args.batch])
            stats = layerwise.accumulate_stats(
                stats, enc, batch, subsample=args.subsample
            )
        _ = float(stats["dec_conv1_1"]["G"].ravel()[0])
        print(f"  stats {time.time() - t0:.0f}s", flush=True)
        t0 = time.time()
        decoders = layerwise.solved_decoder_params(
            jax.device_get(stats), lam=args.lam, verbose=False
        )
        print(f"  solves {time.time() - t0:.0f}s", flush=True)

        row = {}
        for t in vgg.RELU_TARGETS:
            code = vgg.encode(enc, held_j, t)
            dec = np.asarray(dec_lib.decode(decoders[t], code, t))
            mse = np.mean(
                (np.clip(dec, 0, 1).astype(np.float64)
                 - held.astype(np.float64)) ** 2
            )
            row[t] = 10 * np.log10(1.0 / mse)
        x = held_j
        for t in reversed(vgg.RELU_TARGETS):
            code = vgg.encode(enc, x, t)
            x = jnp.clip(dec_lib.decode(decoders[t], code, t), 0.0, 1.0)
        mse = np.mean((np.asarray(x, np.float64) - held) ** 2)
        row["cascade_a0"] = 10 * np.log10(1.0 / mse)
        results[kind] = row
        print("  " + "  ".join(f"{k}={v:.2f}" for k, v in row.items()))

    print("\nsummary (teacher-forced layerwise solve, held-out dB):")
    cols = list(vgg.RELU_TARGETS) + ["cascade_a0"]
    print(f"{'variant':<8}" + "".join(f"{c:>12}" for c in cols))
    for kind, row in results.items():
        print(f"{kind:<8}" + "".join(f"{row[c]:>12.2f}" for c in cols))
    return 0


if __name__ == "__main__":
    sys.exit(main())
