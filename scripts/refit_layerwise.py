#!/usr/bin/env python
"""Decoder-forced Jacobi refit of the layerwise ridge init.

    python scripts/refit_layerwise.py --init ckpt_r3w/decoders_init.npz \
        --out ckpt_r3w/decoders_refit.npz --iters 2

The teacher-forced solves (scripts/solve_layerwise.py) compound errors
through deep decoders (relu5_1 init 13.8 dB vs relu1_1 43.9). Each
refit iteration re-accumulates every conv's normal equations against
the decoder's ACTUAL intermediate activations (one jitted pass per
level — train/layerwise.py:accumulate_refit_stats), re-solves, and
reassembles. relu1_1's single conv is already exactly solved, so only
the four deeper levels refit.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--encoder", default="ckpt_r3/encoder.npz")
    ap.add_argument("--init", default="ckpt_r3w/decoders_init.npz")
    ap.add_argument("--out", default="ckpt_r3w/decoders_refit.npz")
    ap.add_argument("--pool", type=int, default=1024)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--lam", type=float, default=1e-4)
    ap.add_argument("--subsample", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--n-eval", type=int, default=8)
    ap.add_argument("--eval-seed", type=int, default=12345)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--targets", nargs="*",
                    default=["relu2_1", "relu3_1", "relu4_1", "relu5_1"])
    ap.add_argument("--gauss-seidel", action="store_true",
                    help="sequential per-conv sweeps (one stats pass per "
                         "conv, update before the next conv) instead of "
                         "Jacobi all-at-once — Jacobi MEASURED to diverge "
                         "on deep levels (relu5_1 13.9 -> 5.5 dB)")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from wct_tpu.cli.common import enable_compile_cache
    from wct_tpu.models import decoder as dec_lib
    from wct_tpu.models import vgg
    from wct_tpu.train import checkpoint, layerwise
    from wct_tpu.train.data import synthetic_image

    enable_compile_cache()
    enc = checkpoint.load_pytree(args.encoder)
    enc = enc["encoder"] if "encoder" in enc else enc
    decoders = checkpoint.load_pytree(args.init)

    rng = np.random.default_rng(args.seed)
    print(f"generating {args.pool} procedural {args.size}px images ...")
    pool = np.stack(
        [
            (synthetic_image(rng, args.size) * 255).astype(np.uint8)
            for _ in range(args.pool)
        ]
    )

    erng = np.random.default_rng(args.eval_seed)
    held = np.stack(
        [synthetic_image(erng, args.size) for _ in range(args.n_eval)]
    )
    held_j = jnp.asarray(held)

    def level_psnr(t):
        code = vgg.encode(enc, held_j, t)
        dec = np.asarray(dec_lib.decode(decoders[t], code, t))
        mse = np.mean(
            (np.clip(dec, 0, 1).astype(np.float64) - held.astype(np.float64))
            ** 2
        )
        return 10 * np.log10(1.0 / mse)

    n_batches = args.pool // args.batch

    def stats_pass(t, only=None):
        stats = layerwise.init_refit_stats(t, only=only)
        for i in range(n_batches):
            batch = jnp.asarray(pool[i * args.batch : (i + 1) * args.batch])
            stats = layerwise.accumulate_refit_stats(
                stats, enc, decoders[t], batch, target=t,
                subsample=args.subsample, only=only,
            )
        _ = float(stats[next(iter(stats))]["G"].ravel()[0])  # sync
        return jax.device_get(stats)

    for t in args.targets:
        print(f"\n=== refit {t} (init {level_psnr(t):.2f} dB) ===", flush=True)
        for it in range(args.iters):
            t0 = time.time()
            if args.gauss_seidel:
                from wct_tpu.models import decoder as dec_lib

                convs = [
                    name for kind, name, *_ in dec_lib.decoder_layers(t)
                    if kind == "conv"
                ]
                for name in convs:
                    solved = layerwise.solve_refit(
                        stats_pass(t, only=name), t, lam=args.lam
                    )
                    decoders[t] = {**decoders[t], name: solved[name]}
                    print(f"    {name}: {level_psnr(t):.2f} dB", flush=True)
            else:
                decoders[t] = layerwise.solve_refit(
                    stats_pass(t), t, lam=args.lam
                )
            print(f"  iter {it + 1}: {level_psnr(t):.2f} dB "
                  f"({time.time() - t0:.0f}s)", flush=True)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    checkpoint.save_pytree(out, decoders)
    print(f"\nsaved -> {out}")

    print(f"\nfinal reconstruction PSNR ({args.n_eval} held-out):")
    for t in vgg.RELU_TARGETS:
        print(f"  {t}: {level_psnr(t):.2f} dB")
    x = held_j[:1]
    for t in reversed(vgg.RELU_TARGETS):
        code = vgg.encode(enc, x, t)
        x = jnp.clip(dec_lib.decode(decoders[t], code, t), 0.0, 1.0)
    mse = np.mean((np.asarray(x, np.float64) - held[:1]) ** 2)
    print(f"  alpha=0 5-level cascade: {10 * np.log10(1.0 / mse):.2f} dB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
