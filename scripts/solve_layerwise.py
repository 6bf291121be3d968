#!/usr/bin/env python
"""Solve the layerwise ridge init for all five decoders and evaluate it.

    python scripts/solve_layerwise.py --encoder ckpt_r3/encoder.npz \
        --out ckpt_r3w/decoders_init.npz --pool 1024 --size 256

One statistics pass over a procedural pool (all 13 regressions
accumulated per batch on the TPU — wct_tpu/train/layerwise.py), host
float64 solves, decoder assembly, and a per-level reconstruction-PSNR
eval on held-out images. The output npz holds {relu_target: params}
trees loadable as fine-tune inits (cli/train.py --init-decoder) or
directly by tools/make_bundle.
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
    ap.add_argument("--out", default="ckpt_r3w/decoders_init.npz")
    ap.add_argument("--pool", type=int, default=1024)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lam", type=float, default=1e-4)
    ap.add_argument("--subsample", type=int, default=4,
                    help="row subsampling for the full-res regressions")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--n-eval", type=int, default=8)
    ap.add_argument("--eval-seed", type=int, default=12345)
    ap.add_argument("--cpu", action="store_true")
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

    rng = np.random.default_rng(args.seed)
    print(f"generating {args.pool} procedural {args.size}px images ...")
    t0 = time.time()
    # uint8 pool: 4× fewer H2D bytes through the tunnel; accumulate_stats
    # normalizes /255 on device (within 1 ulp of host f32/255 — XLA may
    # rewrite the division to a reciprocal multiply).
    pool = np.stack(
        [
            (synthetic_image(rng, args.size) * 255).astype(np.uint8)
            for _ in range(args.pool)
        ]
    )
    print(f"  {time.time() - t0:.0f}s")

    specs = layerwise.regression_specs()
    stats = layerwise.init_stats(specs)
    t0 = time.time()
    n_batches = args.pool // args.batch
    for i in range(n_batches):
        batch = jnp.asarray(pool[i * args.batch : (i + 1) * args.batch])
        stats = layerwise.accumulate_stats(
            stats, enc, batch, subsample=args.subsample
        )
        if (i + 1) % 16 == 0:
            jax.block_until_ready(stats)
            print(f"  stats batch {i + 1}/{n_batches} "
                  f"({time.time() - t0:.0f}s)")
    # single-element readback to really sync through the axon tunnel
    _ = float(stats["dec_conv1_1"]["G"].ravel()[0])
    print(f"statistics pass: {time.time() - t0:.0f}s")

    t0 = time.time()
    stats_host = jax.device_get(stats)
    print(f"downloaded stats ({time.time() - t0:.0f}s); solving (f64) ...")
    t0 = time.time()
    decoders = layerwise.solved_decoder_params(stats_host, lam=args.lam)
    print(f"solves: {time.time() - t0:.0f}s")

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    checkpoint.save_pytree(out, decoders)
    print(f"saved -> {out}")

    # held-out per-level reconstruction PSNR + α=0 cascade
    erng = np.random.default_rng(args.eval_seed)
    held = np.stack(
        [synthetic_image(erng, args.size) for _ in range(args.n_eval)]
    )
    batch = jnp.asarray(held)
    print(f"\nreconstruction PSNR ({args.n_eval} held-out {args.size}px):")
    for t in vgg.RELU_TARGETS:
        code = vgg.encode(enc, batch, t)
        dec = np.asarray(dec_lib.decode(decoders[t], code, t))
        mse = np.mean(
            (np.clip(dec, 0, 1).astype(np.float64) - held.astype(np.float64))
            ** 2
        )
        print(f"  {t}: {10 * np.log10(1.0 / mse):.2f} dB")
    img = held[:1]
    x = jnp.asarray(img)
    for t in reversed(vgg.RELU_TARGETS):
        code = vgg.encode(enc, x, t)
        x = jnp.clip(dec_lib.decode(decoders[t], code, t), 0.0, 1.0)
    mse = np.mean((np.asarray(x, np.float64) - img) ** 2)
    print(f"  alpha=0 5-level cascade: {10 * np.log10(1.0 / mse):.2f} dB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
