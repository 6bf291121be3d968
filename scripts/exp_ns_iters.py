#!/usr/bin/env python
"""Re-tune per-level Newton-Schulz iteration counts for a new bundle.

    python scripts/exp_ns_iters.py [--bundle weights/bundle.npz]
        [--size 256] [--iters 8,10,12,14,16] [--bench]

DEFAULT_ITERS=14 was measured-converged on the ROUND-1 random
encoder's Gram spectra (ops/sqrtm.py header). A retrained encoder
changes every level's covariance spectrum, so the count must be
re-measured, per level: each level pays 2·iters C×C matmuls per
style-stats build AND per content whitening, so a level that converges
at 10 is 29% NS-time saved there.

Part 1 (fidelity): for each level and iteration count, apply
wct_from_stats (method=newton_schulz_fast, bf16 features — the
headline config's numerics) against the f32+eigh reference on real
encoder features, and report median/q99 ABSOLUTE deviation normalized
by the reference's mean |activation| (the scale WCT outputs live on).

Part 2 (--bench, TPU): measure the 512px headline-config throughput
with the chosen per-level tuple vs the flat default.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

log = lambda *a: print(*a, flush=True)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--bundle", default="weights/bundle.npz")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", default="8,10,12,14,16")
    ap.add_argument("--tol", type=float, default=2e-3,
                    help="relative median tolerance for the per-level pick")
    ap.add_argument("--bench", action="store_true",
                    help="also measure 512px throughput with the pick")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from wct_tpu.cli.common import enable_compile_cache
    from wct_tpu.models import vgg
    from wct_tpu.ops import wct as W
    from wct_tpu.train import checkpoint
    from wct_tpu.train.data import synthetic_image

    enable_compile_cache()
    params = checkpoint.load_pytree(args.bundle)
    iters_list = tuple(int(x) for x in args.iters.split(","))
    c = synthetic_image(np.random.default_rng(7), args.size)
    s = synthetic_image(np.random.default_rng(99), args.size)
    acts_c = vgg.encode_multi(params["encoder"], jnp.asarray(c)[None],
                              vgg.RELU_TARGETS)
    acts_s = vgg.encode_multi(params["encoder"], jnp.asarray(s)[None],
                              vgg.RELU_TARGETS)

    pick = {}
    for t in vgg.RELU_TARGETS:
        fc, fs = acts_c[t][0], acts_s[t][0]
        ref = np.asarray(W.wct_from_stats(
            fc, W.style_stats(fs, method="eigh"), 1.0, method="eigh"
        ), np.float32)
        scale = float(np.abs(ref).mean())
        rows = []
        for it in iters_list:
            # style side: cached once per style (perf-irrelevant), no
            # ns_iters knob — always DEFAULT_ITERS
            stats = W.style_stats(
                fs.astype("bfloat16"), method="newton_schulz_fast"
            )
            out = np.asarray(W.wct_from_stats(
                fc.astype("bfloat16"), stats, 1.0,
                method="newton_schulz_fast", ns_iters=it,
            ), np.float32)
            d = np.abs(out - ref) / scale
            med, q99 = float(np.median(d)), float(np.quantile(d, 0.99))
            rows.append((it, med, q99))
            log(f"{t} iters={it:2d}  rel_median={med:.2e}  rel_q99={q99:.2e}")
        # converged = within 1.3x of the best-achievable median (the
        # bf16 floor); `conv` is never empty (the best row qualifies),
        # so when best_med itself exceeds --tol the level cannot meet
        # the tolerance at ANY iteration count — flag it loudly rather
        # than silently picking.
        best_med = min(med for _, med, _ in rows)
        conv = [it for it, med, _ in rows
                if med <= max(args.tol, 1.3 * best_med)]
        pick[t] = min(conv)
        if best_med > args.tol:
            log(f"{t} WARNING: best achievable median {best_med:.2e} "
                f"exceeds --tol {args.tol:.2e}; picking iters={pick[t]} "
                f"anyway (bf16 floor for this level)")
        log(f"{t} -> pick {pick[t]} (best median {best_med:.2e})")

    tup = tuple((t, pick[t]) for t in vgg.RELU_TARGETS)
    log(f"per-level pick: {tup}")

    if args.bench:
        from wct_tpu.models import cascade
        from wct_tpu.utils.profiling import pipelined_fps

        rng = np.random.default_rng(0)
        style = jnp.asarray(rng.random((512, 512, 3), np.float32))
        batches = [jnp.asarray(rng.random((16, 512, 512, 3), np.float32))
                   for _ in range(4)]
        for name, ns in (("flat_default", None), ("per_level_pick", tup)):
            cfg = cascade.CascadeConfig(
                compute_dtype="bfloat16", method="newton_schulz_fast",
                pack2_junction=True, ns_iters=ns,
            )
            cache = cascade.precompute_style(params["encoder"], style, cfg)
            fn = lambda x: cascade.stylize(params, x, cache, 0.6, cfg)
            fps = pipelined_fps(fn, batches, 3)
            log(f"bench 512px b16 {name}: {fps:.1f} fps")
    return 0


if __name__ == "__main__":
    sys.exit(main())
