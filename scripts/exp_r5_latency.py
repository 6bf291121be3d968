#!/usr/bin/env python
"""Round-5 batch-1 latency attack + reproducible-mode cost (VERDICT r4
items 6 and 7).

    python scripts/exp_r5_latency.py [--quick]

Item 6 — the interactive/webcam axis (reference webcam.py's per-frame
sess.run loop, SURVEY §3.3): the round-4 headline is batch-16-amortized
(11.5 ms/frame); batch-1 device time was ~25.6 ms. This measures where
the 2.2× lives and what moves it:

- the batch-amortization curve (b = 1..16, device ms/frame) for the
  throughput preset — how much of batch-1's cost is per-DISPATCH
  (fixed work that amortizes) vs per-frame;
- levers at batch 1: per-level NS iteration trim (12/12/10/8/6 — the
  WCT solves do NOT amortize with batch, so the trim that was ≤+0.6%
  at batch 16 can matter here), method='auto' (eigh for the shallow
  C≤128 levels), and f32/eigh fidelity context.

Run scripts/roofline_config4.py --batch 1 --size 512 for the per-op
ideal-vs-measured decomposition that says whether the residue is
hardware-bound.

Item 7 — the reproducible mode, end to end: rel_trunc measured
bit-identical keep masks across solvers (DESIGN §2b) but is eigh-only;
method='auto' + rel_trunc RAISES for the C>128 levels (Newton–Schulz
has no spectrum mask — ops/wct.py:246). The recommended reproducible
config is therefore full eigh + rel_trunc; this measures its
throughput cost vs the NS throughput preset at the headline shape
(batch-16 512px) so the README can name the speed-vs-reproducibility
trade with numbers.

Results land in bench/results_r5_configs.jsonl (append).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from wct_tpu.models import cascade  # noqa: E402
from wct_tpu.utils.profiling import (  # noqa: E402
    latency_seconds,
    pipelined_fps,
)

log = lambda *a: print(*a, flush=True)

NS_TRIM = (("relu5_1", 12), ("relu4_1", 12), ("relu3_1", 10),
           ("relu2_1", 8), ("relu1_1", 6))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--out", default=str(REPO / "bench" /
                                         "results_r5_configs.jsonl"))
    args = ap.parse_args(argv)
    rounds = 2 if args.quick else 3

    from wct_tpu.cli.common import enable_compile_cache
    from wct_tpu.train import checkpoint

    enable_compile_cache()
    log("device:", jax.devices()[0])
    params = checkpoint.load_pytree(REPO / "weights" / "bundle.npz")
    rng = np.random.default_rng(0)
    S = args.size
    style = jnp.asarray(rng.random((S, S, 3), np.float32))
    out_f = open(args.out, "a")

    def record(name, **kw):
        d = {"config": name, **kw, "ts": time.strftime("%Y-%m-%dT%H:%M:%S")}
        print(json.dumps(d), file=out_f, flush=True)
        log(f"[{name}] " + "  ".join(f"{k}={v:.2f}" if isinstance(v, float)
                                     else f"{k}={v}" for k, v in kw.items()))

    def bench(name, cfg, batches, n_inputs=16, latency=True):
        cache = cascade.precompute_style(params["encoder"], style, cfg)
        fn = lambda x: cascade.stylize(params, x, cache, 0.6, cfg)
        for b in batches:
            xs = [jnp.asarray(rng.random((b, S, S, 3), np.float32))
                  for _ in range(max(2, n_inputs // b))]
            fps = pipelined_fps(fn, xs, rounds)
            row = dict(batch=b, fps=fps, device_ms_per_frame=1e3 / fps)
            if latency and b == 1:
                row["rtt_latency_ms"] = latency_seconds(fn, xs[0]) * 1e3
            record(f"{name}_b{b}_{S}px", **row)

    # ---- item 6: batch-1 512px ----
    preset = dict(compute_dtype="bfloat16", method="newton_schulz_fast",
                  compose_conv0=True)
    bench("6_preset", cascade.CascadeConfig(**preset),
          (1,) if args.quick else (1, 2, 4, 8, 16))
    bench("6_preset_nstrim",
          cascade.CascadeConfig(ns_iters=NS_TRIM, **preset), (1,))
    bench("6_auto", cascade.CascadeConfig(
        compute_dtype="bfloat16", method="auto", compose_conv0=True), (1,))
    bench("6_fidelity_f32_eigh", cascade.CascadeConfig(), (1,),
          n_inputs=4 if args.quick else 8)

    # ---- item 7: reproducible mode at the headline shape ----
    if not args.quick:
        bench("7_repro_eigh_rel1e-3_f32", cascade.CascadeConfig(
            method="eigh", rel_trunc=1e-3), (16,))
        bench("7_repro_eigh_rel1e-3_bf16", cascade.CascadeConfig(
            method="eigh", rel_trunc=1e-3, compute_dtype="bfloat16",
            compose_conv0=True), (16,))
        bench("7_ns_preset_headline", cascade.CascadeConfig(
            pack2_junction=True, **preset), (16,))
    return 0


if __name__ == "__main__":
    sys.exit(main())
