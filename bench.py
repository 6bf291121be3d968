"""Headline benchmark: 512px stylized frames/sec/chip, full 5-level WCT.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` is value / 60 — the BASELINE.json north-star target
(≥60 stylized 512px frames/sec/chip on v5e, full relu5_1→relu1_1
cascade). Detail (per-config latency/throughput, both precision modes)
goes to stderr so stdout stays one line.

Measurement notes (hard-won — see .claude/skills/verify/SKILL.md):
- ``block_until_ready`` does NOT synchronize through the axon TPU
  tunnel; every timing here syncs via a single-element device read
  (``float(out.ravel()[0])``), which requires the program (and all
  programs enqueued before it — TPU executes in order) to finish.
- The tunnel has a ~27 ms round-trip floor per synced call. Throughput
  is therefore measured by enqueueing K distinct pre-uploaded batches
  and syncing ONCE on the last output: frames = K·B / elapsed.
- Weights: the shipped trained bundle when present (weights/
  bundle.npz), else random init — conv/eigh/NS FLOPs are
  weight-independent, so the number is the same either way.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


# Sync/timing helpers live in wct_tpu.utils.profiling (single source of
# truth for the axon-tunnel measurement rules described above).


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=512)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--n-batches", type=int, default=8)
    parser.add_argument("--fidelity-too", action="store_true",
                        help="also measure the f32+eigh fidelity path")
    args = parser.parse_args()

    from wct_tpu.cli.common import enable_compile_cache
    from wct_tpu.models import cascade
    from wct_tpu.utils.profiling import latency_seconds as latency
    from wct_tpu.utils.profiling import pipelined_fps as throughput

    enable_compile_cache()
    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    log(f"device: {jax.devices()[0].device_kind} ({jax.default_backend()})")

    rng = np.random.default_rng(0)
    # Trained weights when present (identical FLOPs either way — conv/
    # eigh/NS cost is weight-independent; random init keeps the bench
    # runnable on a fresh clone).
    from pathlib import Path

    bundle = Path(__file__).parent / "weights" / "bundle.npz"
    if bundle.exists():
        from wct_tpu.train.checkpoint import load_pytree

        params = load_pytree(bundle)
        log(f"weights: trained bundle {bundle}")
    else:
        params = cascade.init_params(jax.random.PRNGKey(0))
        log("weights: random init (no trained bundle found)")
    style = jnp.asarray(rng.random((args.size, args.size, 3), np.float32))
    content1 = jnp.asarray(rng.random((1, args.size, args.size, 3), np.float32))
    batches = [
        jnp.asarray(rng.random((args.batch, args.size, args.size, 3), np.float32))
        for _ in range(args.n_batches)
    ]

    modes = [("bfloat16", "newton_schulz_fast")]
    if args.fidelity_too:
        modes.append(("float32", "eigh"))

    best = 0.0
    for dtype, method in modes:
        # pack2_junction: image-pair channel packing for the 64-ch
        # tier (+8% measured). fold_transform stays off (measured 72 ->
        # 52 fps: XLA lowers batch_group_count convs ~4x slower) — see
        # CascadeConfig docstrings / DESIGN.md §3.
        # Throughput (THE metric) is measured first and each step is
        # fenced so a late failure can't lose an already-measured
        # number; the packed config falls back to the plain one if it
        # fails to compile on some toolchain.
        alpha = jnp.float32(0.6)
        fps = 0.0
        fn = None
        # Attempt chain, fastest-known first: pack2 + composed conv0
        # (the full throughput preset, measured 85.1 vs 81.0 fps at
        # 512px batch-16 — DESIGN.md §3 round-4 ledger), then pack2
        # alone, then the plain config.
        variants = (
            [(True, True), (True, False), (False, False)]
            if dtype == "bfloat16"
            else [(False, False)]
        )
        for pack2, compose0 in variants:
            try:
                cfg = cascade.CascadeConfig(
                    compute_dtype=dtype, method=method, pack2_junction=pack2,
                    compose_conv0=compose0,
                )
                cache = cascade.precompute_style(params["encoder"], style, cfg)
                fn = lambda c: cascade.stylize(params, c, cache, alpha, cfg)
                fps = throughput(fn, batches)
                break
            except Exception as e:  # noqa: BLE001 — record what we can
                fn = None  # don't latency-bench a half-built config
                log(f"{dtype}/{method} pack2={pack2} compose0={compose0} "
                    "failed: "
                    f"{str(e).splitlines()[0][:120]}")
        best = max(best, fps)
        line = (f"{dtype}/{method}: pipelined batch-{args.batch} "
                f"throughput {fps:.1f} frames/s/chip")
        if fn is None or fps <= 0:
            # fn None: nothing compiled. fps 0 with an fn would make the
            # microbatched row's vs-stylize percentage divide by zero —
            # skip both secondary rows; the throughput line above
            # already records what happened.
            log(line + " | no usable config — latency/microbatched skipped")
            continue
        try:
            t1 = latency(fn, content1)
            line += f" | batch-1 latency {t1 * 1e3:.1f} ms (incl. ~27 ms tunnel RTT)"
        except Exception as e:  # noqa: BLE001
            line += f" | batch-1 latency unavailable ({str(e).splitlines()[0][:60]})"
        log(line)
        # The SERVING path that carries the bitwise batch-stability
        # guarantee (stylize_microbatched, microbatch = the compiled
        # shape): on full batches it is the same compiled program plus
        # a concatenate, so it must measure within ~2% of stylize —
        # this row substantiates "the guarantee costs nothing"
        # (VERDICT r2 item 3).
        try:
            mb_fn = lambda c: cascade.stylize_microbatched(
                params, c, cache, alpha, cfg, microbatch=args.batch
            )
            mb_fps = throughput(mb_fn, batches)
            log(f"{dtype}/{method}: stylize_microbatched(mb={args.batch}) "
                f"throughput {mb_fps:.1f} frames/s/chip "
                f"({100 * mb_fps / fps - 100:+.1f}% vs stylize)")
        except Exception as e:  # noqa: BLE001
            log(f"microbatched row unavailable ({str(e).splitlines()[0][:60]})")

    print(
        json.dumps(
            {
                "metric": f"{args.size}px stylized frames/sec/chip (5-level WCT)",
                "value": round(best, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(best / 60.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
