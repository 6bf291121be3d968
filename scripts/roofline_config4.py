#!/usr/bin/env python
"""Per-op roofline of BASELINE config 4 (batch-8 1024px full cascade).

    python scripts/roofline_config4.py [--batch 8] [--size 1024]

Round-5 (VERDICT r4 item 2): either int8 pushes config 4 past 19 fps,
or THIS table proves the measured 17.6 fps sits at the hardware bound.
Method:

1. measure THIS chip's practical peaks through the tunnel: bf16 matmul
   TFLOP/s (4k³ matmul) and HBM GB/s (big f32 copy) — the same
   calibration discipline as DESIGN §3's 120 TFLOP/s number;
2. enumerate every op instance the config-4 cascade executes (walking
   vgg.ENCODER_LAYERS / decoder_layers per level, with compose_conv0
   applied, at its actual resolution), with analytic FLOPs and HBM
   bytes (activations in/out at bf16; weights negligible);
3. per unique op: ideal ms = max(FLOPs/peak, bytes/bandwidth) and
   MEASURED ms as an isolated jit (loses cross-op fusion — an upper
   bound per op, labelled as such);
4. print per-op-class rows + the bottom line: Σ ideal vs Σ measured vs
   the fused end-to-end cascade ms.

The gap between Σ ideal and the fused measurement is the honest
"distance from speed-of-light"; the per-class rows say where it lives.
"""

from __future__ import annotations

import argparse
import sys
import time
from collections import defaultdict
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from wct_tpu.models import cascade, decoder as dec_lib, vgg  # noqa: E402
from wct_tpu.ops import convs, wct as wct_ops  # noqa: E402
from wct_tpu.utils.profiling import device_sync  # noqa: E402

log = lambda *a: print(*a, flush=True)


def timed(fn, *args, n=3, warmup=2):
    """ms per call, tunnel-RTT-free.

    A single enqueue+sync pays the ~27 ms tunnel RTT (DESIGN §3
    methodology), which swamps millisecond ops — a naive per-call sync
    measured this chip at "4.4 TFLOP/s". Instead enqueue k then 2k
    calls, sync once each; (t_2k - t_k) / k cancels the constant
    dispatch+RTT term exactly (the TPU executes enqueued calls in
    order). k adapts so the differenced compute span is well above
    RTT noise for sub-ms ops without making 400 ms ops take minutes.
    """
    t_est = 0.0
    for _ in range(warmup):
        t0 = time.perf_counter()
        device_sync(fn(*args))
        t_est = time.perf_counter() - t0
    k = max(4, min(64, int(0.4 / max(t_est - 0.025, 0.002))))

    def run(m):
        t0 = time.perf_counter()
        out = None
        for _ in range(m):
            out = fn(*args)
        device_sync(out)
        return time.perf_counter() - t0

    ts = []
    for _ in range(n):
        t1 = run(k)
        t2 = run(2 * k)
        ts.append((t2 - t1) / k)
    return 1e3 * float(np.median(ts))


def measure_peaks():
    """(bf16 TFLOP/s, HBM GB/s) as THIS session sees them."""
    a = jnp.ones((4096, 4096), jnp.bfloat16)
    b = jnp.ones((4096, 4096), jnp.bfloat16)
    mm = jax.jit(lambda x, y: (x @ y))
    t_mm = timed(mm, a, b)
    tflops = 2 * 4096**3 / (t_mm * 1e-3) / 1e12
    # lane-aligned last dim (multiple of 128): unaligned shapes are
    # physically padded to 128 lanes on TPU (f32[...,4] would occupy 32x)
    big = jnp.ones((64, 1024, 32, 128), jnp.float32)  # 1 GiB
    cp = jax.jit(lambda x: x * 1.0000001)
    t_cp = timed(cp, big)
    gbs = 2 * big.size * 4 / (t_cp * 1e-3) / 1e9  # read + write
    return tflops, gbs


# cascade levels in execution order with their encoder depth
LEVELS = ("relu5_1", "relu4_1", "relu3_1", "relu2_1", "relu1_1")


def conv_instances(size: int):
    """Yield (kind, name, B-relative res, ci, co, k) for every conv/pool/
    upsample instance config 4 executes (compose_conv0: conv0 folded)."""
    insts = []
    for lvl in LEVELS:
        # encoder walk to lvl
        h = size
        for spec in vgg.layers_to(lvl):
            if spec[0] == "pool":
                insts.append(("pool", spec[1], h, None, None, None))
                h //= 2
                continue
            _, name, ci, co, k = spec
            if name == "conv0":
                continue  # composed into conv1_1 (compose_conv0=True)
            insts.append(("conv", f"enc:{name}", h, ci, co, k))
        # decoder walk back
        for spec in dec_lib.decoder_layers(lvl):
            if spec[0] == "upsample":
                insts.append(("upsample", f"dec:{spec[1]}", h, None, None, None))
                h *= 2
                continue
            _, name, ci, co, k = (spec + (3,))[:5] if len(spec) < 5 else spec
            insts.append(("conv", f"dec:{lvl}:{name}", h, ci, co, k))
        insts.append(("wct", lvl, h_of(lvl, size), None, None, None))
    return insts


def h_of(lvl: str, size: int) -> int:
    return size // {"relu1_1": 1, "relu2_1": 2, "relu3_1": 4,
                    "relu4_1": 8, "relu5_1": 16}[lvl]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--skip-e2e", action="store_true")
    ap.add_argument("--analytic", action="store_true",
                    help="no TPU: analytic ideal-ms table only, using "
                    "--tflops/--gbs peaks measured in a prior session")
    ap.add_argument("--tflops", type=float, default=189.8,
                    help="measured bf16 matmul peak (RTT-free, 2026-08-20)")
    ap.add_argument("--gbs", type=float, default=657.0,
                    help="measured HBM copy bandwidth (RTT-free)")
    args = ap.parse_args(argv)
    B, S = args.batch, args.size

    from wct_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    if args.analytic:
        tflops, gbs = args.tflops, args.gbs
        log(f"analytic mode: peaks {tflops:.1f} bf16-TFLOP/s, "
            f"{gbs:.0f} GB/s HBM (prior measured)")
    else:
        log("device:", jax.devices()[0])
        tflops, gbs = measure_peaks()
        log(f"measured peaks: {tflops:.1f} bf16-TFLOP/s, {gbs:.0f} GB/s HBM")

    # decoder_layers spec sanity (kind, name, ci, co[, k])
    probe = dec_lib.decoder_layers("relu2_1")
    log(f"decoder_layers probe: {probe}")

    rng = np.random.default_rng(0)
    rows = defaultdict(lambda: dict(count=0, flops=0.0, bytes=0.0,
                                    ideal=0.0, measured=0.0))
    measured_cache: dict = {}

    # Device-side data generation: multi-GB host->device transfers ride
    # the tunnel at ~30 MB/s (DESIGN §3) — a [8,1024,1024,64] f32 probe
    # would cost minutes of pure H2D before the first measurement.
    dev_key = jax.random.PRNGKey(0)

    def dev_normal(shape, dtype, scale=1.0, absval=False):
        nonlocal dev_key
        dev_key, sub = jax.random.split(dev_key)
        x = jax.random.normal(sub, shape, jnp.float32) * scale
        if absval:
            x = jnp.abs(x)
        return jax.block_until_ready(x.astype(dtype))

    def measure_conv(h, ci, co, k):
        key = ("conv", h, ci, co, k)
        if key not in measured_cache:
            x = dev_normal((B, h, h, ci), jnp.bfloat16)
            w = dev_normal((k, k, ci, co), jnp.float32, scale=0.05)
            bb = jnp.zeros((co,), jnp.float32)
            fn = jax.jit(lambda x_: convs.conv2d_reflect(x_, w, bb))
            measured_cache[key] = timed(fn, x)
        return measured_cache[key]

    def measure_pool(h, c):
        key = ("pool", h, c)
        if key not in measured_cache:
            x = dev_normal((B, h, h, c), jnp.bfloat16)
            measured_cache[key] = timed(jax.jit(convs.maxpool2), x)
        return measured_cache[key]

    def measure_up(h, c):
        key = ("up", h, c)
        if key not in measured_cache:
            x = dev_normal((B, h, h, c), jnp.bfloat16)
            measured_cache[key] = timed(jax.jit(convs.upsample_nearest2), x)
        return measured_cache[key]

    def measure_wct(lvl):
        key = ("wct", lvl)
        if key not in measured_cache:
            h = h_of(lvl, S)
            c = {"relu1_1": 64, "relu2_1": 128, "relu3_1": 256,
                 "relu4_1": 512, "relu5_1": 512}[lvl]
            fc = dev_normal((B, h, h, c), jnp.float32, absval=True)
            fs = dev_normal((h, h, c), jnp.float32, absval=True)
            stats = wct_ops.style_stats(fs, method="newton_schulz_fast")

            @jax.jit
            def tf(fc_):
                return jax.vmap(
                    lambda f: wct_ops.wct_from_stats(
                        f, stats, 0.8, method="newton_schulz_fast")
                )(fc_)

            measured_cache[key] = timed(tf, fc)
        return measured_cache[key]

    # channel state for pool/upsample byte accounting
    chan_at = {1024: 64, 512: 128, 256: 256, 128: 512, 64: 512, 32: 512}

    for kind, name, h, ci, co, k in conv_instances(S):
        if kind == "conv":
            flops = 2.0 * B * h * h * ci * co * k * k
            byts = B * h * h * (ci + co) * 2.0
            ideal = max(flops / (tflops * 1e12), byts / (gbs * 1e9)) * 1e3
            meas = 0.0 if args.analytic else measure_conv(h, ci, co, k)
            cls = f"conv {h:>4}px {ci:>3}->{co:<3}"
        elif kind == "pool":
            c = chan_at.get(h, 512)
            flops = 0.0
            byts = B * h * h * c * 2.0 * 1.25
            ideal = byts / (gbs * 1e9) * 1e3
            meas = 0.0 if args.analytic else measure_pool(h, c)
            cls = f"pool {h:>4}px {c}ch"
        elif kind == "upsample":
            c = chan_at.get(h * 2, 512)
            flops = 0.0
            byts = B * h * h * c * 2.0 * 5.0  # read + 4x write
            ideal = byts / (gbs * 1e9) * 1e3
            meas = 0.0 if args.analytic else measure_up(h, c)
            cls = f"upsv {h:>4}px {c}ch"
        else:  # wct
            c = {"relu1_1": 64, "relu2_1": 128, "relu3_1": 256,
                 "relu4_1": 512, "relu5_1": 512}[name]
            hw = h * h
            # content Gram + whiten apply + color apply (style cached)
            flops = B * (2.0 * hw * c * c + 2 * 2.0 * hw * c * c)
            byts = B * hw * c * 4.0 * 3
            ideal = max(flops / (tflops * 1e12), byts / (gbs * 1e9)) * 1e3
            meas = 0.0 if args.analytic else measure_wct(name)
            cls = f"wct  {name}"
        r = rows[cls]
        r["count"] += 1
        r["flops"] += flops
        r["bytes"] += byts
        r["ideal"] += ideal
        r["measured"] += meas

    log(f"\n{'op class':<26} {'n':>2} {'GFLOP':>8} {'GB':>6} "
        f"{'ideal ms':>9} {'meas ms':>8} {'x':>5}")
    tot_i = tot_m = tot_f = tot_b = 0.0
    for cls in sorted(rows, key=lambda c: -rows[c]["ideal"]):
        r = rows[cls]
        ratio = r["measured"] / max(r["ideal"], 1e-9)
        log(f"{cls:<26} {r['count']:>2} {r['flops']/1e9:>8.1f} "
            f"{r['bytes']/1e9:>6.2f} {r['ideal']:>9.2f} "
            f"{r['measured']:>8.2f} {ratio:>5.1f}")
        tot_i += r["ideal"]
        tot_m += r["measured"]
        tot_f += r["flops"]
        tot_b += r["bytes"]
    log(f"{'TOTAL':<26} {'':>2} {tot_f/1e9:>8.1f} {tot_b/1e9:>6.2f} "
        f"{tot_i:>9.2f} {tot_m:>8.2f} {tot_m/max(tot_i,1e-9):>5.1f}")
    log(f"speed-of-light fps at ideal: {B / (tot_i * 1e-3):.1f}" + (
        "" if args.analytic else
        f"  (isolated-op sum fps: {B / (tot_m * 1e-3):.1f})"))

    if not args.skip_e2e and not args.analytic:
        from wct_tpu.train import checkpoint

        params = checkpoint.load_pytree(REPO / "weights" / "bundle.npz")
        cfg = cascade.CascadeConfig(
            compute_dtype="bfloat16", method="newton_schulz_fast",
            compose_conv0=True,
        )
        content = jax.device_put(jnp.asarray(
            rng.random((B, S, S, 3)), jnp.float32))
        style = jax.device_put(jnp.asarray(rng.random((S, S, 3)), jnp.float32))
        cache = cascade.precompute_style(params["encoder"], style, cfg)
        fn = lambda c: cascade.stylize(params, c, cache, 0.8, cfg)
        t = timed(fn, content)
        log(f"fused e2e cascade: {t:.1f} ms  ({B / (t * 1e-3):.1f} fps)  "
            f"vs Σideal {tot_i:.1f} ms — fused runs at "
            f"{tot_i / t * 100:.0f}% of speed-of-light")
    return 0


if __name__ == "__main__":
    sys.exit(main())
