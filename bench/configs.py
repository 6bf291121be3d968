"""Benchmark harness for the five BASELINE.json configs.

    python bench/configs.py [--quick]

Emits one JSON object per config (to stdout, one per line) plus a
summary; the headline single-number bench remains ``bench.py`` at the
repo root (the driver contract). Configs (BASELINE.json):

1. Single-level WCT at relu3_1 — one 512×512 pair
2. Full 5-level cascade at 512px, single image, alpha=0.6
3. Style interpolation — 2 styles, weight + alpha sweep, one content
4. Batched high-res throughput — batch-8 1024px, fixed style
5. Video streaming — 720p frames with persistent style cache

All timings sync via single-element readback (block_until_ready is a
no-op through the axon tunnel; see bench.py notes).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


from wct_tpu.utils.profiling import (  # noqa: E402 — single sync source
    latency_seconds,
    pipelined_fps,
    sync_one_element as _sync,
)


def latency_ms(fn, x, n=5):
    return latency_seconds(fn, x, n) * 1000


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true", help="fewer rounds")
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--method", default="newton_schulz")
    args = parser.parse_args()
    rounds = 2 if args.quick else 3

    from wct_tpu.cli.common import enable_compile_cache
    from wct_tpu.models import cascade

    enable_compile_cache()
    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    emit = lambda d: print(json.dumps(d), flush=True)
    rng = np.random.default_rng(0)
    params = cascade.init_params(jax.random.PRNGKey(0))
    results = []

    def record(name, **kw):
        d = {"config": name, **kw}
        results.append(d)
        emit(d)

    kw = dict(compute_dtype=args.dtype, method=args.method)

    # ---- config 1: single-level relu3_1, one 512px pair ----
    cfg = cascade.CascadeConfig(relu_targets=("relu3_1",), **kw)
    style = jnp.asarray(rng.random((512, 512, 3), np.float32))
    cache = cascade.precompute_style(params["encoder"], style, cfg)
    c1 = jnp.asarray(rng.random((1, 512, 512, 3), np.float32))
    fn = lambda x: cascade.stylize(params, x, cache, 0.6, cfg)
    record("1_single_level_relu3_1_512px", latency_ms=latency_ms(fn, c1),
           fps=pipelined_fps(fn, [c1] * 8, rounds))

    # ---- config 2: full 5-level cascade, 512px, alpha=0.6 ----
    cfg = cascade.CascadeConfig(**kw)
    cache = cascade.precompute_style(params["encoder"], style, cfg)
    fn = lambda x: cascade.stylize(params, x, cache, 0.6, cfg)
    record("2_full_cascade_512px", latency_ms=latency_ms(fn, c1),
           fps=pipelined_fps(fn, [c1] * 8, rounds))

    # ---- config 2 transform variants: swap5 + AdaIN (VERDICT r3 item
    # 7 — every user-selectable transform mode gets a measured TPU
    # number, not just the WCT path; style-swap's patch conv/deconv is
    # exactly the kind of op that can be pathological on a new
    # backend). Same shape/alpha as config 2 so rows are comparable.
    for vname, vkw in (
        ("2s_full_cascade_swap5_512px", dict(swap5=True)),
        ("2a_full_cascade_adain_512px", dict(transform="adain")),
    ):
        try:
            cfg_v = cascade.CascadeConfig(**vkw, **kw)
            cache_v2 = cascade.precompute_style(params["encoder"], style, cfg_v)
            fn_v = lambda x: cascade.stylize(params, x, cache_v2, 0.6, cfg_v)
            record(vname, latency_ms=latency_ms(fn_v, c1),
                   fps=pipelined_fps(fn_v, [c1] * 8, rounds))
        except Exception as e:  # noqa: BLE001
            log(f"{vname} failed: {str(e).splitlines()[0][:100]}")

    # ---- config 3: style interpolation, weight + alpha sweep ----
    # stylize_interp fuses the stat blend + cascade into one dispatch;
    # weights/alpha are traced, so the sweep never recompiles.
    style2 = jnp.asarray(rng.random((512, 512, 3), np.float32))
    caches = [cache, cascade.precompute_style(params["encoder"], style2, cfg)]
    sweeps = [(w, a) for w in (0.0, 0.25, 0.5, 0.75, 1.0) for a in (0.4, 0.8)]
    _sync(cascade.stylize_interp(
        params, c1, caches, jnp.asarray([0.5, 0.5], jnp.float32), 0.6, cfg
    ))
    t0 = time.perf_counter()
    out = None
    for w, a in sweeps:
        out = cascade.stylize_interp(
            params, c1, caches, jnp.asarray([w, 1 - w], jnp.float32), a, cfg
        )
    _sync(out)
    dt = time.perf_counter() - t0
    record("3_interpolation_sweep_512px", frames=len(sweeps),
           fps=len(sweeps) / dt)

    # ---- config 4: batch-8 1024px throughput ----
    cfg = cascade.CascadeConfig(**kw)
    style_hr = jnp.asarray(rng.random((1024, 1024, 3), np.float32))
    cache_hr = cascade.precompute_style(params["encoder"], style_hr, cfg)
    b8 = [
        jnp.asarray(rng.random((8, 1024, 1024, 3), np.float32))
        for _ in range(2 if args.quick else 4)
    ]
    fn = lambda x: cascade.stylize(params, x, cache_hr, 0.6, cfg)
    record("4_batch8_1024px", fps=pipelined_fps(fn, b8, rounds))

    # pack2 variant (the headline config's third ingredient, only ever
    # measured at 512px before — VERDICT r2 item 6): does image-pair
    # lane packing still pay at 4× the pixels, or does HBM pressure eat
    # it? Falls back silently if the packed graph cannot compile.
    if args.dtype == "bfloat16":
        for vname, vkw in (
            ("4_batch8_1024px_pack2", dict(pack2_junction=True)),
            # tail-only scope (round 4): keep the level junctions
            # unpacked (their pack/unpack copies lose at 4x pixels) and
            # pack only the relu1_1 tail, whose lane-padding win scales
            # WITH pixels.
            ("4_batch8_1024px_pack2_tail", dict(pack2_junction=True,
                                                pack2_tail_only=True)),
            # conv0 composed into conv1_1 (round 4): deletes the
            # full-res 3-of-128-lane conv0 HLO from every encoder
            # head — the one measured config-4 WIN (17.0 → 17.8 fps;
            # DESIGN.md §3 round-4 ledger).
            ("4_batch8_1024px_compose0", dict(compose_conv0=True)),
        ):
            try:
                cfg_p = cascade.CascadeConfig(**vkw, **kw)
                cache_p = cascade.precompute_style(
                    params["encoder"], style_hr, cfg_p
                )
                fn_p = lambda x: cascade.stylize(params, x, cache_p, 0.6, cfg_p)
                record(vname, fps=pipelined_fps(fn_p, b8, rounds))
            except Exception as e:  # noqa: BLE001
                log(f"{vname} failed: {str(e).splitlines()[0][:100]}")

    # ---- config 5: 720p streaming with persistent style cache ----
    cfg = cascade.CascadeConfig(**kw)
    style_v = jnp.asarray(rng.random((720, 720, 3), np.float32))
    cache_v = cascade.precompute_style(params["encoder"], style_v, cfg)
    frames = [
        jnp.asarray(rng.random((1, 720, 1280, 3), np.float32)) for _ in range(8)
    ]
    fn = lambda x: cascade.stylize(params, x, cache_v, 0.6, cfg)
    # style-switch cost: how long to encode + cache a new style.
    # Warm the sync slice first (its first use compiles a tiny program,
    # which would otherwise dominate the measurement).
    _sync(cache_v["relu5_1"].stats.kernel)
    t0 = time.perf_counter()
    _sync(
        cascade.precompute_style(params["encoder"], style_v, cfg)["relu5_1"].stats.kernel
    )
    style_switch_ms = (time.perf_counter() - t0) * 1000
    record("5_stream_720p", fps=pipelined_fps(fn, frames, rounds),
           style_switch_ms=style_switch_ms)

    # Device-resident frame batching (VERDICT r2 item 5): batch the
    # CASCADE input — consecutive frames stacked [fb, 720, 1280, 3] —
    # not the tunnel. Measures the real lever behind --frame-batch:
    # batch-1 dispatches were ~2.4× less MXU-efficient (r1 data). The
    # fb=2 pack2 row adds image-pair lane packing on top (720p is
    # %16-aligned, so the pair is eligible).
    for fb in (2, 4):
        frames_fb = [
            jnp.asarray(rng.random((fb, 720, 1280, 3), np.float32))
            for _ in range(8)
        ]
        record(f"5_stream_720p_device_frame_batch{fb}",
               fps=pipelined_fps(fn, frames_fb, rounds),
               frame_latency_ms=latency_ms(fn, frames_fb[0]))
    if args.dtype == "bfloat16":
        try:
            cfg_p = cascade.CascadeConfig(pack2_junction=True, **kw)
            cache_vp = cascade.precompute_style(params["encoder"], style_v, cfg_p)
            fn_p = lambda x: cascade.stylize(params, x, cache_vp, 0.6, cfg_p)
            frames_fb = [
                jnp.asarray(rng.random((2, 720, 1280, 3), np.float32))
                for _ in range(8)
            ]
            record("5_stream_720p_device_frame_batch2_pack2",
                   fps=pipelined_fps(fn_p, frames_fb, rounds))
        except Exception as e:  # noqa: BLE001
            log(f"config-5 pack2 variant failed: {str(e).splitlines()[0][:100]}")

    # ---- config 5 (engine): true host-in → host-out streaming ----
    # The number a user's webcam loop actually sees: numpy frame in,
    # numpy frame out INCLUDING the D2H readback — in strict per-frame
    # mode and in submit-ahead/sync-behind pipelined mode (uint8
    # on-device quantization, ¼ the D2H bytes).
    from wct_tpu.utils.stream import StreamStylizer

    host_frames = [
        rng.random((720, 1280, 3)).astype(np.float32) for _ in range(12)
    ]
    eng = StreamStylizer(params, cfg, 720, 1280, readback="uint8")
    eng.set_style(np.asarray(style_v))
    eng.process(host_frames[0])  # warm/compile
    t0 = time.perf_counter()
    for f in host_frames:
        eng.process(f)
    strict_fps = len(host_frames) / (time.perf_counter() - t0)
    t0 = time.perf_counter()
    n_out = 0
    for f in host_frames:
        if eng.process_pipelined(f) is not None:
            n_out += 1
    while eng.collect() is not None:
        n_out += 1
    piped_fps = n_out / (time.perf_counter() - t0)
    record("5_stream_720p_engine_host_io", strict_fps=strict_fps,
           pipelined_fps=piped_fps,
           note="axon-tunnel-bound: 11 MB/frame f32 H2D at ~27 MB/s "
                "dominates; a local TPU host moves this in <1 ms")

    # frame_batch=2: consecutive-frame pairing (one dispatch per pair;
    # with pack2-eligible configs the pair also rides the image-pair
    # lane packing). +1 frame latency vs pipelined single-frame.
    eng2 = StreamStylizer(params, cfg, 720, 1280, readback="uint8",
                          frame_batch=2)
    eng2.set_style(np.asarray(style_v))
    for f in host_frames[:4]:  # warm/compile the paired graph
        eng2.process_pipelined(f)
    while eng2.collect() is not None:
        pass
    t0 = time.perf_counter()
    n_out = 0
    for f in host_frames:
        if eng2.process_pipelined(f) is not None:
            n_out += 1
    while eng2.collect() is not None:
        n_out += 1
    pair_fps = n_out / (time.perf_counter() - t0)
    record("5_stream_720p_engine_frame_batch2", pipelined_fps=pair_fps,
           note="tunnel-bound like host_io; pairing helps only when "
                "dispatch overhead or lane padding binds, not H2D")

    log("summary: " + json.dumps(results))


if __name__ == "__main__":
    main()
