#!/usr/bin/env python
"""Attack config 4 (batch-8 1024px): isolate and measure each lever.

    python scripts/exp_config4.py [--quick]

Round-4 (VERDICT r3 next-round item 3). Measured state (DESIGN §3):
16.9 fps vs ~20.6 pixel-scaled from the 512px headline; device op time
465 ms/batch, compute-bound. Decomposition: eight 64-ch tier convs
25%, five RGB-output convs 14% (3-of-128 output lanes), upsample/
layout ≈6%. pack2 measured −24% END-TO-END at this size — but that
number never said WHICH packed segment loses. This script measures:

1. end-to-end: plain vs pack2 vs tail-only pack2 (new config scope)
2. the junction segment in isolation (packed vs unpacked) at 1024px —
   pack/unpack concats are HALF-res here, so if the segment wins in
   isolation the end-to-end loss must come from elsewhere
3. the relu1_1 packed tail in isolation (full-res transform + final
   conv) — its pack copies ARE full-res
4. the RGB-output conv alone vs layout alternatives (NCHW output dim
   numbers, packed 128→6)

Every row prints ms (single-element-readback sync; tunnel RTT ~27 ms
subtracted by the pipelined form where noted).
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

log = lambda *a: print(*a, flush=True)


from wct_tpu.utils.profiling import device_sync  # noqa: E402


def timed(fn, *args, n=6, warmup=2):
    """Median ms per call, device_sync'd (ONE-element readback — a
    full ``np.asarray(out)`` D2H rides the ~27 MB/s tunnel and adds
    ~40 ms/MB, swamping the op being measured)."""
    for _ in range(warmup):
        device_sync(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        device_sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return 1e3 * float(np.median(ts))


def pipelined_ms(fn, batches, rounds=3):
    """ms/call amortized: enqueue all, one-element sync once."""
    device_sync(fn(batches[0]))
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for b in batches:
            out = fn(b)
        device_sync(out)
        best = min(best, (time.perf_counter() - t0) / len(batches))
    return 1e3 * best


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--skip", nargs="*", default=[],
                    help="section names to skip (e2e, junction, tail, rgb)")
    args = ap.parse_args(argv)

    from wct_tpu.cli.common import enable_compile_cache
    from wct_tpu.models import cascade, decoder as dec_lib, vgg
    from wct_tpu.train import checkpoint

    enable_compile_cache()
    rng = np.random.default_rng(0)
    S, B = args.size, args.batch
    bundle = REPO / "weights" / "bundle.npz"
    params = (
        checkpoint.load_pytree(bundle)
        if bundle.exists()
        else cascade.init_params(jax.random.PRNGKey(0))
    )
    kw = dict(compute_dtype="bfloat16", method="newton_schulz_fast")
    n_b = 2 if args.quick else 4

    # ---------------- 1. end-to-end ----------------
    if "e2e" not in args.skip:
        style = jnp.asarray(rng.random((S, S, 3), np.float32))
        batches = [
            jnp.asarray(rng.random((B, S, S, 3), np.float32))
            for _ in range(n_b)
        ]
        for name, ckw in (
            ("plain", {}),
            ("pack2", {"pack2_junction": True}),
            ("pack2_tail_only", {"pack2_junction": True,
                                 "pack2_tail_only": True}),
            ("pack2_junction_only", {"pack2_junction": True,
                                     "pack2_junction_only": True}),
            # Ring-corrected reflect convs (no materialized pad copy):
            # the pad copy's HBM traffic scales with pixels, so this is
            # the resolution-scoped lever pack2 wasn't.
            ("ring", {"ring_conv": True}),
            ("ring+pack2_tail", {"ring_conv": True, "pack2_junction": True,
                                 "pack2_tail_only": True}),
            # conv0 composed into conv1_1 (the measured per-op win:
            # 57.2 → 52.3 ms per encoder head — DESIGN §3 r4 ledger).
            ("compose0", {"compose_conv0": True}),
        ):
            try:
                cfg = cascade.CascadeConfig(**ckw, **kw)
            except TypeError as e:
                log(f"e2e/{name}: config unsupported ({e})")
                continue
            try:
                cache = cascade.precompute_style(params["encoder"], style, cfg)
                fn = lambda x: cascade.stylize(params, x, cache, 0.6, cfg)
                ms = pipelined_ms(fn, batches)
                log(f"e2e/{name}: {ms:.1f} ms/batch = {1e3 * B / ms:.1f} fps")
            except Exception as e:  # noqa: BLE001
                log(f"e2e/{name} failed: {str(e).splitlines()[0][:100]}")

    # ---------------- 2. junction segment isolated ----------------
    # d: pre-upsample decoder feature at HALF res [B, S/2, S/2, 64];
    # chain = up, conv64->64, conv64->3(RGB), conv0, conv1_1, conv1_2,
    # pool (deep=True exit: post-pool1 [B, S/2, S/2, 64]).
    if "junction" not in args.skip:
        from wct_tpu.ops import pack2
        from wct_tpu.ops.convs import conv2d_reflect, maxpool2, upsample_nearest2

        enc = params["encoder"]
        dp = params["decoders"]["relu2_1"]
        dw = dec_lib.tail_weights(dp, "relu2_1")
        d = jnp.asarray(
            rng.standard_normal((B, S // 2, S // 2, 64)), jnp.bfloat16
        )

        @jax.jit
        def unpacked(d):
            x = upsample_nearest2(d)
            x = jax.nn.relu(conv2d_reflect(x, dw[0], dw[1]))
            x = conv2d_reflect(x, dw[2], dw[3])  # RGB
            x = conv2d_reflect(x, enc["conv0"]["w"], enc["conv0"]["b"])
            x = jax.nn.relu(
                conv2d_reflect(x, enc["conv1_1"]["w"], enc["conv1_1"]["b"])
            )
            x = jax.nn.relu(
                conv2d_reflect(x, enc["conv1_2"]["w"], enc["conv1_2"]["b"])
            )
            return maxpool2(x)

        @jax.jit
        def packed(d):
            return pack2.junction_pack2(
                d, *dw,
                enc["conv0"]["w"], enc["conv0"]["b"],
                enc["conv1_1"]["w"], enc["conv1_1"]["b"],
                enc["conv1_2"]["w"], enc["conv1_2"]["b"],
                deep=True,
            )

        log(f"junction/unpacked: {timed(unpacked, d):.1f} ms")
        log(f"junction/packed:   {timed(packed, d):.1f} ms")

    # ---------------- 3. relu1_1 tail isolated ----------------
    if "tail" not in args.skip:
        from wct_tpu.ops import pack2, wct as wct_ops
        from wct_tpu.ops.convs import conv2d_reflect

        enc = params["encoder"]
        dp1 = params["decoders"]["relu1_1"]["dec_conv1_1"]
        img = jnp.asarray(rng.random((B, S, S, 3), np.float32), jnp.bfloat16)
        fs = jnp.asarray(
            rng.standard_normal((S // 4, S // 4, 64)).astype(np.float32)
        )
        stats = wct_ops.style_stats(fs)

        @jax.jit
        def tail_unpacked(img):
            e1 = jax.nn.relu(conv2d_reflect(
                conv2d_reflect(img, enc["conv0"]["w"], enc["conv0"]["b"]),
                enc["conv1_1"]["w"], enc["conv1_1"]["b"],
            ))
            t = jax.vmap(
                lambda f: wct_ops.wct_from_stats(
                    f, stats, 0.6, method="newton_schulz_fast"
                )
            )(e1)
            return conv2d_reflect(t, dp1["w"], dp1["b"])

        @jax.jit
        def tail_packed(img):
            e1p = pack2.head_pack2_shallow(
                img, enc["conv0"]["w"], enc["conv0"]["b"],
                enc["conv1_1"]["w"], enc["conv1_1"]["b"],
            )
            return pack2.tail_pack2(
                e1p, stats, 0.6, dp1["w"], dp1["b"],
                method="newton_schulz_fast",
            )

        log(f"tail/unpacked: {timed(tail_unpacked, img):.1f} ms")
        log(f"tail/packed:   {timed(tail_packed, img):.1f} ms")

    # ---------------- 4. RGB-output conv alone ----------------
    if "rgb" not in args.skip:
        from wct_tpu.ops.convs import conv2d_reflect

        x = jnp.asarray(
            rng.standard_normal((B, S, S, 64)), jnp.bfloat16
        )
        w = jnp.asarray(rng.standard_normal((3, 3, 64, 3)), jnp.bfloat16)
        b = jnp.zeros((3,), jnp.bfloat16)

        @jax.jit
        def rgb_nhwc(x):
            return conv2d_reflect(x, w, b)

        log(f"rgb/nhwc_reflect: {timed(rgb_nhwc, x):.1f} ms")

        # VALID conv on pre-padded input with NCHW OUTPUT layout: the
        # output's minor dim becomes W (full lanes) instead of C=3.
        @jax.jit
        def rgb_nchw_out(x):
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
            out = jax.lax.conv_general_dilated(
                xp, w, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NCHW"),
            )
            return out  # [B, 3, S, S]

        log(f"rgb/nchw_out:     {timed(rgb_nchw_out, x):.1f} ms "
            "(excl. any transpose back)")

        @jax.jit
        def rgb_nchw_roundtrip(x):
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
            out = jax.lax.conv_general_dilated(
                xp, w, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NCHW"),
            )
            return jnp.transpose(out, (0, 2, 3, 1))

        log(f"rgb/nchw_out+T:   {timed(rgb_nchw_roundtrip, x):.1f} ms")

        # packed pair: 128-ch input, block-diag 128->6
        from wct_tpu.ops.pack2 import _blockdiag, _dup, pack, unpack

        @jax.jit
        def rgb_packed(x):
            xp2 = pack(x)
            out = conv2d_reflect(xp2, _blockdiag(w), _dup(b))
            return unpack(out)

        log(f"rgb/pack2:        {timed(rgb_packed, x):.1f} ms "
            "(incl. pack+unpack)")

        # wider-output control: how much of the cost is the 3-lane
        # output vs the 64-ch input read?
        w64 = jnp.asarray(rng.standard_normal((3, 3, 64, 64)), jnp.bfloat16)

        @jax.jit
        def conv64(x):
            return conv2d_reflect(x, w64, jnp.zeros((64,), jnp.bfloat16))

        log(f"rgb/control_64out: {timed(conv64, x):.1f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
