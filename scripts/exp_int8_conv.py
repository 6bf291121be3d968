#!/usr/bin/env python
"""Config-4 int8 lever: bench int8 vs bf16 convs at the 64-ch tier shapes.

    python scripts/exp_int8_conv.py [--quick]

Round-5 (VERDICT r4 next-round item 2): the ONE untried config-4 lever
class is precision below bf16. TPU v5e's MXU has 2× int8 throughput,
and BASELINE config 4's decomposition names the 64-channel tier (eight
convs, 25% of device time) and the RGB-output convs (14% at 3-of-128
lanes) as the lane-starved residue. This measures, per shape:

1. bf16 conv (the shipped path) — the number to beat
2. int8 conv (ops/convs.py::conv2d_reflect_int8, static act scale —
   the quant/dequant VPU work rides along, as it would in production)
3. int8 conv, pre-quantized activations (MXU-only — the int8 CEILING:
   what the conv itself costs if quantization were fused/amortized)

plus a worst-case accuracy row per shape. Decision rule mirrors the
round-4 lever campaign: ship only on an END-TO-END win; otherwise this
script's numbers close the lever in DESIGN §3's ledger.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from wct_tpu.ops import convs  # noqa: E402
from wct_tpu.utils.profiling import device_sync  # noqa: E402

log = lambda *a: print(*a, flush=True)


def timed(fn, *args, n=6, warmup=2):
    for _ in range(warmup):
        device_sync(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        device_sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return 1e3 * float(np.median(ts))


# config-4 tier shapes: (label, B, H, W, ci, co). 1024px encoder runs
# conv1_1/conv1_2 at full res; the decoder's 64-ch convs + the final
# 64→3 run at full res in every level's tail.
SHAPES = [
    ("conv1_2 64->64 1024px b8", 8, 1024, 1024, 64, 64),
    ("dec 64->3 1024px b8", 8, 1024, 1024, 64, 3),
    ("conv2_x 128->128 512px b8", 8, 512, 512, 128, 128),
    ("conv1_2 64->64 512px b16", 16, 512, 512, 64, 64),
]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args(argv)

    from wct_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    log("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    shapes = SHAPES[:2] if args.quick else SHAPES

    for label, b, h, w, ci, co in shapes:
        x_np = np.abs(rng.standard_normal((b, h, w, ci))).astype(np.float32)
        w_np = (rng.standard_normal((3, 3, ci, co)) * 0.05).astype(np.float32)
        b_np = rng.standard_normal((co,)).astype(np.float32)

        x_bf = jax.device_put(jnp.asarray(x_np, jnp.bfloat16))
        w_f = jax.device_put(jnp.asarray(w_np))
        b_f = jax.device_put(jnp.asarray(b_np))
        wq, ws = convs.quantize_weight_int8(w_f)
        wq, ws = jax.device_put(wq), jax.device_put(ws)
        sx = float(np.abs(x_np).max() / 127.0)
        xq = jax.device_put(
            jnp.clip(jnp.round(jnp.asarray(x_np) / sx), -127, 127).astype(jnp.int8)
        )

        bf16_fn = jax.jit(lambda x: convs.conv2d_reflect(x, w_f, b_f))
        int8_fn = jax.jit(
            lambda x: convs.conv2d_reflect_int8(x, wq, ws, b_f, act_scale=sx)
        )

        @jax.jit
        def int8_core(xq_):
            yq = jax.lax.conv_general_dilated(
                convs.pad_reflect(xq_, 1) if co != 1 else xq_,
                wq,
                window_strides=(1, 1),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            return yq.astype(jnp.float32) * (sx * ws)[None, None, None, :] + b_f

        t_bf = timed(bf16_fn, x_bf)
        t_i8 = timed(int8_fn, jax.device_put(jnp.asarray(x_np, jnp.bfloat16)))
        t_core = timed(int8_core, xq)

        ref = np.asarray(jax.device_get(bf16_fn(x_bf)).astype(jnp.float32))
        got = np.asarray(
            jax.device_get(int8_fn(jnp.asarray(x_np, jnp.bfloat16))).astype(
                jnp.float32
            )
        )
        rel = float(np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-6))

        flops = 2 * b * h * w * ci * co * 9
        log(f"[{label}] bf16 {t_bf:7.2f} ms ({flops/t_bf/1e9:6.1f} TF/s)  "
            f"int8 {t_i8:7.2f} ms  int8-core {t_core:7.2f} ms "
            f"({flops/t_core/1e9:6.1f} TOP/s)  max-rel-err {rel:.3e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
