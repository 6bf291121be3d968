"""Per-stage timing breakdown of the 512px hot config (bf16 + NS, batch 16).

Times each cascade level's encode / transform / decode as separately
jitted programs on the real chip, using the tunnel-safe measurement
discipline from utils/profiling.py (enqueue K, sync once). Separately
jitted stages lose XLA's cross-stage fusion so the sum exceeds the
fused cascade's time, but the RATIOS tell us where to optimize.

Usage: python scripts/profile_stages.py [--size 512] [--batch 16]
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from wct_tpu.cli.common import enable_compile_cache
from wct_tpu.models import cascade, decoder as dec_lib, vgg
from wct_tpu.ops import wct as wct_ops
from wct_tpu.utils.profiling import device_sync


def timeit(fn, *args, iters=6):
    out = fn(*args)
    device_sync(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    device_sync(outs[-1])
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--method", default="newton_schulz")
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    enable_compile_cache()
    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    log(f"device: {jax.devices()[0].device_kind}")

    rng = np.random.default_rng(0)
    params = cascade.init_params(jax.random.PRNGKey(0))
    cfg = cascade.CascadeConfig(compute_dtype=args.dtype, method=args.method)
    dt = cfg.dtype

    style = jnp.asarray(rng.random((args.size, args.size, 3), np.float32))
    cache = cascade.precompute_style(params["encoder"], style, cfg)
    content = jnp.asarray(
        rng.random((args.batch, args.size, args.size, 3), np.float32)
    ).astype(dt)

    # Full fused cascade reference time.
    alpha = jnp.float32(0.6)
    full = partial(cascade.stylize, cfg=cfg)
    t_full = timeit(lambda c: full(params, c, cache, alpha), content)
    log(f"FULL fused cascade: {t_full*1e3:8.2f} ms/batch  "
        f"({args.batch/t_full:6.1f} fps)")

    enc_j = jax.jit(vgg.encode, static_argnames="target")
    dec_j = jax.jit(dec_lib.decode, static_argnames="target")

    total = 0.0
    img = content
    for level in cfg.relu_targets:
        t_enc = timeit(lambda im: enc_j(params["encoder"], im, level), img)
        feats = enc_j(params["encoder"], img, level)

        st = cache[level]
        tf_fn = jax.jit(
            lambda f, a: jax.vmap(
                lambda x: wct_ops.wct_from_stats(x, st.stats, a, method=cfg.method)
            )(f)
        )
        t_tf = timeit(lambda f: tf_fn(f, alpha), feats)
        transformed = tf_fn(feats, alpha)

        t_dec = timeit(
            lambda f: dec_j(params["decoders"][level], f, level), transformed
        )
        img = dec_j(params["decoders"][level], transformed, level)

        c = vgg.TARGET_CHANNELS[level]
        n = feats.shape[1] * feats.shape[2]
        log(f"{level}: enc {t_enc*1e3:7.2f}  wct {t_tf*1e3:7.2f}  "
            f"dec {t_dec*1e3:7.2f} ms   (C={c}, N={n})")
        total += t_enc + t_tf + t_dec

    log(f"sum of separately-jitted stages: {total*1e3:.2f} ms "
        f"(vs fused {t_full*1e3:.2f})")


if __name__ == "__main__":
    main()
