"""Experiments: cheaper WCT stage for the bf16 throughput path.

A. Newton-Schulz convergence vs (precision, iters) on realistic Grams.
B. Per-level wct_from_stats timing variants:
   - current (f32 Gram operands, HIGH apply, NS 20 iters HIGHEST)
   - bf16 Gram operands (exact products for bf16 features)
   - bf16 apply operands
   - NS at HIGH / fewer iterations

Run: python -m scripts.exp_wct_fast
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from wct_tpu.cli.common import enable_compile_cache
from wct_tpu.ops import reductions, wct as wct_ops
from wct_tpu.utils.profiling import device_sync

log = lambda *a: print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, iters=8):
    out = fn(*args)
    device_sync(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    device_sync(outs[-1])
    return (time.perf_counter() - t0) / iters


def make_gram(key, c, n, rank_frac=1.0):
    """Gram of realistic (relu-like, correlated) features."""
    k1, k2 = jax.random.split(key)
    # correlated channels: mix a low-rank basis + noise, relu'd
    r = max(1, int(c * rank_frac))
    basis = jax.random.normal(k1, (n, r))
    mix = jax.random.normal(k2, (r, c)) / np.sqrt(r)
    f = jax.nn.relu(basis @ mix + 0.3)
    f = f - f.mean(0, keepdims=True)
    return (f.T @ f) / (n - 1) + 1e-8 * jnp.eye(c)


def ns_variant(cov, iters, precision):
    c = cov.shape[-1]
    a = cov.astype(jnp.float32)
    a = a + (1e-5 * reductions.trace(a) / c) * jnp.eye(c, dtype=a.dtype)
    norm = reductions.inf_norm(a)
    eye = jnp.eye(c, dtype=a.dtype)
    dot = partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    y, z = a / norm, eye

    def body(_, yz):
        y, z = yz
        t = 1.5 * eye - 0.5 * dot(z, y)
        return dot(y, t), dot(t, z)

    y, z = jax.lax.fori_loop(0, iters, body, (y, z))
    return y * jnp.sqrt(norm), z / jnp.sqrt(norm)


def main():
    enable_compile_cache()
    log(f"device: {jax.devices()[0].device_kind}")
    P = jax.lax.Precision

    # ---- A: convergence ----
    log("\n=== A. NS convergence: rel err of Y@Y vs cov (C=512) ===")
    for rank_frac in (1.0, 0.5):
        cov = make_gram(jax.random.PRNGKey(1), 512, 1024, rank_frac)
        covf = np.asarray(cov, np.float64)
        for prec in (P.HIGHEST, P.HIGH, P.DEFAULT):
            row = []
            for it in (10, 12, 14, 16, 20):
                y, z = jax.jit(ns_variant, static_argnums=(1, 2))(cov, it, prec)
                yy = np.asarray(y, np.float64)
                err = np.linalg.norm(yy @ yy - covf) / np.linalg.norm(covf)
                # whitening quality: z@cov@z ~ I on retained spectrum
                zz = np.asarray(z, np.float64)
                w = zz @ covf @ zz
                werr = np.linalg.norm(w - np.eye(512)) / np.sqrt(512)
                row.append(f"it{it}: {err:.1e}/{werr:.1e}")
            log(f" rank={rank_frac} {str(prec):18s} " + "  ".join(row))

    # ---- B: timing variants per level ----
    log("\n=== B. WCT stage timing (batch 16, 512px shapes) ===")
    shapes = {  # level: (H, W, C)
        "relu5_1": (32, 32, 512),
        "relu4_1": (64, 64, 512),
        "relu3_1": (128, 128, 256),
        "relu2_1": (256, 256, 128),
        "relu1_1": (512, 512, 64),
    }
    B = 16
    key = jax.random.PRNGKey(0)

    for level, (h, w, c) in shapes.items():
        feats = jax.nn.relu(
            jax.random.normal(key, (B, h, w, c), jnp.bfloat16) + 0.3
        )
        stats = wct_ops.StyleStats(
            kernel=jnp.eye(c, dtype=jnp.float32) * 0.9,
            mean=jnp.zeros((c,), jnp.float32),
        )
        alpha = jnp.float32(0.6)

        def run(method):
            fn = jax.jit(
                lambda f, a: jax.vmap(
                    lambda x: wct_ops.wct_from_stats(x, stats, a, method=method)
                )(f)
            )
            return timeit(lambda f: fn(f, alpha), feats)

        meth = "eigh" if c <= 128 else "newton_schulz"
        t_cur = run("newton_schulz")
        t_eigh = run("eigh") if c <= 256 else float("nan")
        log(f"{level}: current(NS20/HIGHEST) {t_cur*1e3:7.2f} ms   "
            f"eigh {t_eigh*1e3:7.2f} ms")

    # ---- C: isolated Gram + apply operand dtype ----
    log("\n=== C. Gram + apply matmul operand dtype (relu1_1/relu2_1 shapes) ===")
    for (n, c) in ((262144, 64), (65536, 128), (16384, 256)):
        fb = jax.random.normal(key, (B, n, c), jnp.bfloat16)
        ff = fb.astype(jnp.float32)
        kern32 = jax.random.normal(key, (c, c), jnp.float32) * 0.1
        kern16 = kern32.astype(jnp.bfloat16)

        gram = jax.jit(jax.vmap(lambda f: reductions.gram0(f)))

        def gram_bf16(f):  # bf16 operands, f32 accumulate (native MXU mode)
            return jax.vmap(
                lambda x: jax.lax.dot_general(
                    jax.lax.optimization_barrier(x.T), x,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )(f)

        t_g32 = timeit(gram, ff)
        t_g16 = timeit(jax.jit(gram_bf16), fb)

        def apply32(f):
            return jax.vmap(lambda x: wct_ops._apply_kernel(x, kern32))(f)

        def apply16(f):
            return jax.vmap(
                lambda x: jax.lax.dot_general(
                    x, kern16,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )(f)

        t_a32 = timeit(jax.jit(apply32), ff)
        t_a16 = timeit(jax.jit(apply16), fb)
        log(f"N={n:7d} C={c:3d}: gram f32 {t_g32*1e3:6.2f} vs bf16 "
            f"{t_g16*1e3:6.2f} ms | apply f32/HIGH {t_a32*1e3:6.2f} vs "
            f"bf16 {t_a16*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
