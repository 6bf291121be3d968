"""Experiments: the RGB boundary convs (3->64 first / 64->3 last).

Per-stage profiling showed these two convs run at ~1 TFLOP/s on XLA
(13.5 / 14.6 ms at 512px batch-16) because their im2col shapes
(K=27 or N=3) map terribly onto the 128x128 MXU — and one of each
appears in EVERY cascade level's encode/decode.

Variants measured here (pure XLA first; Pallas only if XLA can't win):
  A. baseline lax.conv_general_dilated (what convs.py does today)
  B. 9-shift decomposition: out = sum_dxdy shift(x) @ W[dy,dx]
  C. im2col matmul [N*H*W, 27] @ [27, 64]
  D. input channel padding 3->8 (zero weights), conv as usual
  E. for 64->3: output channel padding 3->64, slice after

Run: python -m scripts.exp_boundary_conv
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from wct_tpu.cli.common import enable_compile_cache
from wct_tpu.utils.profiling import device_sync

log = lambda *a: print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, iters=8):
    out = fn(*args)
    device_sync(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    device_sync(outs[-1])
    return (time.perf_counter() - t0) / iters


def conv_xla(x, w, b):
    """Baseline: NHWC conv, VALID after manual reflect pad."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    out = jax.lax.conv_general_dilated(
        xp, w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return jax.nn.relu(out + b).astype(x.dtype)


def conv_shift9(x, w, b):
    """9 pointwise matmuls on shifted views; single f32 accumulator."""
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    acc = jnp.zeros((n, h, wd, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = jax.lax.dynamic_slice(
                xp, (0, dy, dx, 0), (n, h, wd, cin)
            )
            acc = acc + jax.lax.dot_general(
                patch, w[dy, dx],
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    return jax.nn.relu(acc + b).astype(x.dtype)


def conv_im2col(x, w, b):
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    pat = jax.lax.conv_general_dilated_patches(
        xp, (3, 3), (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )  # [N, H, W, 9*cin] (channel-major: cin*9? — parity checked below)
    wmat = jnp.transpose(w, (2, 0, 1, 3)).reshape(cin * 9, cout).astype(x.dtype)
    out = jax.lax.dot_general(
        pat.reshape(n * h * wd, cin * 9), wmat,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(n, h, wd, cout)
    return jax.nn.relu(out + b).astype(x.dtype)


def conv_inpad(x, w, b, pad_to=8):
    n, h, wd, cin = x.shape
    x8 = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad_to - cin)))
    w8 = jnp.pad(w, ((0, 0), (0, 0), (0, pad_to - cin), (0, 0)))
    return conv_xla(x8, w8, b)


def conv_outpad(x, w, b, pad_to=64):
    cout = w.shape[-1]
    w64 = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, pad_to - cout)))
    b64 = jnp.pad(b, ((0, pad_to - cout),))
    return conv_xla(x, w64, b64)[..., :cout]


def main():
    enable_compile_cache()
    log(f"device: {jax.devices()[0].device_kind}")
    key = jax.random.PRNGKey(0)
    B, H, W = 16, 512, 512

    # ---- first conv: 3 -> 64 ----
    x = jax.random.uniform(key, (B, H, W, 3), jnp.bfloat16)
    w = (jax.random.normal(key, (3, 3, 3, 64), jnp.float32) * 0.1).astype(jnp.bfloat16)
    b = jnp.zeros((64,), jnp.float32)

    ref = conv_xla(x, w, b)
    for name, fn in (
        ("A baseline conv", conv_xla),
        ("B shift9", conv_shift9),
        ("C im2col", conv_im2col),
        ("D inpad8", conv_inpad),
    ):
        j = jax.jit(fn)
        # on-device deviation; scalar readback only (tunnel D2H ~27 MB/s)
        err = float(jnp.max(jnp.abs(j(x, w, b).astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        t = timeit(j, x, w, b)
        log(f"3->64  {name}: {t*1e3:7.2f} ms   max dev vs baseline {err:.2e}")

    # ---- last conv: 64 -> 3 (no relu in the real decoder; keep relu
    # here anyway — timing-neutral, keeps variants comparable) ----
    x2 = jax.random.uniform(key, (B, H, W, 64), jnp.bfloat16)
    w2 = (jax.random.normal(key, (3, 3, 64, 3), jnp.float32) * 0.05).astype(jnp.bfloat16)
    b2 = jnp.zeros((3,), jnp.float32)

    ref2 = conv_xla(x2, w2, b2)
    for name, fn in (
        ("A baseline conv", conv_xla),
        ("B shift9", conv_shift9),
        ("C im2col", conv_im2col),
        ("E outpad64", conv_outpad),
    ):
        j = jax.jit(fn)
        err = float(jnp.max(jnp.abs(j(x2, w2, b2).astype(jnp.float32)
                                    - ref2.astype(jnp.float32))))
        t = timeit(j, x2, w2, b2)
        log(f"64->3  {name}: {t*1e3:7.2f} ms   max dev vs baseline {err:.2e}")

    # ---- mid conv for reference: 64 -> 64 ----
    w3 = (jax.random.normal(key, (3, 3, 64, 64), jnp.float32) * 0.05).astype(jnp.bfloat16)
    b3 = jnp.zeros((64,), jnp.float32)
    for name, fn in (
        ("A baseline conv", conv_xla),
        ("B shift9", conv_shift9),
    ):
        j = jax.jit(fn)
        t = timeit(j, x2, w3, b3)
        log(f"64->64 {name}: {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
