"""Tap-expansion for tiny-output-channel convs (the 64->3 decoders).

XLA's conv emitter vectorizes the 64->3 final decoder conv over 3
output channels (2.6 TFLOP/s measured in-cascade; 5x5.6 ms/batch).
Tap expansion reshapes the work for the MXU:

    y[q, (tap, o)] = x[q] @ W[tap][:, o]        # [pixels, 64] @ [64, 27]
    out[p, o]      = sum_tap y[p + delta(tap), (tap, o)]

One 27-column matmul (21% MXU lanes — 8x better than 3) plus 9
shifted adds where every y element is read exactly once.

Run: python -m scripts.exp_tapexpand
"""

from __future__ import annotations

import sys
import time

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
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    out = jax.lax.conv_general_dilated(
        xp, w.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out + b.astype(out.dtype)


def conv_tapexpand(x, w, b):
    """3x3 conv via one [*, Cin] @ [Cin, 9*Cout] matmul + 9 shifted adds."""
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    # W: [3, 3, cin, cout] -> [cin, 9*cout], tap-major columns
    wmat = jnp.transpose(w, (2, 0, 1, 3)).reshape(cin, 9 * cout).astype(x.dtype)
    y = jax.lax.dot_general(
        xp, wmat,
        dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [n, h+2, w+2, 9*cout] f32
    acc = None
    for dy in range(3):
        for dx in range(3):
            tap = dy * 3 + dx
            sl = jax.lax.dynamic_slice(
                y, (0, dy, dx, tap * cout), (n, h, wd, cout)
            )
            acc = sl if acc is None else acc + sl
    return acc + b.astype(acc.dtype)


def conv_tapexpand_bf16y(x, w, b):
    """Same but keep y in bf16 (halves the intermediate traffic)."""
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    wmat = jnp.transpose(w, (2, 0, 1, 3)).reshape(cin, 9 * cout).astype(x.dtype)
    y = jax.lax.dot_general(
        xp, wmat,
        dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    acc = None
    for dy in range(3):
        for dx in range(3):
            tap = dy * 3 + dx
            sl = jax.lax.dynamic_slice(
                y, (0, dy, dx, tap * cout), (n, h, wd, cout)
            ).astype(jnp.float32)
            acc = sl if acc is None else acc + sl
    return acc + b.astype(acc.dtype)


def main():
    enable_compile_cache()
    log(f"device: {jax.devices()[0].device_kind}")
    key = jax.random.PRNGKey(0)
    B, H, W = 16, 512, 512

    for cin, cout, label in ((64, 3, "64->3"),):
        x = jax.random.uniform(key, (B, H, W, cin), jnp.bfloat16)
        w = (jax.random.normal(key, (3, 3, cin, cout), jnp.float32) * 0.05)
        b = jnp.zeros((cout,), jnp.float32)

        ref = jax.jit(conv_xla)(x, w, b)
        for name, fn in (
            ("A baseline", conv_xla),
            ("T tapexpand-f32y", conv_tapexpand),
            ("T tapexpand-bf16y", conv_tapexpand_bf16y),
        ):
            j = jax.jit(fn)
            err = float(jnp.max(jnp.abs(
                j(x, w, b).astype(jnp.float32) - ref.astype(jnp.float32))))
            t = timeit(j, x, w, b)
            log(f"{label}  {name}: {t*1e3:7.2f} ms   max dev {err:.2e}")


if __name__ == "__main__":
    main()
