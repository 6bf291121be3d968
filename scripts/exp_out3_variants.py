"""More 64->3 conv variants: small out-channel padding and NCHW layout.

In-cascade baseline is 5.6 ms (trace); isolated baseline 13.3 ms. A
variant must beat ~5 ms isolated to be worth wiring into the decoder.

Run: python -m scripts.exp_out3_variants
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

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


def make_outpad(pad_to):
    def f(x, w, b):
        cout = w.shape[-1]
        wp = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, pad_to - cout)))
        bp = jnp.pad(b, ((0, pad_to - cout),))
        return conv_xla(x, wp, bp)[..., :cout]
    return f


def conv_nchw(x, w, b):
    """Channels-first conv: output [N, 3, H, W] vectorizes over W."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    xt = jnp.transpose(xp, (0, 3, 1, 2))  # NCHW
    out = jax.lax.conv_general_dilated(
        xt, w.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    out = out + b.astype(out.dtype)[None, :, None, None]
    return jnp.transpose(out, (0, 2, 3, 1))


def main():
    enable_compile_cache()
    log(f"device: {jax.devices()[0].device_kind}")
    key = jax.random.PRNGKey(0)
    B, H, W = 16, 512, 512
    x = jax.random.uniform(key, (B, H, W, 64), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, 64, 3), jnp.float32) * 0.05
    b = jnp.zeros((3,), jnp.float32)

    ref = jax.jit(conv_xla)(x, w, b)
    cases = [
        ("A baseline", conv_xla),
        ("P outpad8", make_outpad(8)),
        ("P outpad16", make_outpad(16)),
        ("P outpad32", make_outpad(32)),
        ("L nchw", conv_nchw),
    ]
    for name, fn in cases:
        j = jax.jit(fn)
        err = float(jnp.max(jnp.abs(
            j(x, w, b).astype(jnp.float32) - ref.astype(jnp.float32))))
        t = timeit(j, x, w, b)
        log(f"64->3  {name}: {t*1e3:7.2f} ms   max dev {err:.2e}")

    # NCHW with pre-transposed input (conv cost only)
    xt = jnp.asarray(jnp.transpose(
        jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect"),
        (0, 3, 1, 2)))

    def conv_nchw_pre(xt, w, b):
        out = jax.lax.conv_general_dilated(
            xt, w.astype(xt.dtype), (1, 1), "VALID",
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
            precision=jax.lax.Precision.HIGHEST,
        )
        return out + b.astype(out.dtype)[None, :, None, None]

    j = jax.jit(conv_nchw_pre)
    t = timeit(j, xt, w, b)
    log(f"64->3  L nchw-pretransposed (conv only): {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
