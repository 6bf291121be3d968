"""Experiment: image-paired (block-diagonal) convs for the 64-ch tier.

XLA's conv emitter runs the cascade's 64-channel 512px convs at ~43
TFLOP/s (half the MXU lanes idle) on 2x lane-padded NHWC arrays.
Packing IMAGE PAIRS channel-wise ([2B',H,W,64] -> [B',H,W,128]) with
block-diagonal weights doubles the FLOPs but fills all 128 lanes and
removes the padding: this measures whether the trade wins, per conv
shape, isolated.

Run: python -m scripts.exp_paired_conv
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from wct_tpu.cli.common import enable_compile_cache
from wct_tpu.utils.profiling import device_sync, timeit_min as timeit

log = lambda *a: print(*a, file=sys.stderr, flush=True)




def conv(x, w, relu=True):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    out = jax.lax.conv_general_dilated(
        xp, w, (1, 1), "VALid".upper(),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.relu(out) if relu else out


def blockdiag(w, k):
    """[3,3,ci,co] -> [3,3,k*ci,k*co] block-diagonal."""
    ci, co = w.shape[2], w.shape[3]
    out = np.zeros((3, 3, k * ci, k * co), w.dtype)
    for i in range(k):
        out[:, :, i * ci : (i + 1) * ci, i * co : (i + 1) * co] = w
    return jnp.asarray(out)


def main():
    enable_compile_cache()
    log(f"device: {jax.devices()[0].device_kind}")
    rng = np.random.default_rng(0)
    B, H, W = 16, 512, 512

    cases = [  # (name, ci, co, relu)
        ("enc conv1_1  3->64", 3, 64, True),
        ("enc conv1_2 64->64", 64, 64, True),
        ("dec final   64->3", 64, 3, False),
    ]
    for name, ci, co, relu in cases:
        x = jnp.asarray(rng.standard_normal((B, H, W, ci)), jnp.bfloat16)
        w = (rng.standard_normal((3, 3, ci, co)) * 0.1).astype(np.float32)
        wj = jnp.asarray(w, jnp.bfloat16)
        t0 = timeit(jax.jit(lambda x, w: conv(x, w, relu)), x, wj)
        line = f"{name}: base {t0:6.2f} ms"
        for k in (2, 4):
            xk = jnp.asarray(
                np.concatenate(
                    [np.asarray(x[i::k]) for i in range(k)], axis=-1
                ),
                jnp.bfloat16,
            )
            wk = blockdiag(w, k).astype(jnp.bfloat16)
            tk = timeit(jax.jit(lambda x, w: conv(x, w, relu)), xk, wk)
            line += f" | pack{k} {tk:6.2f} ms"
        log(line)

    # pack/unpack conversion cost (transpose-concat), measured once
    x = jnp.asarray(rng.standard_normal((B, H, W, 64)), jnp.bfloat16)
    pack2 = jax.jit(
        lambda x: jnp.concatenate([x[0::2], x[1::2]], axis=-1)
    )
    t = timeit(pack2, x)
    log(f"pack2 reshuffle [16,512,512,64]->[8,...,128]: {t:6.2f} ms")


if __name__ == "__main__":
    main()
