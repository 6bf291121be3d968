"""Spike: 3x3 reflect conv64->64 with NCHW-internal Pallas compute.

Go/no-go probe for the fused level-1-tier "junction" kernel. Measured
facts driving it (DESIGN.md section 3, session 2):

- [*,*,*,64] bf16 NHWC arrays are lane-padded 64->128; pallas block
  pipelines on such blocks cap at ~86 GB/s logical. Kernels in that
  form lose to XLA's conv emitter outright.
- NCHW [B,64,H,W] blocks (minor dims H,W) have no padding and copy at
  ~220 GB/s logical through pallas - the same rate XLA achieves.

This kernel therefore computes in channel-on-sublane form: the matmul
is  w[64, 576] @ z[576, pixels]  with pixels on LANES, where z stacks
the 9 taps (dy,dx) x cin on the contraction dim. The open question this
spike answers is the VMEM marshalling cost of building z (tap slices
are sublane/lane shifts) and of the 3-D dot contraction - Mosaic
relayout costs have measured far above naive estimates before
(ops/conv_pallas.py: predicted ~3 ms, measured 28 ms).

Decision rule: standalone time <= ~6 ms at [16,64,512,512] (XLA
in-cascade fusion: 7.1 ms; pallas NCHW copy floor: ~4.9 ms) => the
junction kernel is viable; >> that => abandon pallas convs this round.

Run: python -m scripts.exp_nchw_conv            (TPU timing)
     pytest-style correctness lives in tests/ (interpret mode, CPU).
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

log = lambda *a: print(*a, file=sys.stderr, flush=True)

_TH = 16  # rows per tile; VMEM plan sized for W=512, C=64
_SC = 4   # rows per matmul sub-chunk inside a tile


def _kernel(xt_ref, xb_ref, xg_ref, w_ref, b_ref, out_ref, *, th, W, relu):
    # x: [64, th+2, W] with reflect ghost rows resolved by the index maps
    x = jnp.concatenate([xt_ref[0], xb_ref[0], xg_ref[0]], axis=1)
    # reflect ghost columns in VMEM
    xp = jnp.concatenate([x[:, :, 1:2], x, x[:, :, W - 2 : W - 1]], axis=2)
    cin = xp.shape[0]

    for s in range(th // _SC):
        r0 = s * _SC
        # z: [(dy,dx,ci) = 576, _SC, W] tap stack; dim 0 is untiled so
        # the 9-way concat is layout-free, the slices are sublane (dy)
        # and lane (dx) shifts.
        taps = []
        for dy in range(3):
            for dx in range(3):
                taps.append(xp[:, r0 + dy : r0 + dy + _SC, dx : dx + W])
        z = jnp.concatenate(taps, axis=0)  # [9*cin, _SC, W]
        y = jax.lax.dot_general(
            w_ref[:], z,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [cout, _SC, W]
        y = y + b_ref[:][:, None, None]
        if relu:
            y = jnp.maximum(y, 0.0)
        out_ref[0, :, r0 : r0 + _SC] = y.astype(out_ref.dtype)


def conv3x3_reflect_nchw(
    x: jax.Array, w: jax.Array, b: jax.Array, relu: bool = True
) -> jax.Array:
    """x [B, Ci, H, W] bf16, w [3, 3, Ci, Co] (HWIO), b [Co] -> [B, Co, H, W].

    H % _TH == 0, W % 128 == 0 required (cascade tier shapes satisfy both).
    """
    B, cin, H, W = x.shape
    cout = w.shape[3]
    # [3,3,ci,co] -> [co, (dy,dx,ci)] matching z's tap stacking order
    wmat = jnp.transpose(w, (3, 0, 1, 2)).reshape(cout, 9 * cin)
    wmat = wmat.astype(x.dtype)
    b32 = b.astype(jnp.float32)
    th = _TH

    def top_map(bi, rt):
        return (bi, 0, jnp.abs(rt * th - 1), 0)

    def bot_map(bi, rt):
        g = rt * th + th
        return (bi, 0, jnp.minimum(g, 2 * (H - 1) - g), 0)

    kern = functools.partial(_kernel, th=th, W=W, relu=relu)
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        kern,
        grid=(B, H // th),
        in_specs=[
            pl.BlockSpec((1, cin, 1, W), top_map),
            pl.BlockSpec((1, cin, th, W), lambda bi, rt: (bi, 0, rt, 0)),
            pl.BlockSpec((1, cin, 1, W), bot_map),
            pl.BlockSpec(wmat.shape, lambda bi, rt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b32.shape, lambda bi, rt: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, cout, th, W), lambda bi, rt: (bi, 0, rt, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((B, cout, H, W), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * 9 * cin * cout,
            bytes_accessed=B * H * W * (cin + cout) * 2,
            transcendentals=0,
        ),
    )(x, x, x, wmat, b32)


def _kernel_nhwc_io(xt_ref, xb_ref, xg_ref, w_ref, b_ref, out_ref, *,
                    th, W, relu):
    """Same compute core, but NHWC HBM blocks with in-kernel transposes.

    This is the junction-kernel-realistic path: cascade tensors are
    NHWC in HBM; the kernel transposes each block to channel-on-sublane
    form, computes, and transposes back. Measures BOTH the padded-DMA
    cost and the VMEM transpose cost in one number.
    """
    xh = jnp.concatenate([xt_ref[0], xb_ref[0], xg_ref[0]], axis=0)
    x = jnp.transpose(xh, (2, 0, 1))  # [cin, th+2, W]
    xp = jnp.concatenate([x[:, :, 1:2], x, x[:, :, W - 2 : W - 1]], axis=2)
    cin = xp.shape[0]
    cout = w_ref.shape[0]

    for s in range(th // _SC):
        r0 = s * _SC
        taps = []
        for dy in range(3):
            for dx in range(3):
                taps.append(xp[:, r0 + dy : r0 + dy + _SC, dx : dx + W])
        z = jnp.concatenate(taps, axis=0)
        y = jax.lax.dot_general(
            w_ref[:], z,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = y + b_ref[:][:, None, None]
        if relu:
            y = jnp.maximum(y, 0.0)
        out_ref[0, r0 : r0 + _SC] = jnp.transpose(y, (1, 2, 0)).astype(
            out_ref.dtype
        )


def conv3x3_reflect_nhwc_io(
    x: jax.Array, w: jax.Array, b: jax.Array, relu: bool = True
) -> jax.Array:
    """NHWC in/out, channel-sublane compute inside. x [B, H, W, Ci]."""
    B, H, W, cin = x.shape
    cout = w.shape[3]
    wmat = jnp.transpose(w, (3, 0, 1, 2)).reshape(cout, 9 * cin)
    wmat = wmat.astype(x.dtype)
    b32 = b.astype(jnp.float32)
    th = _TH

    def top_map(bi, rt):
        return (bi, jnp.abs(rt * th - 1), 0, 0)

    def bot_map(bi, rt):
        g = rt * th + th
        return (bi, jnp.minimum(g, 2 * (H - 1) - g), 0, 0)

    kern = functools.partial(_kernel_nhwc_io, th=th, W=W, relu=relu)
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        kern,
        grid=(B, H // th),
        in_specs=[
            pl.BlockSpec((1, 1, W, cin), top_map),
            pl.BlockSpec((1, th, W, cin), lambda bi, rt: (bi, rt, 0, 0)),
            pl.BlockSpec((1, 1, W, cin), bot_map),
            pl.BlockSpec(wmat.shape, lambda bi, rt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b32.shape, lambda bi, rt: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, W, cout), lambda bi, rt: (bi, rt, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, cout), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * 9 * cin * cout,
            bytes_accessed=B * H * W * (cin + cout) * 2,
            transcendentals=0,
        ),
    )(x, x, x, wmat, b32)


def main():
    from wct_tpu.cli.common import enable_compile_cache
    from wct_tpu.ops.convs import conv2d_reflect
    from wct_tpu.utils.profiling import device_sync, timeit_min as timeit

    enable_compile_cache()
    log(f"device: {jax.devices()[0].device_kind}")


    rng = np.random.default_rng(0)
    B, C, H, W = 16, 64, 512, 512
    xn = jnp.asarray(rng.standard_normal((B, C, H, W)), jnp.bfloat16)
    xh = jnp.transpose(xn, (0, 2, 3, 1))
    w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.bfloat16)
    b = jnp.zeros((C,), jnp.float32)

    f_x = jax.jit(lambda x, w, b: jax.nn.relu(conv2d_reflect(x, w, b)))
    log(f"XLA NHWC conv+relu:   {timeit(f_x, xh, w, b):6.2f} ms")

    f_p = jax.jit(lambda x, w, b: conv3x3_reflect_nchw(x, w, b, True))
    log(f"pallas NCHW conv+relu:{timeit(f_p, xn, w, b):6.2f} ms")

    f_h = jax.jit(lambda x, w, b: conv3x3_reflect_nhwc_io(x, w, b, True))
    log(f"pallas NHWC-io conv+relu:{timeit(f_h, xh, w, b):6.2f} ms")

    # correctness spot check (small slice readback only)
    ref = f_x(xh, w, b)
    got = f_p(xn, w, b)
    d = jnp.max(jnp.abs(
        got[0, :, :8, :8].astype(jnp.float32)
        - jnp.transpose(ref[0, :8, :8, :], (2, 0, 1)).astype(jnp.float32)
    ))
    log(f"max dev (8x8 slice): {float(d):.3e}")


if __name__ == "__main__":
    main()
