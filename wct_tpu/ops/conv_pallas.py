"""Pallas TPU kernel for small-channel 3×3 reflect convs.

Why this exists (all measured on v5e, 512px batch-16 — see
scripts/profile_trace.py and DESIGN.md §3): XLA's conv emitter maps
the cascade's small-channel convs badly onto the 128×128 MXU —

- the five decoder-final ``64→3`` convs vectorize over THREE output
  channels (2.6 TFLOP/s, 5.6 ms each in-cascade);
- the eight ``64→64`` convs at 512² run with half the MXU lanes idle
  (43 TFLOP/s, ~7.2 ms each in-cascade);

together ~40 % of the whole stylization budget. No pure-XLA
reformulation wins: tap-expansion in XLA loses to fusion costs, output
-channel padding and NCHW layouts measured strictly worse
(scripts/exp_tapexpand.py, scripts/exp_out3_variants.py).

STATUS (measured, v5e): this kernel is CORRECT but LOSES to the XLA
conv emitter — 23.6 ms vs 7.1 ms in-cascade for the 64→64 case —
because 64-lane-padded NHWC blocks cap the pallas block pipeline at
~86 GB/s logical (a pure block COPY of the same array takes 12.4 ms;
see DESIGN.md §3). It is kept, unwired, as the documented baseline
for the channel-on-sublane redesign (scripts/exp_nchw_conv.py); do
not route production convs through it on TPU.

The kernel reshapes the conv into MXU-shaped matmuls, keeping every
intermediate in VMEM:

mode "fulltap" (9·C_out ≤ 128, e.g. 64→3):
    y[p, (tap,o)] = x[p] @ W[C_in, 9·C_out]      # one matmul, N=27
    out[p, o]     = Σ_tap y[p + Δ(tap), (tap,o)] # 9 VMEM shifted adds
mode "rowpack" (e.g. 64→64):
    z[p] = [x(r−1,·) | x(r,·) | x(r+1,·)]        # 3·C_in lanes
    y[p, (k,o)] = z[p] @ W[3·C_in, 3·C_out]      # K=192, N=192
    out[p, o]   = Σ_k y[p + (0,k), (k,o)]        # 3 VMEM shifted adds

Both do exactly the conv's FLOPs — tap expansion trades output-channel
width for MXU lane occupancy, not extra arithmetic.

Row halos use ghost-row BlockSpecs: the operand is passed three times —
the th-row body tile plus two single-row tiles whose index maps encode
the REFLECT rule directly (top row |r₀−1|, bottom row min(g, 2(H−1)−g))
— so HBM read amplification is (th+2)/th ≈ 1.25×, not the 3× of the
naive prev/curr/next trick, and Mosaic's pipelined block DMAs handle
all movement (manual ``memref`` DMAs reject sub-128-lane channel dims).
Column reflect pad is a VMEM concat. Tap accumulation goes through a
f32 VMEM scratch one shifted slice at a time — a single 9-term
expression made Mosaic stack-allocate every slice copy at once and
blow the 16 MB scoped-VMEM limit at W=512.

Bias + optional ReLU fuse into the epilogue (XLA cannot fuse
elementwise ops INTO a pallas_call, and a separate relu pass over a
512²×64 map would cost ~1.4 ms of HBM).

Scope: inference path only (no custom VJP — the trainer keeps XLA
convs); bf16 activations; C_in/C_out ≤ 64; H divisible by the row
tile; W a multiple of the 8-sublane tiling. ``conv2d_reflect_fused``
falls back to the XLA conv + relu for everything else, so callers can
use it unconditionally.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wct_tpu.ops.convs import conv2d_reflect

# Row-tile height. 8 divides every cascade feature height (which are
# pool-halved powers of two ≥ 8 after the input pad-to-multiple).
_TH = 8
# VMEM budget guard: body/ghost blocks (double-buffered) + y + acc.
# The scoped-vmem limit is 16 MB; the estimate below overcounts
# (Mosaic reuses the y buffer for slice temps), so allow up to it.
_VMEM_LIMIT = 16 * 1024 * 1024


def _kernel(xt_ref, xb_ref, xg_ref, w_ref, b_ref, out_ref, acc_ref, *,
            mode, th, W, cout, relu):
    x = jnp.concatenate([xt_ref[0], xb_ref[0], xg_ref[0]], axis=0)
    # Column reflect pad in VMEM: ghost col −1 = col 1, col W = col W−2.
    xp = jnp.concatenate([x[:, 1:2], x, x[:, W - 2:W - 1]], axis=1)

    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if mode == "fulltap":
        y = dot(xp, w_ref[:])  # [th+2, W+2, 9*cout] f32
        acc_ref[:] = y[0:th, 0:W, 0:cout]
        for dy in range(3):
            for dx in range(3):
                if dy == 0 and dx == 0:
                    continue
                tap = dy * 3 + dx
                acc_ref[:] += y[dy:dy + th, dx:dx + W,
                                tap * cout:(tap + 1) * cout]
    else:  # rowpack
        z = jnp.concatenate([xp[0:th], xp[1:th + 1], xp[2:th + 2]],
                            axis=-1)  # [th, W+2, 3*cin]
        y = dot(z, w_ref[:])  # [th, W+2, 3*cout] f32
        acc_ref[:] = y[:, 0:W, 0:cout]
        for k in range(1, 3):
            acc_ref[:] += y[:, k:k + W, k * cout:(k + 1) * cout]

    out = acc_ref[:] + b_ref[:][None, None, :]
    if relu:
        out = jnp.maximum(out, 0.0)
    out_ref[0] = out.astype(out_ref.dtype)


def _eligible(x: jax.Array, w: jax.Array) -> bool:
    if w.ndim != 4 or w.shape[0] != 3 or w.shape[1] != 3:
        return False
    if x.dtype != jnp.bfloat16:
        return False
    _, h, wd, cin = x.shape
    cout = w.shape[3]
    # W is the second-to-minor dim of the block DMAs; Mosaic wants it
    # aligned to the 8-sublane tiling.
    if cin > 64 or cout > 64 or h < _TH or h % _TH or wd < 8 or wd % 8:
        return False
    lane = 128

    def pad(c: int) -> int:
        return -(-c // lane) * lane

    fulltap = 9 * cout <= lane
    n_cols = 9 * cout if fulltap else 3 * cout
    vmem = (
        2 * (_TH + 2) * wd * pad(cin) * 2            # blocks, 2-buffered
        + (_TH + 2) * (wd + 2) * pad(n_cols) * 4     # y (f32)
        + (0 if fulltap else _TH * (wd + 2) * pad(3 * cin) * 2)  # z
        + 2 * _TH * wd * pad(cout) * 4               # acc + slice temp
        + 2 * _TH * wd * pad(cout) * 2               # out, 2-buffered
    )
    return vmem <= _VMEM_LIMIT


def conv3x3_reflect_pallas(
    x: jax.Array, w: jax.Array, b: jax.Array, relu: bool
) -> jax.Array:
    """The Pallas path; caller must have checked ``_eligible``."""
    B, H, W, cin = x.shape
    cout = w.shape[3]
    if 9 * cout <= 128:
        mode = "fulltap"
        # [3,3,cin,cout] → [cin, 9·cout], tap-major columns
        wmat = jnp.transpose(w, (2, 0, 1, 3)).reshape(cin, 9 * cout)
    else:
        mode = "rowpack"
        # [3,3,cin,cout] → [(row,cin), (col,cout)]
        wmat = jnp.transpose(w, (0, 2, 1, 3)).reshape(3 * cin, 3 * cout)
    wmat = wmat.astype(x.dtype)
    b32 = b.astype(jnp.float32)
    th = _TH

    kern = functools.partial(
        _kernel, mode=mode, th=th, W=W, cout=cout, relu=relu
    )

    # Ghost-row reflect indices, in units of 1-row blocks:
    #   top ghost  = |r₀ − 1|          (row 1 when r₀ = 0)
    #   bottom     = min(g, 2(H−1)−g)  (row H−2 when g = H)
    def top_map(bi, rt):
        return (bi, jnp.abs(rt * th - 1), 0, 0)

    def bot_map(bi, rt):
        g = rt * th + th
        return (bi, jnp.minimum(g, 2 * (H - 1) - g), 0, 0)

    specs = [
        pl.BlockSpec((1, 1, W, cin), top_map),
        pl.BlockSpec((1, th, W, cin), lambda bi, rt: (bi, rt, 0, 0)),
        pl.BlockSpec((1, 1, W, cin), bot_map),
        pl.BlockSpec(wmat.shape, lambda bi, rt: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(b32.shape, lambda bi, rt: (0,),
                     memory_space=pltpu.VMEM),
    ]
    # Interpreter mode keeps the full test suite CPU-runnable.
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        kern,
        grid=(B, H // th),
        in_specs=specs,
        out_specs=pl.BlockSpec(
            (1, th, W, cout), lambda bi, rt: (bi, rt, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((th, W, cout), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * 9 * cin * cout,
            bytes_accessed=B * H * W * (cin + cout) * 2,
            transcendentals=0,
        ),
    )(x, x, x, wmat, b32)


def conv2d_reflect_fused(
    x: jax.Array, w: jax.Array, b: jax.Array, relu: bool = False,
    impl: str = "xla",
) -> jax.Array:
    """Reflect conv + bias (+ relu), dispatching to the Pallas kernel.

    ``impl='pallas_small'`` routes eligible 3×3 small-channel bf16
    convs through ``conv3x3_reflect_pallas``; everything else (and
    ``impl='xla'``) uses the stock XLA conv. Semantics match
    ``convs.conv2d_reflect`` followed by an optional ReLU; only the
    f32-accumulation ORDER differs on the Pallas path (tap-major
    instead of the conv emitter's order), a ULP-level effect.
    """
    if impl == "pallas_small" and _eligible(x, w):
        return conv3x3_reflect_pallas(x, w, b, relu)
    out = conv2d_reflect(x, w, b)
    return jax.nn.relu(out) if relu else out
