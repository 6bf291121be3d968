"""Pallas TPU kernel: mean + centered channel Gram in two HBM passes.

The WCT whitening path needs ``mean(x)`` and ``(x−μ)ᵀ(x−μ)`` for the
per-image feature matrix ``x: [N, C]`` (N = H·W up to 262 144 at
relu1_1/512px). Two problems with the XLA formulation, both measured
on v5e (see ops/reductions.py):

1. **Batch-shape determinism** — XLA re-tiles plain reductions and
   non-canonical contractions per compiled batch shape; the canonical-
   matmul workaround needs an ``optimization_barrier`` that
   materializes ``(x−μ)ᵀ`` — 64 MB at relu1_1 — costing ~3 fps of the
   512px headline.
2. **HBM traffic** — the barrier form moves ~4 feature-map passes
   (read for mean, read + transpose write + transpose read + matmul
   read).

This kernel owns its tiling, so its accumulation order is a function
of the block shapes alone — bitwise identical under any surrounding
program (``vmap`` lifts the batch onto the sequential Pallas grid
without touching the body; measured: zero bit diffs batch 1 vs 3).
HBM traffic is exactly two reads of ``x`` (grid phase 0: masked
column sums → mean; phase 1: masked centered tile → ``accᵀacc``
accumulated MXU-side in a VMEM scratch).

**Measured outcome (v5e, batch-8, N=262144, C=64 — the relu1_1/512px
hot shape): 8.6 ms vs 6.6 ms for the XLA canonical-matmul+barrier
form in ops/reductions.py.** XLA's fused mean+gram schedule beats the
kernel's strict two-pass structure, so the XLA form stays the
production path in ``ops.wct._gram`` and this kernel is kept as the
construction-deterministic alternative (useful if a future
XLA/Mosaic release changes the empirically-measured stability of the
barrier form) and as the reference implementation. The ``interpret``
flag lets CPU tests exercise the kernel logic.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Budget ~1 MB per input tile (double-buffered by the pipeline, plus
# scratch/outputs — keep well under the 16 MB VMEM scoped limit).
# VMEM pads the lane dim to 128, so narrow channel counts are budgeted
# at their PADDED width.
_TILE_BYTES = 1024 * 1024
_MIN_TILE_N = 256


def _tile_n(n: int, c: int) -> int:
    tn = max(_MIN_TILE_N, _TILE_BYTES // (4 * max(c, 128)))
    tn = (tn // 8) * 8
    return min(tn, max(8, ((n + 7) // 8) * 8))


def _gram_kernel(x_ref, mean_ref, cov_ref, sum_scr, acc_scr, *, n, tn):
    """Grid (2, T): phase 0 accumulates column sums, phase 1 the
    centered Gram. Rows ≥ n (the final tile's padding) are masked to
    zero in both phases."""
    phase = pl.program_id(0)
    t = pl.program_id(1)
    last_t = pl.num_programs(1) - 1

    tile = x_ref[:].astype(jnp.float32)  # [TN, C]
    rows = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 0) + t * tn
    mask = rows < n
    tile = jnp.where(mask, tile, 0.0)

    @pl.when((phase == 0) & (t == 0))
    def _():
        sum_scr[:] = jnp.zeros_like(sum_scr)

    @pl.when(phase == 0)
    def _():
        sum_scr[0:1, :] = sum_scr[0:1, :] + jnp.sum(
            tile, axis=0, keepdims=True
        )

    @pl.when((phase == 0) & (t == last_t))
    def _():
        mean_ref[:] = jnp.broadcast_to(
            sum_scr[0:1, :] / n, mean_ref.shape
        )

    @pl.when((phase == 1) & (t == 0))
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(phase == 1)
    def _():
        mu = mean_ref[0:1, :]
        centered = jnp.where(mask, tile - mu, 0.0)
        acc_scr[:] = acc_scr[:] + jax.lax.dot_general(
            centered, centered,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    @pl.when((phase == 1) & (t == last_t))
    def _():
        cov_ref[:] = acc_scr[:]


@partial(jax.jit, static_argnames=("interpret",))
def centered_gram(
    x: jax.Array, interpret: bool | None = None
) -> tuple[jax.Array, jax.Array]:
    """``(Σ(x−μ)(x−μ)ᵀ-style [C, C] Gram, mean [C])`` for ``x [N, C]``.

    Returns the UN-normalized centered Gram (caller divides by N−1,
    matching reference ops.py:~80 semantics in ``ops.wct._gram``).
    """
    n, c = x.shape
    tn = _tile_n(n, c)
    grid_t = pl.cdiv(n, tn)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    mean8, cov = pl.pallas_call(
        partial(_gram_kernel, n=n, tn=tn),
        grid=(2, grid_t),
        in_specs=[
            pl.BlockSpec((tn, c), lambda p, t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((8, c), lambda p, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda p, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8, c), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, c), jnp.float32),
            pltpu.VMEM((c, c), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * c * c + 2 * n * c,
            bytes_accessed=2 * n * c * 4 + c * c * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x)
    return cov, mean8[0]
