"""Newton–Schulz matrix square root — the eigh alternative for WCT.

The reference computes cov^{±1/2} via ``tf.svd`` (ops.py:~90, often
CPU-placed in TF1 — the host round-trip the rebuild eliminates). On
TPU there are two good on-device options:

1. ``jax.lax.linalg.eigh`` — one XLA op, exact, but QR-iteration-based
   and latency-bound for small matrices.
2. The coupled Newton–Schulz iteration below — nothing but C×C matmuls,
   which is exactly what the MXU is built for, with a FIXED iteration
   count (no data-dependent control flow, so it jits and pipelines).

    A ← A / ‖A‖_∞            (spectrum in (0, 1]: convergent region)
    Y₀ = A, Z₀ = I
    T  = ½(3I − Z Y);  Y ← Y T;  Z ← T Z
    Y_k → A^{1/2},  Z_k → A^{−1/2}

(‖A‖_∞ = max abs row sum ≥ λ_max for symmetric A, and is a much
tighter bound than ‖A‖_F for large C — the smallest normalized
eigenvalue lands higher, so convergence needs fewer iterations.)

One run yields BOTH the whitening (cov^{−1/2}) and coloring
(cov^{+1/2}) kernels. Two variants: pure XLA (runs anywhere, used in
CPU tests) and a Pallas TPU kernel that keeps the whole iteration
resident in VMEM (one HBM read of A, one write of each output — the
iteration itself never touches HBM).

Which to use: the PURE-XLA path is the production default
(``method='newton_schulz'``) — under ``vmap`` XLA turns the per-image
iterations into batched C×C matmuls that saturate the MXU, which the
per-program Pallas grid cannot match (measured: 3.5 ms vs ~31 ms for
8×512² on v5e). The Pallas kernel is kept as the single-matrix
minimal-HBM-traffic variant and as the reference implementation of the
iteration as an on-chip kernel.

Numerical note: NS is an approximation whose convergence degrades for
eigenvalues ≪ ‖A‖_F; ``reg`` floors the spectrum (relative to the mean
diagonal) and plays the role of the reference's 1e-5 rank truncation.
``eigh`` remains the fidelity-oracle path; NS is the throughput path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wct_tpu.ops import reductions

# Measured convergence on v5e (C=512 Grams of correlated relu features,
# full- and half-rank, reg=1e-5 floor): the coupled iteration is fully
# converged at 12 iterations (rel err 7e-6 HIGHEST / 5e-5 HIGH) and NOT
# at 10 (1.6e-3) — the growth phase for floor-level eigenvalues
# (~1e-5/C normalized) needs ~11 steps. 14 = converged + 2 margin; the
# old 20 was 40% wasted MXU time (scripts/exp_wct_fast.py).
DEFAULT_ITERS = 14
DEFAULT_REG = 1e-5
# f32 min tile is (8, 128); keep the lane dim a multiple of 128 so the
# Pallas kernel maps cleanly onto MXU tiles.
_LANE = 128


def _ns_iterations(
    a_norm: jax.Array,
    num_iters: int,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> tuple[jax.Array, jax.Array]:
    """Run the coupled iteration on a pre-normalized matrix.

    The C×C matmuls must NOT run at TPU default precision: single-pass
    bf16 multiplies plateau the iteration at ~2% error (measured).
    Measured convergence at C=512 (scripts/exp_wct_fast.py):
    HIGHEST (6-pass) reaches 7e-6, HIGH (3-pass bf16) reaches 5e-5 at
    half the MXU passes — HIGH is the throughput choice
    (method='newton_schulz_fast'), HIGHEST the default.
    """
    c = a_norm.shape[-1]
    eye = jnp.eye(c, dtype=a_norm.dtype)
    dot = partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )

    def body(_, yz):
        y, z = yz
        t = 1.5 * eye - 0.5 * dot(z, y)
        return dot(y, t), dot(t, z)

    return jax.lax.fori_loop(0, num_iters, body, (a_norm, eye))


def newton_schulz_sqrtm(
    cov: jax.Array,
    num_iters: int = DEFAULT_ITERS,
    reg: float = DEFAULT_REG,
    use_pallas: bool = False,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> tuple[jax.Array, jax.Array]:
    """(cov^{1/2}, cov^{−1/2}) for a symmetric PSD ``cov: [C, C]``.

    ``reg`` adds ``reg · mean(diag)`` to the diagonal before iterating —
    the spectrum floor that substitutes for the reference's 1e-5
    eigenvalue truncation. ``precision`` sets the iteration matmul
    passes (see ``_ns_iterations``; ignored by the Pallas variant,
    which is always HIGHEST). Batched use: ``jax.vmap`` (the Pallas
    variant lifts vmap onto its grid).
    """
    if use_pallas:
        return _sqrtm_pallas(cov, num_iters=num_iters, reg=reg)

    c = cov.shape[-1]
    a = cov.astype(jnp.float32)
    # trace/∞-norm as MXU contractions: plain sum reductions are tiled
    # batch-dependently by XLA, breaking bitwise batch stability
    # (ops/reductions.py).
    a = a + (reg * reductions.trace(a) / c) * jnp.eye(c, dtype=a.dtype)
    norm = reductions.inf_norm(a)  # ‖A‖_∞ ≥ λ_max
    y, z = _ns_iterations(a / norm, num_iters, precision)
    sqrt_norm = jnp.sqrt(norm)
    return y * sqrt_norm, z / sqrt_norm


def _ns_kernel(a_ref, sqrt_ref, isqrt_ref, *, num_iters: int, reg: float):
    """Pallas body: whole NS iteration resident in VMEM.

    HBM traffic is exactly one read of A and one write per output; the
    2·num_iters C×C matmuls in between run MXU-to-VMEM. For C=512 that
    is ~40 matmuls on 1 MB operands — latency-bound on eigh, but
    MXU-saturating here.
    """
    a = a_ref[:].astype(jnp.float32)
    c = a.shape[-1]
    row = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    eye = (row == col).astype(jnp.float32)

    trace = jnp.sum(a * eye)
    a = a + (reg * trace / c) * eye
    norm = jnp.max(jnp.sum(jnp.abs(a), axis=-1))  # ‖A‖_∞ ≥ λ_max
    y = a / norm
    z = eye

    def body(_, yz):
        y, z = yz
        # HIGHEST precision: bf16 MXU passes stall convergence at ~2%.
        t = 1.5 * eye - 0.5 * jnp.dot(
            z, y, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return (
            jnp.dot(y, t, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST),
            jnp.dot(t, z, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST),
        )

    y, z = jax.lax.fori_loop(0, num_iters, body, (y, z))
    sqrt_norm = jnp.sqrt(norm)
    sqrt_ref[:] = y * sqrt_norm
    isqrt_ref[:] = z / sqrt_norm


@partial(jax.jit, static_argnames=("num_iters", "reg"))
def _sqrtm_pallas(
    cov: jax.Array, *, num_iters: int, reg: float
) -> tuple[jax.Array, jax.Array]:
    """Pallas wrapper with lane-dim padding.

    C is padded up to a multiple of 128 with a δ·I block (δ = mean
    diag). Padding is block-diagonal and matrix products preserve
    block-diagonal structure, so the top-left C×C of the padded result
    IS the result for A — the pad block never mixes in.
    """
    c = cov.shape[-1]
    cp = max(_LANE, ((c + _LANE - 1) // _LANE) * _LANE)
    a = cov.astype(jnp.float32)
    if cp != c:
        delta = jnp.trace(a) / c
        pad = delta * jnp.eye(cp - c, dtype=a.dtype)
        a = jnp.block(
            [
                [a, jnp.zeros((c, cp - c), a.dtype)],
                [jnp.zeros((cp - c, c), a.dtype), pad],
            ]
        )

    # Pallas TPU kernels run in interpreter mode on non-TPU backends so
    # the full test suite stays CPU-runnable (SURVEY.md §4).
    interpret = jax.default_backend() != "tpu"
    sqrt_p, isqrt_p = pl.pallas_call(
        partial(_ns_kernel, num_iters=num_iters, reg=reg),
        interpret=interpret,
        out_shape=(
            jax.ShapeDtypeStruct((cp, cp), jnp.float32),
            jax.ShapeDtypeStruct((cp, cp), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_iters * 3 * 2 * cp * cp * cp,
            bytes_accessed=3 * cp * cp * 4,
            transcendentals=0,
        ),
    )(a)
    return sqrt_p[:c, :c], isqrt_p[:c, :c]
