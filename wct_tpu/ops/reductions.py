"""Batch-bitwise-stable sum reductions.

BASELINE.json's north star requires stylized outputs to be
**bitwise-stable across batch sizes**. On TPU, XLA tiles a plain sum
reduction (``jnp.mean``/``jnp.sum``) differently depending on the
surrounding program: measured on v5e, the SAME per-image [N, C]
feature map reduced under ``vmap`` differs by hundreds of ULPs between
batch 1 and batch 3 — and random-weight decoders amplify those ULPs
chaotically (~2×/conv) into fully different pixels.

What IS reproducible across batch shapes on TPU (all measured on v5e):

- ``dot_general`` in **canonical matmul form** — lhs ``[M, K]``
  contracting dim 1 against rhs ``[K, N]`` dim 0, M ≥ 8 — bitwise
  stable. Non-canonical forms are NOT: a ``[1, N]``/vector lhs is
  rewritten to a reduce (250 ULP diffs), and an axis0×axis0
  contraction re-tiles per batch (22 k ULP diffs on a [132, 512]
  Gram). The MXU accumulation order is a function of the canonical
  operand shapes alone.
- ``eigh`` (fixed per-matrix custom call): bitwise stable.
- The conv stack: bitwise stable.
- ``max``/``argmax``/comparisons: exactly associative, always safe.

On CPU the trade is INVERTED: plain reductions are bitwise stable
across batch sizes (LAPACK-style row loops) while the sublane-
replicated matmul forms pick batch-dependent vectorization. So every
helper dispatches on the backend at trace time; both paths compute the
same quantities within fp rounding.

Scope — what these helpers DO and DON'T deliver (all measured,
batch 1 vs 3 under vmap on v5e):

- DO: the WCT/AdaIN/swap transform stage is bitwise
  program-shape-independent at the DEEP-level shapes where the rank-
  deficient (N ≤ C) Grams live and the 1e-5 truncation knife edge is
  dangerous — zero bit diffs for whitening kernels, NS, grouped, and
  adain at relu5_1-scale N (N=132…4096 means; N=132 Grams). Without
  them the same comparisons drifted 22–65 k ULPs and the knife edge
  blew that up into dev ~390 garbage whitening kernels.
- DON'T: at large-N shallow-level shapes XLA splits the contraction
  itself batch-dependently and no operand barrier pins it (measured:
  mean0 drifts at N=65536/262144 even with the barrier; Gram at
  N=4096, C=512). XLA also picks CONV tilings per batch shape
  (decoder stack drift, measured). Neither can be pinned op-by-op.

The user-facing guarantee — an image's output is bitwise-independent
of its submitted batch size — is therefore delivered at the serving
layer by ``cascade.stylize_microbatched`` (one fixed-shape program
for every request). ``bench/tpu_sanity.py`` checks 6–7 gate that
end-to-end property on-device (``tests/test_wct.py::TestBatching`` is
the CPU gate); ``ops/gram_pallas.py`` is the deterministic-by-
construction Gram alternative if stronger variable-batch behavior is
ever needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Replicate vector operands across the MXU sublane dim: an [8, K] lhs
# keeps the contraction on the matmul path (a [1, K] lhs is rewritten
# to a batch-shape-dependent reduce — measured).
_SUBLANE = 8

_HP = dict(
    preferred_element_type=jnp.float32,
    precision=jax.lax.Precision.HIGHEST,
)


def _mxu() -> bool:
    """True when lowering for TPU (trace-time backend dispatch)."""
    return jax.default_backend() == "tpu"


def matmul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Canonical ``[M, K] @ [K, N]`` dot (contract lhs 1 × rhs 0)."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())), **_HP
    )


def sum0(x: jax.Array) -> jax.Array:
    """Sum over axis 0 of ``[N, C]`` (float32 accumulation).

    The ``optimization_barrier`` on the ones operand is load-bearing:
    without it XLA constant-folds/rewrites the contraction and the
    result drifts between batch shapes at some N (measured: stable at
    N=132, 365/512 ULP-different lanes at N=4096 without the barrier,
    zero with it).
    """
    x = x.astype(jnp.float32)
    if not _mxu():
        return jnp.sum(x, axis=0)
    ones = jax.lax.optimization_barrier(
        jnp.ones((_SUBLANE, x.shape[0]), jnp.float32)
    )
    return matmul(ones, x)[0]


def mean0(x: jax.Array) -> jax.Array:
    """Mean over axis 0 of ``[N, C]`` (float32 accumulation)."""
    return sum0(x) / x.shape[0]


def moments0(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(mean, variance) over axis 0 of ``[N, C]``, two-pass.

    Two-pass ``E[(x−μ)²]`` (not ``E[x²]−μ²``) so large means don't
    cancel catastrophically — matches ``jnp.var`` semantics (ddof=0,
    the reference's ``tf.nn.moments``).
    """
    mu = mean0(x)
    centered = x.astype(jnp.float32) - mu
    return mu, mean0(centered * centered)


def vecmat(v: jax.Array, m: jax.Array) -> jax.Array:
    """``[K] @ [K, N] → [N]`` with the vector sublane-replicated."""
    v32 = v.astype(jnp.float32)
    m32 = m.astype(jnp.float32)
    if not _mxu():
        return v32 @ m32
    v8 = jnp.broadcast_to(v32, (_SUBLANE, v32.shape[0]))
    return matmul(v8, m32)[0]


def gram0(x: jax.Array) -> jax.Array:
    """``xᵀ x`` for ``[N, C]`` contracting axis 0.

    On TPU written as ``transpose → [C, N] @ [N, C]`` with an
    ``optimization_barrier`` pinning the transposed operand — the
    direct axis0×axis0 ``dot_general`` re-tiles per batch shape
    (measured 22 k–62 k ULP diffs), and without the barrier XLA folds
    the transpose back into the dot, reintroducing the instability
    (measured). The barrier materializes ``xᵀ`` once; see
    DESIGN.md §2 for the measured cost.
    """
    x = x.astype(jnp.float32)
    if not _mxu():
        return jax.lax.dot_general(
            x, x, dimension_numbers=(((0,), (0,)), ((), ())), **_HP
        )
    return matmul(jax.lax.optimization_barrier(x.T), x)


def gram0_lowp(x: jax.Array) -> jax.Array:
    """``xᵀ x`` for ``[N, C]`` keeping the OPERAND dtype (f32 accumulate).

    For bf16 inputs every MXU product is EXACT (8-bit × 8-bit mantissas
    fit f32's 24) and the accumulator is f32, so the only difference
    from ``gram0`` on bf16 data is summation-order rounding — while the
    operand reads (and the barrier-materialized transpose) move HALF
    the HBM bytes. Used by the bf16 WCT path (ops/wct.py ``_gram``);
    same canonical-matmul/barrier structure as ``gram0`` for batch
    stability.
    """
    if not _mxu():
        return jax.lax.dot_general(
            x, x, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    return jax.lax.dot_general(
        jax.lax.optimization_barrier(x.T), x,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def gram0_batched(xg: jax.Array) -> jax.Array:
    """Per-group ``xᵀ x``: ``[G, N, Cg] → [G, Cg, Cg]`` (canonical
    batched matmul on TPU, with the same ``optimization_barrier`` as
    ``gram0`` — without it XLA folds the transpose back into the dot
    and grouped covariances drift between batch shapes, measured)."""
    xg = xg.astype(jnp.float32)
    if not _mxu():
        return jax.lax.dot_general(
            xg, xg, dimension_numbers=(((1,), (1,)), ((0,), (0,))), **_HP
        )
    lhs = jax.lax.optimization_barrier(jnp.transpose(xg, (0, 2, 1)))
    return jax.lax.dot_general(
        lhs, xg, dimension_numbers=(((2,), (1,)), ((0,), (0,))), **_HP
    )


def trace(a: jax.Array) -> jax.Array:
    """Trace of ``[C, C]`` (float32).

    TPU path: wide-lane ``[8, C] @ [C, 128]`` ones contraction — a
    narrow ``[C, 1]`` rhs gets rewritten to a reduce and drifts 1 ULP
    between batch shapes (measured), which the Newton–Schulz spectrum
    floor then amplifies.
    """
    diag = jnp.diagonal(a).astype(jnp.float32)
    if not _mxu():
        return jnp.sum(diag)
    d8 = jnp.broadcast_to(diag, (_SUBLANE, diag.shape[0]))
    ones = jnp.ones((diag.shape[0], 128), jnp.float32)
    return matmul(d8, ones)[0, 0]


def inf_norm(a: jax.Array) -> jax.Array:
    """‖A‖_∞ = max row sum of |A| for ``[C, C]`` (row sums on the MXU;
    the outer max is exactly associative)."""
    a32 = jnp.abs(a).astype(jnp.float32)
    if not _mxu():
        return jnp.max(jnp.sum(a32, axis=-1))
    ones = jnp.ones((a32.shape[-1], _SUBLANE), jnp.float32)
    return jnp.max(matmul(a32, ones)[:, 0])
