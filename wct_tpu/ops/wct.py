"""Whitening–coloring transform (WCT) kernels, TPU-native.

Reimplements the numerical core of WCT-TF's ``wct_tf`` (reference:
ops.py:~65–140, reconstructed — see SURVEY.md §3.4 / §A.2) as pure JAX
on-device math:

    cov_c = f_c f_cᵀ/(N−1) + ε I
    (S, U) = eigh(cov)               # tf.svd of a PSD matrix ≡ eigh
    whiten:  f̂_c  = U_c S_c^{−1/2} U_cᵀ (f_c − μ_c)
    color:   f̂_cs = U_s S_s^{+1/2} U_sᵀ f̂_c + μ_s
    blend:   out  = α f̂_cs + (1−α) f_c

Differences from the reference, by design (TPU-first):

- ``eigh`` instead of ``tf.svd``: for a symmetric PSD matrix the two
  agree up to eigenvector sign / degenerate-subspace rotation, and the
  products ``U D Uᵀ`` used here are invariant to both. ``eigh`` lowers
  to a single on-device XLA op — no host round-trip (the reference's
  ``tf.svd`` was frequently CPU-placed; eliminating that is the north
  star in BASELINE.json).
- Rank truncation (reference keeps singular values > 1e-5) is done with
  a static-shape ``where`` mask instead of dynamic slicing, so the
  whole transform jits with fixed shapes.
- The whitening and coloring rotations are folded into ONE C×C matrix
  per image before touching the C×N feature matrix, so the hot matmul
  is a single large MXU-friendly contraction.
- Style statistics are exposed as a cacheable ``StyleStats`` pytree so
  streaming/video paths encode a style once and reuse its coloring
  kernel for every frame (BASELINE config 5).
- Everything is batch-free at the core and ``vmap``-ed at the edges:
  per-image Grams keep reduction order independent of batch size,
  which is what makes outputs bitwise-stable across batch sizes.

Layout convention: features are channels-last, ``[..., H, W, C]``; the
flattened feature matrix is ``[N, C]`` (N = H·W) so the big matmuls are
``[N, C] @ [C, C]`` — MXU-shaped without transposes.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Literal

import jax
import jax.numpy as jnp

from wct_tpu.ops import reductions

# Reference ops.py:~70 uses eps=1e-8 on the Gram diagonal and truncates
# eigenvalues at 1e-5 (SURVEY.md §A.2).
DEFAULT_EPS = 1e-8
DEFAULT_TRUNC = 1e-5

Method = Literal[
    "eigh", "newton_schulz", "newton_schulz_fast", "newton_schulz_pallas", "auto"
]

# 'auto' picks the solver per Gram size (SURVEY.md §7.8): eigh is exact
# truncation and competitive only for small channel counts; Newton–
# Schulz (pure batched MXU matmuls) is ~20× faster than batched eigh at
# C=512 on v5e. Threshold measured at 512px/batch-16 level shapes
# (scripts/exp_wct_fast.py): eigh loses 2× at C=128 (15.8 vs 8.0 ms)
# and is roughly at parity at C=64 (17.9 vs 15.8) — keep eigh only ≤64,
# where its exact 1e-5 truncation comes at no meaningful cost.
_AUTO_EIGH_MAX_C = 64

# 'newton_schulz_fast' runs the NS iteration matmuls at Precision.HIGH
# (3-pass bf16) instead of HIGHEST (6-pass): measured rel err 5e-5 vs
# 7e-6 at C=512 — far below the bf16 pipeline's own ~4e-3 resolution —
# at half the solver's MXU time. The throughput-preset choice.
_NS_PRECISION = {
    "newton_schulz": jax.lax.Precision.HIGHEST,
    "newton_schulz_fast": jax.lax.Precision.HIGH,
}


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StyleStats:
    """Cacheable per-level style statistics.

    ``color(x) = x @ kernel + mean`` recolors a whitened, zero-mean
    feature matrix ``x: [N, C]``. ``kernel`` is the symmetric coloring
    matrix ``U_s S_s^{1/2} U_sᵀ`` (C×C) and ``mean`` the style channel
    mean (C,). Both are linear in the style, so multi-style
    interpolation is a weighted sum of ``StyleStats`` (see
    ``interpolate_stats``), matching the reference's feature-space
    blend (webcam.py --interpolate, SURVEY.md C13).
    """

    kernel: jax.Array  # [C, C] symmetric coloring matrix
    mean: jax.Array  # [C]


def _flatten_hwc(f: jax.Array) -> jax.Array:
    """[H, W, C] → [N, C] with N = H·W."""
    h, w, c = f.shape
    return f.reshape(h * w, c)


def _sym_pow(
    cov: jax.Array, power: float, trunc: float, soft: bool = False,
    topk: int | None = None, rel: float | None = None,
) -> jax.Array:
    """Symmetric matrix power via eigh with static-shape rank truncation.

    Returns ``U diag(m(S)·S^power) Uᵀ`` where ``m(S) = S > trunc`` —
    the reference's "keep singular values > 1e-5" (ops.py:~95) as a
    mask instead of a dynamic slice (XLA needs static shapes).

    ``soft=True`` replaces the hard mask with the continuous filter
    ``s² / (s² + trunc²)`` (Tikhonov-style). The hard threshold is a
    knife edge: an eigenvalue hovering at ``trunc`` flips its entire
    mode in/out of the whitening under fp-level input noise (e.g.
    XLA fusing convs differently per batch shape), discontinuously
    changing the output. The soft filter matches the hard mask away
    from the threshold and is Lipschitz through it — the batch-stable
    production choice for rank-deficient features; hard is the exact
    reference behavior.

    ``topk`` (eigh only) replaces the VALUE threshold with a
    deterministic top-k INDEX mask — flip-free by construction.
    Measured motivation (scripts/exp_matched_mask.py, DESIGN §2b): on
    rank-deficient Grams the 1e-5 value threshold bites into f32 NOISE
    eigenvalues of the near-null subspace, so two legitimate
    eigensolvers keep different mode counts; a fixed k removes that
    entire failure mode. Used by the matched-mask fidelity gates
    (tests/test_trained_fidelity.py) and available as a deterministic
    rank-r WCT knob. Kept eigenvalues are floored at ``trunc·1e-3``
    (the soft path's floor): a caller-supplied k beyond the f32
    numerical rank would otherwise send near-null NOISE eigenvalues —
    possibly negative despite the eps ridge — through
    ``sign(s)·|s|^{−1/2}`` unguarded, producing huge or sign-flipped
    whitening modes.

    ``rel`` (eigh only) replaces the ABSOLUTE 1e-5 threshold with the
    RELATIVE one ``s > rel·s_max`` — whitening restricted to the
    well-conditioned top of the spectrum. Measured
    (scripts/exp_matched_mask.py relvalue vs matched_rel, DESIGN §2b):
    at rel=1e-3 the mask is BIT-IDENTICAL between f32 eigh and the
    float64 oracle with no forcing — the cut lands in a well-separated
    part of the spectrum instead of inside the f32 noise cloud of the
    near-null subspace, so this is the cross-solver-REPRODUCIBLE
    production mode (what soft_trunc was hoped to be and measurably is
    not: soft median 0.196 vs relvalue 0.0146 ≡ matched_rel on the
    composed cascade).
    """
    s, u = jnp.linalg.eigh(cov)  # ascending eigenvalues
    if topk is not None:
        keep = jnp.arange(s.shape[-1]) >= s.shape[-1] - topk
        s_safe = jnp.maximum(s, trunc * 1e-3)  # PSD-clamp kept noise modes
        s_pow = jnp.where(keep, s_safe**power, 0.0)
        return (u * s_pow[None, :]) @ u.T
    if rel is not None:
        # s is ascending, so s[-1] is s_max. Kept values are ≥ rel·s_max
        # (positive whenever the feature map is non-degenerate), so no
        # sign/clamp guard is needed on the kept set.
        keep = s > rel * s[-1]
        s_pow = jnp.where(keep, jnp.abs(jnp.where(keep, s, 1.0)) ** power, 0.0)
        return (u * s_pow[None, :]) @ u.T
    if soft:
        # Clamp to the PSD cone FIRST: fp32 eigh on rank-deficient
        # Grams returns small NEGATIVE noise eigenvalues, and filtering
        # the raw value would send them through the −1/2 power with an
        # O(1) filter weight (measured: |kernel| 4360 vs 91 on an 8×64
        # feature Gram). With s⁺ = max(s, 0) the filter is exactly 0
        # for the whole non-positive noise cloud and Lipschitz through
        # the threshold above it.
        s_pos = jnp.maximum(s, 0.0)
        filt = s_pos * s_pos / (s_pos * s_pos + trunc * trunc)
        s_pow = filt * jnp.maximum(s_pos, trunc * 1e-3) ** power
    else:
        keep = s > trunc
        s_pow = jnp.where(keep, jnp.sign(s) * jnp.abs(s) ** power, 0.0)
    return (u * s_pow[None, :]) @ u.T


def _gram(f_flat: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Mean-center and form the channel Gram of ``f_flat: [N, C]``.

    Returns ``(cov [C, C], mean [C])`` with ``cov = fᵀf/(N−1)``
    (reference ops.py:~80). Always accumulates in float32; the mean is
    an MXU contraction (ops/reductions.py) so the result is bitwise-
    identical at any batch size.

    float32 inputs: two-pass centered Gram (reference form; immune to
    mean/std cancellation).

    bfloat16 inputs take the uncentered route
    ``cov = (XᵀX − n·μμᵀ)/(n−1)``: every bf16×bf16 MXU product is
    EXACT in the f32 accumulator, and no centered copy is ever
    materialized — the alternative (center in f32, round back to bf16)
    would put ~4e-3 elementwise rounding INTO the operands, i.e. ~1e-3
    into cov, while the cancellation error of the uncentered form is
    only ~eps·(μ²+σ²)/σ² ≈ 1e-6 for relu-scale feature statistics.
    Better numerics AND half the Gram-stage HBM traffic (measured
    faster at every level shape — scripts/exp_wct_fast.py).
    """
    n = f_flat.shape[0]
    if f_flat.dtype == jnp.bfloat16:
        mean = reductions.mean0(f_flat)  # f32 accumulate
        raw = reductions.gram0_lowp(f_flat)
        cov = (raw - n * jnp.outer(mean, mean)) / (n - 1)
        return cov, mean
    f32 = f_flat.astype(jnp.float32)
    mean = reductions.mean0(f32)
    centered = f32 - mean[None, :]
    cov = reductions.gram0(centered) / (n - 1)
    return cov, mean


def _sqrt_kernels(
    cov: jax.Array, power: float, trunc: float, method: Method,
    soft: bool = False, ns_iters: int | None = None,
    topk: int | None = None, rel: float | None = None,
) -> jax.Array:
    """cov^{power} for power = ±1/2 with the selected eigensolver.

    ``soft`` selects the continuous truncation filter (see _sym_pow);
    the Newton–Schulz paths are inherently smooth (their ``reg``
    spectrum floor is continuous), so ``soft`` only affects eigh.
    ``ns_iters`` overrides the Newton–Schulz iteration count (default
    ``sqrtm.DEFAULT_ITERS``; ignored by eigh) — NS needs ~log(κ)
    iterations, so small/well-conditioned covariances (shallow cascade
    levels) converge in fewer than the C=512 default.
    ``topk`` / ``rel`` (eigh only): deterministic top-k index mask /
    relative value threshold — see _sym_pow. Both are SPECTRUM masks,
    which Newton–Schulz (a mask-free coupled iteration with a
    continuous ``reg`` floor) cannot express — requesting either with a
    non-eigh resolved method raises instead of silently dropping the
    guarantee (the groups≠1 incompatibility raises the same way).
    """
    if method == "auto":
        method = "eigh" if cov.shape[-1] <= _AUTO_EIGH_MAX_C else "newton_schulz"
    if method != "eigh":
        if topk is not None:
            raise ValueError(
                f"trunc_topk requires the eigh path; method resolved to "
                f"{method!r} (C={cov.shape[-1]}) has no spectrum mask to "
                "truncate — its deterministic rank-k guarantee would be "
                "silently dropped"
            )
        if rel is not None:
            raise ValueError(
                f"rel_trunc requires the eigh path; method resolved to "
                f"{method!r} (C={cov.shape[-1]}) has no spectrum mask — "
                "the relative threshold would be silently dropped"
            )
    if method == "eigh":
        return _sym_pow(cov, power, trunc, soft=soft, topk=topk, rel=rel)
    if method in ("newton_schulz", "newton_schulz_fast", "newton_schulz_pallas"):
        # Lazy import: keeps ops.wct importable without pallas deps.
        from wct_tpu.ops import sqrtm

        use_pallas = method == "newton_schulz_pallas"
        sq, inv = sqrtm.newton_schulz_sqrtm(
            cov,
            num_iters=sqrtm.DEFAULT_ITERS if ns_iters is None else ns_iters,
            use_pallas=use_pallas,
            precision=_NS_PRECISION.get(method, jax.lax.Precision.HIGHEST),
        )
        return inv if power < 0 else sq
    raise ValueError(f"unknown WCT method: {method!r}")


def whitening_kernel(
    fc: jax.Array,
    *,
    eps: float = DEFAULT_EPS,
    trunc: float = DEFAULT_TRUNC,
    method: Method = "eigh",
    groups: int = 1,
    soft_trunc: bool = False,
    ns_iters: int | None = None,
    trunc_topk: int | None = None,
    rel_trunc: float | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Whitening matrix + mean for content features ``fc: [H, W, C]``.

    ``whiten(x) = (x − mean) @ kernel`` gives identity channel
    covariance (on the retained rank). Mirrors reference ops.py:~85–110.
    ``groups > 1`` → block-diagonal kernel ``[G, C/G, C/G]``.
    ``trunc_topk`` (eigh, ungrouped): keep exactly the top-k modes
    instead of the 1e-5 value threshold — see _sym_pow.
    ``rel_trunc`` (eigh): keep modes with s > rel_trunc·s_max — the
    cross-solver-reproducible relative threshold (see _sym_pow); with
    groups > 1 the threshold applies within each group's spectrum.
    """
    f_flat = _flatten_hwc(fc)
    _check_trunc_modes(soft_trunc, trunc_topk, rel_trunc, groups)
    if groups == 1:
        cov, mean = _gram(f_flat)
        cov = cov + eps * jnp.eye(cov.shape[0], dtype=cov.dtype)
        return _sqrt_kernels(
            cov, -0.5, trunc, method, soft=soft_trunc, ns_iters=ns_iters,
            topk=trunc_topk, rel=rel_trunc,
        ), mean
    covs, mean = _grouped_gram(f_flat, groups)
    cg = covs.shape[-1]
    covs = covs + eps * jnp.eye(cg, dtype=covs.dtype)[None]
    kernel = jax.vmap(
        lambda c: _sqrt_kernels(
            c, -0.5, trunc, method, soft=soft_trunc, ns_iters=ns_iters,
            rel=rel_trunc,
        )
    )(covs)
    return kernel, mean


def _check_trunc_modes(
    soft: bool, topk: int | None, rel: float | None, groups: int = 1
) -> None:
    """The three truncation overrides are mutually exclusive modes."""
    chosen = [
        n
        for n, on in (
            ("soft_trunc", soft), ("trunc_topk", topk is not None),
            ("rel_trunc", rel is not None),
        )
        if on
    ]
    if len(chosen) > 1:
        raise ValueError(
            f"truncation modes are mutually exclusive; got {chosen}"
        )
    if topk is not None and groups != 1:
        raise ValueError("trunc_topk is only supported with groups=1")
    if rel is not None and not 0.0 < rel < 1.0:
        raise ValueError(f"rel_trunc must be in (0, 1), got {rel}")


def whiten_color_kernels(
    f: jax.Array,
    *,
    eps: float = DEFAULT_EPS,
    trunc: float = DEFAULT_TRUNC,
    method: Method = "eigh",
    soft_trunc: bool = False,
    rel_trunc: float | None = None,
    trunc_topk: int | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(whitening kernel, coloring kernel, mean) from ONE decomposition.

    Style-swap needs BOTH cov^{−1/2} (to whiten the style features for
    patch matching) and cov^{+1/2} (to recolor afterwards); computing
    them via separate ``whitening_kernel`` + ``style_stats`` calls
    would run the Gram and the eigendecomposition twice. Here eigh is
    factored once (and Newton–Schulz already yields both powers in one
    coupled iteration). ``soft_trunc`` selects the same continuous
    eigenvalue filter as ``_sym_pow`` (cascade plumbs
    ``cfg.soft_trunc`` here so ``--swap5 --soft-trunc`` compose);
    ``rel_trunc`` the relative threshold (``--swap5 --rel-trunc``);
    ``trunc_topk`` the deterministic top-k index mask (eigh only —
    the matched-mask gate mechanism, DESIGN §2b).
    """
    f_flat = _flatten_hwc(f)
    _check_trunc_modes(soft_trunc, trunc_topk, rel_trunc)
    cov, mean = _gram(f_flat)
    cov = cov + eps * jnp.eye(cov.shape[0], dtype=cov.dtype)
    if method == "auto":
        method = "eigh" if cov.shape[-1] <= _AUTO_EIGH_MAX_C else "newton_schulz"
    if rel_trunc is not None and method != "eigh":
        raise ValueError(
            f"rel_trunc requires the eigh path; method resolved to {method!r}"
        )
    if trunc_topk is not None and method != "eigh":
        raise ValueError(
            f"trunc_topk requires the eigh path; method resolved to {method!r}"
        )
    if method == "eigh":
        s, u = jnp.linalg.eigh(cov)
        if soft_trunc:
            s_pos = jnp.maximum(s, 0.0)
            filt = s_pos * s_pos / (s_pos * s_pos + trunc * trunc)
            inv_d = filt * jnp.maximum(s_pos, trunc * 1e-3) ** -0.5
            sq_d = filt * s_pos**0.5
        else:
            if trunc_topk is not None:
                c = s.shape[0]
                keep = jnp.arange(c) >= c - trunc_topk
            else:
                keep = s > (rel_trunc * s[-1] if rel_trunc is not None else trunc)
            safe = jnp.where(keep, s, 1.0)
            inv_d = jnp.where(keep, jnp.abs(safe) ** -0.5, 0.0)
            sq_d = jnp.where(keep, jnp.abs(safe) ** 0.5, 0.0)
        inv = (u * inv_d[None, :]) @ u.T
        sq = (u * sq_d[None, :]) @ u.T
        return inv, sq, mean
    from wct_tpu.ops import sqrtm

    sq, inv = sqrtm.newton_schulz_sqrtm(
        cov,
        use_pallas=(method == "newton_schulz_pallas"),
        precision=_NS_PRECISION.get(method, jax.lax.Precision.HIGHEST),
    )
    return inv, sq, mean


def style_stats(
    fs: jax.Array,
    *,
    eps: float = DEFAULT_EPS,
    trunc: float = DEFAULT_TRUNC,
    method: Method = "eigh",
    groups: int = 1,
    soft_trunc: bool = False,
    trunc_topk: int | None = None,
    rel_trunc: float | None = None,
) -> StyleStats:
    """Compute cacheable coloring statistics from style features [H, W, C].

    Mirrors the style half of reference ops.py:~110–125; computing it
    once per style (not per frame) is the persistent style-covariance
    cache of BASELINE config 5.

    ``groups > 1`` computes BLOCK-DIAGONAL statistics: channels split
    into G groups, each whitened/colored independently (grouped WCT, as
    in AdaWCT/PhotoWCT² — arXiv:2208.00921, 2110.11995). G² cheaper
    decompositions and often visually comparable; the stats kernel then
    has shape ``[G, C/G, C/G]``. groups=1 is exact reference behavior.
    ``trunc_topk``: deterministic top-k truncation — see _sym_pow.
    ``rel_trunc``: relative threshold s > rel·s_max — see _sym_pow.
    """
    f_flat = _flatten_hwc(fs)
    _check_trunc_modes(soft_trunc, trunc_topk, rel_trunc, groups)
    if groups == 1:
        cov, mean = _gram(f_flat)
        cov = cov + eps * jnp.eye(cov.shape[0], dtype=cov.dtype)
        kernel = _sqrt_kernels(
            cov, 0.5, trunc, method, soft=soft_trunc, topk=trunc_topk,
            rel=rel_trunc,
        )
        return StyleStats(kernel=kernel, mean=mean)
    covs, mean = _grouped_gram(f_flat, groups)
    cg = covs.shape[-1]
    covs = covs + eps * jnp.eye(cg, dtype=covs.dtype)[None]
    kernel = jax.vmap(
        lambda c: _sqrt_kernels(
            c, 0.5, trunc, method, soft=soft_trunc, rel=rel_trunc
        )
    )(covs)
    return StyleStats(kernel=kernel, mean=mean)


def _grouped_gram(f_flat: jax.Array, groups: int) -> tuple[jax.Array, jax.Array]:
    """Per-group Grams: [N, C] → ([G, C/G, C/G], mean [C])."""
    n, c = f_flat.shape
    if c % groups:
        raise ValueError(f"channels {c} not divisible by groups {groups}")
    f32 = f_flat.astype(jnp.float32)
    mean = reductions.mean0(f32)
    centered = (f32 - mean[None, :]).reshape(n, groups, c // groups)
    # Batch-stable per-group Grams (ops/reductions.py).
    covs = reductions.gram0_batched(jnp.transpose(centered, (1, 0, 2))) / (n - 1)
    return covs, mean


def _apply_kernel(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """x [N, C] @ kernel, where kernel is [C, C] or block-diag [G, Cg, Cg].

    float32 x runs at HIGH precision (3-pass bf16): with the α-blend
    folded into the kernel (see ``wct_from_stats``) the content
    features themselves pass through this matmul, and TPU-default
    single-pass bf16 multiplies would put a ~4e-3 relative floor under
    the fidelity (f32+eigh) path. HIGH keeps ~2e-5 of the 6-pass
    HIGHEST result (measured, relu5_1 features) at half its pass count
    — these are the largest matmuls in the WCT stage ([N, C] with
    N = H·W) — and is bitwise batch-shape-stable like HIGHEST
    (measured).

    bfloat16 x keeps both operands bf16 (kernel rounded once, per image
    not per pixel) with an f32 accumulator: the products are exact for
    the bf16 values, the kernel rounding (~4e-3) is at the bf16
    pipeline's own resolution, and the operand reads move half the HBM
    bytes — this matmul is HBM-bound at the shallow levels (N=262144,
    C=64 at 512px). α=0 stays an exact identity: I rounds to bf16
    exactly, and x·I accumulates single exact products.

    Output is f32 either way (the caller adds the f32 bias and casts
    back to the input dtype).
    """
    lowp = x.dtype == jnp.bfloat16
    kernel = kernel.astype(jnp.bfloat16) if lowp else kernel
    prec = None if lowp else jax.lax.Precision.HIGH
    if kernel.ndim == 2:
        return jax.lax.dot_general(
            x, kernel,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
    n, c = x.shape
    g, cg, _ = kernel.shape
    # Canonical batched matmul [g, n, cg] @ [g, cg, cg] (einsum's
    # "ngc,gcd->ngd" layout re-tiles per batch shape — reductions.py).
    # Already canonical (contract lhs dim 2 × rhs dim 1), so it is
    # batch-stable on both backends unchanged.
    xg = jnp.transpose(x.reshape(n, g, cg), (1, 0, 2))
    out = jax.lax.dot_general(
        xg, kernel,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=prec,
    )
    return jnp.transpose(out, (1, 0, 2)).reshape(n, c)


def interpolate_stats(stats: list[StyleStats], weights: jax.Array) -> StyleStats:
    """Blend K styles' statistics with ``weights: [K]``.

    Coloring is linear in (kernel, mean), so blending stats is exactly
    the reference's feature-space interpolation
    ``Σ_k w_k · color_k(f̂_c)`` (webcam.py --interpolate, SURVEY.md
    §A.2) at a fraction of the cost: one blended C×C kernel instead of
    K recolorings.
    """
    kernels = jnp.stack([s.kernel for s in stats])  # [K, C, C] or [K, G, Cg, Cg]
    means = jnp.stack([s.mean for s in stats])  # [K, C]
    w = weights.astype(kernels.dtype)
    return StyleStats(
        kernel=jnp.einsum("k,k...->...", w, kernels),
        mean=jnp.einsum("k,kc->c", w, means),
    )


def wct_transform(
    fc: jax.Array,
    stats: StyleStats,
    alpha: jax.Array | float = 1.0,
    *,
    eps: float = DEFAULT_EPS,
    trunc: float = DEFAULT_TRUNC,
    method: Method = "eigh",
    groups: int = 1,
    soft_trunc: bool = False,
    ns_iters: int | None = None,
    rel_trunc: float | None = None,
) -> tuple[jax.Array, jax.Array]:
    """The WCT as an explicit per-image affine: ``(M [C, C], bias [C])``.

    ``wct_from_stats(fc, …) == fc_flat @ M + bias`` — whitening,
    coloring, AND the α blend folded into one C×C matrix (grouped
    kernels are expanded block-diagonal so callers get a dense M).
    Exposed separately so consumers can fold the affine into whatever
    linear op FOLLOWS the transform — the cascade folds it into the
    decoder's first conv (models/decoder.py:decode_folded), which
    deletes the apply matmul's [N, C] read+write round trip and its
    layout copies (~14 ms/batch-16 at relu1_1, 512px, measured).
    """
    c = fc.shape[-1]
    w_c, mu_c = whitening_kernel(
        fc, eps=eps, trunc=trunc, method=method, groups=groups,
        soft_trunc=soft_trunc, ns_iters=ns_iters, rel_trunc=rel_trunc,
    )
    k_s = stats.kernel.astype(jnp.float32)
    if w_c.ndim != k_s.ndim:
        raise ValueError(
            "content whitening groups do not match cached style stats "
            f"(kernel ranks {w_c.ndim} vs {k_s.ndim}) — precompute the "
            "style with the same `groups`"
        )
    alpha = jnp.asarray(alpha, dtype=jnp.float32)
    mu_s = stats.mean.astype(jnp.float32)
    if w_c.ndim == 2:
        transform = jax.lax.dot_general(
            w_c, k_s,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        eye = jnp.eye(c, dtype=jnp.float32)
        mu_c_t = reductions.vecmat(mu_c, transform)
        blended = alpha * transform + (1.0 - alpha) * eye
    else:
        transform = jnp.einsum(
            "gab,gbc->gac", w_c, k_s, preferred_element_type=jnp.float32
        )
        g, cg, _ = transform.shape
        eye = jnp.broadcast_to(jnp.eye(cg, dtype=jnp.float32), (g, cg, cg))
        mu_c_t = jax.vmap(reductions.vecmat)(
            mu_c.reshape(g, cg), transform
        ).reshape(c)
        blocks = alpha * transform + (1.0 - alpha) * eye
        # Dense block-diagonal expansion: [G, Cg, Cg] → [C, C].
        blended = (
            jnp.zeros((g, cg, g, cg), jnp.float32)
            .at[jnp.arange(g), :, jnp.arange(g), :]
            .set(blocks)
            .reshape(c, c)
        )
    bias = alpha * (mu_s - mu_c_t)
    return blended, bias


def wct_from_stats(
    fc: jax.Array,
    stats: StyleStats,
    alpha: jax.Array | float = 1.0,
    *,
    eps: float = DEFAULT_EPS,
    trunc: float = DEFAULT_TRUNC,
    method: Method = "eigh",
    groups: int = 1,
    soft_trunc: bool = False,
    ns_iters: int | None = None,
    trunc_topk: int | None = None,
    rel_trunc: float | None = None,
) -> jax.Array:
    """Apply WCT to content features [H, W, C] given cached style stats.

    The whitening rotation, the coloring kernel, AND the alpha blend
    are folded into one C×C (or per-group Cg×Cg) affine transform
    before the [N, C] feature matrix is touched, so the per-pixel work
    is a single MXU matmul plus a fused bias — the feature map is read
    once and written once (HBM bandwidth is the budget at relu1_1,
    where [N, C] is 64 MB at 512px):

        T   = W_c @ K_s
        out = fc @ (α·T + (1−α)·I) + α·(μ_s − μ_c @ T)

    which equals the reference's ``α·((fc − μ_c)·T + μ_s) + (1−α)·fc``
    (ops.py:~135 — blend against the ORIGINAL, uncentered content
    features). At α=0 the matrix is exactly I and the bias exactly 0,
    so the identity property holds to matmul rounding (exact on CPU;
    ~1e-7 relative on the MXU at HIGHEST precision).
    """
    h, w, c = fc.shape
    in_dtype = fc.dtype
    f_flat = _flatten_hwc(fc)
    if f_flat.dtype != jnp.bfloat16:
        # bf16 features stay bf16 through the apply matmul (exact
        # products, half the HBM reads — see _apply_kernel); everything
        # else is promoted once.
        f_flat = f_flat.astype(jnp.float32)

    w_c, mu_c = whitening_kernel(
        fc, eps=eps, trunc=trunc, method=method, groups=groups,
        soft_trunc=soft_trunc, ns_iters=ns_iters, trunc_topk=trunc_topk,
        rel_trunc=rel_trunc,
    )
    k_s = stats.kernel.astype(jnp.float32)
    if w_c.ndim != k_s.ndim:
        raise ValueError(
            "content whitening groups do not match cached style stats "
            f"(kernel ranks {w_c.ndim} vs {k_s.ndim}) — precompute the "
            "style with the same `groups`"
        )
    alpha = jnp.asarray(alpha, dtype=jnp.float32)
    mu_s = stats.mean.astype(jnp.float32)
    if w_c.ndim == 2:
        transform = jax.lax.dot_general(
            w_c, k_s,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        eye = jnp.eye(c, dtype=jnp.float32)
        mu_c_t = reductions.vecmat(mu_c, transform)
    else:
        transform = jnp.einsum(
            "gab,gbc->gac", w_c, k_s, preferred_element_type=jnp.float32
        )
        g, cg, _ = transform.shape
        eye = jnp.broadcast_to(jnp.eye(cg, dtype=jnp.float32), (g, cg, cg))
        mu_c_t = jax.vmap(reductions.vecmat)(
            mu_c.reshape(g, cg), transform
        ).reshape(c)
    blended = alpha * transform + (1.0 - alpha) * eye
    bias = alpha * (mu_s - mu_c_t)
    # NOTE on layouts (measured, v5e 512px/batch-16): contracting the
    # channel dim on the 3-D [H, W, C] map instead of this flattened
    # [N, C] matmul removes the apply-local layout copies but makes XLA
    # re-tile the reflect-pad/conv path instead — net −1.4 fps. The
    # flat form is the better global layout equilibrium.
    out = _apply_kernel(f_flat, blended) + bias[None, :]
    return out.reshape(h, w, c).astype(in_dtype)


def wct(
    fc: jax.Array,
    fs: jax.Array,
    alpha: jax.Array | float = 1.0,
    *,
    eps: float = DEFAULT_EPS,
    trunc: float = DEFAULT_TRUNC,
    method: Method = "eigh",
    groups: int = 1,
    soft_trunc: bool = False,
    trunc_topk: tuple[int, int] | None = None,
    rel_trunc: float | None = None,
) -> jax.Array:
    """Whitening–coloring transform, single image.

    ``fc: [H, W, C]`` content features, ``fs: [H', W', C]`` style
    features (spatial sizes may differ; channel count must match).
    Equivalent to reference ``wct_tf(content, style, alpha, eps)``
    (ops.py:~65) minus the batch-squeeze: batching here is explicit via
    ``wct_batched``. ``groups > 1`` selects grouped (block-diagonal)
    WCT — see ``style_stats``. ``trunc_topk=(k_c, k_s)`` selects
    deterministic top-k truncation per side; ``rel_trunc`` the
    relative threshold — see _sym_pow.
    """
    k_c, k_s = trunc_topk if trunc_topk is not None else (None, None)
    stats = style_stats(
        fs, eps=eps, trunc=trunc, method=method, groups=groups,
        soft_trunc=soft_trunc, trunc_topk=k_s, rel_trunc=rel_trunc,
    )
    return wct_from_stats(
        fc, stats, alpha, eps=eps, trunc=trunc, method=method, groups=groups,
        soft_trunc=soft_trunc, trunc_topk=k_c, rel_trunc=rel_trunc,
    )


@partial(jax.jit, static_argnames=("method",))
def wct_batched(
    fc: jax.Array,
    fs: jax.Array,
    alpha: jax.Array | float = 1.0,
    *,
    method: Method = "eigh",
) -> jax.Array:
    """vmap-ed WCT over a leading batch dim: ``[B, H, W, C]`` each.

    Per-image Grams (no cross-batch fusion) keep reduction order — and
    therefore output bits — independent of batch size (BASELINE:
    "bitwise-stable across batch sizes").
    """
    alpha = jnp.broadcast_to(jnp.asarray(alpha, jnp.float32), (fc.shape[0],))
    return jax.vmap(lambda c, s, a: wct(c, s, a, method=method))(fc, fs, alpha)
