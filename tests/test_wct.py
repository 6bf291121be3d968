"""Numerics unit tests for the WCT kernel library (SURVEY.md §4.1).

CPU-runnable, weight-free property tests: whitening produces identity
covariance, coloring reproduces the style covariance, alpha=0 is the
identity, the jax path matches a plain-numpy oracle of the reference
math (SURVEY.md §A.2), rank truncation survives rank-deficient inputs,
and outputs are bitwise-stable across batch sizes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wct_tpu.ops import wct as wct_ops


def _feat(rng, h=13, w=11, c=16, scale=1.0, shift=0.0):
    return (rng.standard_normal((h, w, c)) * scale + shift).astype(np.float32)


def _cov(f):
    flat = f.reshape(-1, f.shape[-1]).astype(np.float64)
    centered = flat - flat.mean(0)
    return centered.T @ centered / (flat.shape[0] - 1)


def numpy_wct_oracle(fc, fs, alpha, eps=1e-8, trunc=1e-5):
    """Reference wct_tf math (ops.py:~65–140 / SURVEY.md §A.2) in numpy."""
    h, w, c = fc.shape
    fc_flat = fc.reshape(-1, c).astype(np.float64)
    fs_flat = fs.reshape(-1, c).astype(np.float64)

    def sym_pow(f_flat, power):
        mu = f_flat.mean(0)
        centered = f_flat - mu
        cov = centered.T @ centered / (f_flat.shape[0] - 1) + eps * np.eye(c)
        s, u = np.linalg.eigh(cov)
        s_pow = np.where(s > trunc, np.sign(s) * np.abs(s) ** power, 0.0)
        return (u * s_pow) @ u.T, mu

    w_c, mu_c = sym_pow(fc_flat, -0.5)
    k_s, mu_s = sym_pow(fs_flat, +0.5)
    colored = (fc_flat - mu_c) @ w_c @ k_s + mu_s
    out = alpha * colored + (1 - alpha) * fc_flat
    return out.reshape(h, w, c)


class TestWhitening:
    def test_identity_covariance(self, rng):
        f = _feat(rng, c=8, scale=3.0, shift=2.0)
        kern, mu = wct_ops.whitening_kernel(jnp.asarray(f))
        flat = f.reshape(-1, 8)
        white = (flat - np.asarray(mu)) @ np.asarray(kern)
        cov = _cov(white.reshape(f.shape[:2] + (8,)))
        np.testing.assert_allclose(cov, np.eye(8), atol=5e-3)

    def test_more_channels_than_pixels(self, rng):
        # relu5_1 of a small image: N=H·W < C → Gram rank ≤ N−1. The
        # truncation mask must zero the null space and WCT stay finite.
        fc = _feat(rng, h=2, w=2, c=64)
        fs = _feat(rng, h=3, w=3, c=64, scale=2.0)
        out = wct_ops.wct(jnp.asarray(fc), jnp.asarray(fs), 1.0)
        assert np.all(np.isfinite(np.asarray(out)))
        out0 = wct_ops.wct(jnp.asarray(fc), jnp.asarray(fs), 0.0)
        np.testing.assert_allclose(np.asarray(out0), fc, atol=1e-4)

    def test_rank_deficient_input(self, rng):
        # Two constant channels → rank-deficient Gram; truncation must
        # zero those modes, not blow up (reference's 1e-5 threshold).
        f = _feat(rng, c=8)
        f[..., 3] = 1.7
        f[..., 6] = -0.4
        kern, mu = wct_ops.whitening_kernel(jnp.asarray(f))
        assert np.all(np.isfinite(np.asarray(kern)))
        white = (f.reshape(-1, 8) - np.asarray(mu)) @ np.asarray(kern)
        cov = _cov(white.reshape(f.shape[:2] + (8,)))
        # Non-degenerate modes whiten to unit variance.
        diag = np.sort(np.diag(cov))
        np.testing.assert_allclose(diag[2:], 1.0, atol=5e-3)
        np.testing.assert_allclose(diag[:2], 0.0, atol=5e-3)


class TestWCT:
    def test_colored_matches_style_covariance(self, rng):
        fc = _feat(rng, c=8)
        fs = _feat(rng, h=9, w=7, c=8, scale=2.5, shift=-1.0)
        out = np.asarray(wct_ops.wct(jnp.asarray(fc), jnp.asarray(fs), 1.0))
        np.testing.assert_allclose(_cov(out), _cov(fs), atol=5e-2, rtol=5e-2)
        np.testing.assert_allclose(
            out.reshape(-1, 8).mean(0),
            fs.reshape(-1, 8).mean(0),
            atol=1e-2,
        )

    def test_alpha_zero_is_identity(self, rng):
        fc = _feat(rng)
        fs = _feat(rng, h=9, w=7)
        out = wct_ops.wct(jnp.asarray(fc), jnp.asarray(fs), 0.0)
        np.testing.assert_allclose(np.asarray(out), fc, atol=1e-4)

    @pytest.mark.parametrize("alpha", [1.0, 0.6])
    def test_matches_numpy_oracle(self, rng, alpha):
        fc = _feat(rng, c=12, scale=1.5)
        fs = _feat(rng, h=10, w=9, c=12, scale=2.0, shift=0.5)
        ours = np.asarray(wct_ops.wct(jnp.asarray(fc), jnp.asarray(fs), alpha))
        oracle = numpy_wct_oracle(fc, fs, alpha)
        np.testing.assert_allclose(ours, oracle, atol=2e-3, rtol=2e-3)

    def test_topk_matches_value_threshold_on_full_rank(self, rng):
        """trunc_topk=(C, C) on full-rank features == the value mask
        (every eigenvalue clears 1e-5, so both keep everything)."""
        fc = _feat(rng, c=12, scale=1.5)
        fs = _feat(rng, h=10, w=9, c=12, scale=2.0, shift=0.5)
        a = np.asarray(wct_ops.wct(jnp.asarray(fc), jnp.asarray(fs), 0.8))
        b = np.asarray(wct_ops.wct(
            jnp.asarray(fc), jnp.asarray(fs), 0.8, trunc_topk=(12, 12)
        ))
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)

    def test_topk_matches_oracle_on_rank_deficient(self, rng):
        """Matched top-k masks: production f32 vs float64 oracle agree
        tightly even where the VALUE threshold would flip f32 noise
        modes (rank-deficient Gram: 24 channels, 12 pixels) — the
        matched-mask gate mechanism (DESIGN §2b) at op level."""
        from wct_tpu.tools.oracle import wct_np, wct_ranks_np

        fc = _feat(rng, h=4, w=3, c=24, scale=1.5)
        fs = _feat(rng, h=4, w=3, c=24, scale=2.0, shift=0.3)
        k_c, k_s = wct_ranks_np(
            fc.astype(np.float64), fs.astype(np.float64)
        )
        assert k_c < 24 and k_s < 24  # genuinely rank-deficient
        ours = np.asarray(wct_ops.wct(
            jnp.asarray(fc), jnp.asarray(fs), 0.8, trunc_topk=(k_c, k_s)
        ))
        ref = wct_np(
            fc.astype(np.float64), fs.astype(np.float64), 0.8,
            force_k=(k_c, k_s),
        )
        np.testing.assert_allclose(ours, ref, atol=5e-3, rtol=5e-3)

    def test_eigenvector_sign_invariance(self, rng):
        # U D Uᵀ products must not depend on eigenvector sign: two runs
        # on identical data must agree exactly.
        fc, fs = _feat(rng), _feat(rng, h=9, w=7)
        a = wct_ops.wct(jnp.asarray(fc), jnp.asarray(fs), 1.0)
        b = wct_ops.wct(jnp.asarray(fc.copy()), jnp.asarray(fs.copy()), 1.0)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestSoftTruncation:
    def test_matches_hard_when_well_conditioned(self, rng):
        # Full-rank Gram with eigenvalues ≫ trunc: soft ≈ hard.
        fc = _feat(rng, c=8, scale=2.0)
        fs = _feat(rng, h=9, w=7, c=8, scale=1.5)
        hard = wct_ops.wct(jnp.asarray(fc), jnp.asarray(fs), 1.0)
        soft = wct_ops.wct(jnp.asarray(fc), jnp.asarray(fs), 1.0, soft_trunc=True)
        np.testing.assert_allclose(
            np.asarray(hard), np.asarray(soft), atol=1e-3, rtol=1e-3
        )

    def test_continuous_through_threshold(self, rng):
        # Build features with ONE mode whose variance sits exactly at
        # the 1e-5 threshold; nudging it ±5% makes the HARD mask flip
        # the whole mode (kernel jump ~ trunc^{-1/2} ≈ 316) while the
        # SOFT filter responds proportionally. The base channels are
        # given small variance (4e-5) so fp32 eigh noise (~1e-7·‖A‖)
        # stays far below the nudge, and the edge mode is exactly
        # orthogonalized against them so its eigenvalue IS its variance.
        n, c = 256, 8
        base = rng.standard_normal((n, c - 1)).astype(np.float64)
        base -= base.mean(0)
        base *= np.sqrt(4e-5) / base.std(0, ddof=1)
        edge = rng.standard_normal((n, 1)).astype(np.float64)
        edge -= edge.mean(0)
        edge -= base @ np.linalg.lstsq(base, edge, rcond=None)[0]
        edge *= np.sqrt(n - 1) / np.linalg.norm(edge)

        def feats(scale):
            f = np.concatenate([base, edge * np.sqrt(scale)], axis=1)
            return jnp.asarray(f.reshape(16, 16, c), jnp.float32)

        t = wct_ops.DEFAULT_TRUNC
        deltas = {}
        for soft in (False, True):
            k_lo, _ = wct_ops.whitening_kernel(feats(t * 0.95), soft_trunc=soft)
            k_hi, _ = wct_ops.whitening_kernel(feats(t * 1.05), soft_trunc=soft)
            deltas[soft] = float(jnp.abs(k_hi - k_lo).max())
        # Hard flips the mode (hundreds); soft moves proportionally.
        assert deltas[False] > 50, f"hard delta {deltas[False]}"
        assert deltas[True] < deltas[False] / 10, (
            f"soft {deltas[True]} vs hard {deltas[False]}"
        )

    def test_finite_on_rank_deficient(self, rng):
        f = _feat(rng, h=2, w=2, c=32)
        k, mu = wct_ops.whitening_kernel(jnp.asarray(f), soft_trunc=True)
        assert np.all(np.isfinite(np.asarray(k)))

    def test_negative_noise_eigenvalues_bounded(self, rng):
        # fp32 eigh on rank-deficient Grams returns small NEGATIVE
        # noise eigenvalues; the soft filter must send them to ~0, not
        # through the -1/2 power with an O(1) weight (regression:
        # |kernel| blew up to ~4400 vs the hard mask's ~90).
        q, _ = np.linalg.qr(rng.standard_normal((16, 16)))
        s = np.ones(16)
        s[:4] = [-1e-5, -1e-6, 5e-6, 2e-5]
        cov = ((q * s) @ q.T).astype(np.float32)
        t = wct_ops.DEFAULT_TRUNC
        soft = np.asarray(wct_ops._sym_pow(jnp.asarray(cov), -0.5, t, soft=True))
        hard = np.asarray(wct_ops._sym_pow(jnp.asarray(cov), -0.5, t))
        assert np.all(np.isfinite(soft))
        # Bounded by the legitimate near-threshold modes (~t^-1/2), not
        # the negative-noise blowup (~1e4).
        assert np.abs(soft).max() < 500, f"max {np.abs(soft).max()}"
        assert np.abs(hard).max() < 500

    def test_whiten_color_kernels_soft_matches_parts(self, rng):
        # swap5's fused decomposition must honor the same soft filter
        # as the separate whitening/coloring paths (cascade plumbs
        # cfg.soft_trunc into it — regression: it was ignored).
        f = _feat(rng, h=5, w=5, c=32)
        inv, sq, mu = wct_ops.whiten_color_kernels(
            jnp.asarray(f), soft_trunc=True
        )
        w, mu_w = wct_ops.whitening_kernel(jnp.asarray(f), soft_trunc=True)
        st = wct_ops.style_stats(jnp.asarray(f), soft_trunc=True)
        np.testing.assert_allclose(np.asarray(inv), np.asarray(w), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(sq), np.asarray(st.kernel), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_w), atol=1e-6)


class TestGroupedWCT:
    def test_groups_one_matches_plain(self, rng):
        fc, fs = _feat(rng, c=16), _feat(rng, h=9, w=7, c=16)
        a = wct_ops.wct(jnp.asarray(fc), jnp.asarray(fs), 0.8, groups=1)
        b = wct_ops.wct(jnp.asarray(fc), jnp.asarray(fs), 0.8)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_grouped_matches_per_group_reference(self, rng):
        # Grouped WCT over G groups ≡ plain WCT applied to each channel
        # group independently.
        fc = _feat(rng, c=16)
        fs = _feat(rng, h=9, w=7, c=16, scale=2.0)
        out = np.asarray(
            wct_ops.wct(jnp.asarray(fc), jnp.asarray(fs), 1.0, groups=4)
        )
        for g in range(4):
            sl = slice(4 * g, 4 * (g + 1))
            ref = np.asarray(
                wct_ops.wct(jnp.asarray(fc[..., sl]), jnp.asarray(fs[..., sl]), 1.0)
            )
            np.testing.assert_allclose(out[..., sl], ref, atol=1e-4)

    def test_grouped_colored_matches_style_group_stats(self, rng):
        fc = _feat(rng, h=16, w=16, c=8)
        fs = _feat(rng, h=16, w=16, c=8, scale=2.0, shift=1.0)
        out = np.asarray(
            wct_ops.wct(jnp.asarray(fc), jnp.asarray(fs), 1.0, groups=2)
        )
        np.testing.assert_allclose(
            out.reshape(-1, 8).mean(0), fs.reshape(-1, 8).mean(0), atol=5e-2
        )

    def test_indivisible_groups_raise(self, rng):
        fc, fs = _feat(rng, c=10), _feat(rng, c=10)
        with pytest.raises(ValueError, match="divisible"):
            wct_ops.wct(jnp.asarray(fc), jnp.asarray(fs), 1.0, groups=4)

    def test_cascade_with_groups(self, rng):
        import jax as _jax

        from wct_tpu.models import cascade

        params = cascade.init_params(_jax.random.PRNGKey(0))
        cfg = cascade.CascadeConfig(
            relu_targets=("relu2_1", "relu1_1"), wct_groups=4
        )
        content = rng.random((32, 32, 3)).astype(np.float32)
        style = rng.random((32, 32, 3)).astype(np.float32)
        out = cascade.stylize_pair(
            params, jnp.asarray(content), jnp.asarray(style), 0.8, cfg
        )
        assert out.shape == (32, 32, 3)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_cascade_groups_validation(self):
        from wct_tpu.models import cascade

        with pytest.raises(ValueError, match="wct_groups"):
            cascade.CascadeConfig(relu_targets=("relu1_1",), wct_groups=5)


class TestAutoMethod:
    def test_auto_small_matches_eigh(self, rng):
        fc, fs = _feat(rng, c=16), _feat(rng, h=9, w=7, c=16)
        a = wct_ops.wct(jnp.asarray(fc), jnp.asarray(fs), 1.0, method="auto")
        b = wct_ops.wct(jnp.asarray(fc), jnp.asarray(fs), 1.0, method="eigh")
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_auto_large_matches_newton_schulz(self, rng):
        fc = _feat(rng, h=20, w=20, c=256)
        fs = _feat(rng, h=20, w=20, c=256, scale=2.0)
        a = wct_ops.wct(jnp.asarray(fc), jnp.asarray(fs), 1.0, method="auto")
        b = wct_ops.wct(
            jnp.asarray(fc), jnp.asarray(fs), 1.0, method="newton_schulz"
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestBf16Path:
    """The bf16 throughput route: uncentered exact-product Gram + bf16
    apply matmul (ops/wct.py `_gram`/`_apply_kernel`)."""

    def test_bf16_tracks_float32(self, rng):
        fc = np.maximum(_feat(rng, h=16, w=16, c=24, shift=0.5), 0)
        fs = np.maximum(_feat(rng, h=12, w=12, c=24, scale=2.0, shift=0.5), 0)
        out32 = np.asarray(
            wct_ops.wct(jnp.asarray(fc), jnp.asarray(fs), 0.8), np.float32
        )
        out16 = np.asarray(
            wct_ops.wct(
                jnp.asarray(fc, jnp.bfloat16), jnp.asarray(fs, jnp.bfloat16), 0.8
            ).astype(jnp.float32)
        )
        # bf16 inputs carry ~4e-3 relative rounding; the transform must
        # not amplify it beyond a small factor on the body.
        scale = np.abs(out32).mean()
        assert np.median(np.abs(out16 - out32)) < 3e-2 * scale

    def test_bf16_alpha_zero_exact_identity(self, rng):
        fc = jnp.asarray(_feat(rng, c=16, shift=1.0), jnp.bfloat16)
        fs = jnp.asarray(_feat(rng, h=9, w=7, c=16, scale=2.0), jnp.bfloat16)
        out = wct_ops.wct(fc, fs, 0.0)
        # α=0 folds to transform=I, bias=0; I is bf16-exact and x·I
        # accumulates single exact products → bitwise identity.
        np.testing.assert_array_equal(
            np.asarray(out.astype(jnp.float32)),
            np.asarray(fc.astype(jnp.float32)),
        )

    def test_uncentered_gram_matches_centered(self, rng):
        # The uncentered-route algebra (XᵀX − n·μμᵀ)/(n−1), exercised
        # via bf16 inputs, must agree with the centered f32 Gram on the
        # SAME (bf16-representable) values.
        f = jnp.asarray(
            np.maximum(_feat(rng, h=20, w=20, c=12, shift=1.0), 0), jnp.bfloat16
        )
        cov16, mu16 = wct_ops._gram(f.reshape(-1, 12))
        cov32, mu32 = wct_ops._gram(f.astype(jnp.float32).reshape(-1, 12))
        np.testing.assert_allclose(np.asarray(mu16), np.asarray(mu32), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(cov16), np.asarray(cov32),
            atol=1e-4 * float(jnp.abs(cov32).max()),
        )


class TestFastNewtonSchulz:
    def test_fast_close_to_highest(self, rng):
        fc = _feat(rng, h=16, w=16, c=32, shift=0.3)
        fs = _feat(rng, h=16, w=16, c=32, scale=2.0, shift=0.3)
        a = np.asarray(
            wct_ops.wct(jnp.asarray(fc), jnp.asarray(fs), 1.0, method="newton_schulz")
        )
        b = np.asarray(
            wct_ops.wct(
                jnp.asarray(fc), jnp.asarray(fs), 1.0, method="newton_schulz_fast"
            )
        )
        # CPU treats HIGH==HIGHEST (f32 either way); on TPU the fast
        # path was measured at 5e-5 rel err. Loose tolerance covers both.
        np.testing.assert_allclose(a, b, atol=5e-3 * np.abs(a).max())

    def test_fast_accepted_by_cascade_config(self):
        from wct_tpu.models import cascade

        cfg = cascade.CascadeConfig(
            relu_targets=("relu1_1",), method="newton_schulz_fast"
        )
        assert cfg.method == "newton_schulz_fast"


class TestBatching:
    def test_bitwise_stable_across_batch_sizes(self, rng):
        fc = np.stack([_feat(rng) for _ in range(4)])
        fs = np.stack([_feat(rng, h=9, w=7) for _ in range(4)])
        full = np.asarray(wct_ops.wct_batched(jnp.asarray(fc), jnp.asarray(fs), 0.8))
        one = np.asarray(
            wct_ops.wct_batched(jnp.asarray(fc[:1]), jnp.asarray(fs[:1]), 0.8)
        )
        np.testing.assert_array_equal(full[:1], one)


class TestInterpolation:
    def test_stats_blend_equals_feature_blend(self, rng):
        fc = _feat(rng, c=8)
        fs1 = _feat(rng, h=9, w=7, c=8, scale=2.0)
        fs2 = _feat(rng, h=9, w=7, c=8, scale=0.5, shift=1.0)
        w = jnp.asarray([0.3, 0.7])

        s1 = wct_ops.style_stats(jnp.asarray(fs1))
        s2 = wct_ops.style_stats(jnp.asarray(fs2))
        blended = wct_ops.interpolate_stats([s1, s2], w)
        out_blend = wct_ops.wct_from_stats(jnp.asarray(fc), blended, 1.0)

        o1 = wct_ops.wct_from_stats(jnp.asarray(fc), s1, 1.0)
        o2 = wct_ops.wct_from_stats(jnp.asarray(fc), s2, 1.0)
        np.testing.assert_allclose(
            np.asarray(out_blend),
            0.3 * np.asarray(o1) + 0.7 * np.asarray(o2),
            atol=1e-4,
        )

    def test_weights_one_is_identity(self, rng):
        fc, fs = _feat(rng, c=8), _feat(rng, h=9, w=7, c=8)
        s = wct_ops.style_stats(jnp.asarray(fs))
        blended = wct_ops.interpolate_stats([s], jnp.asarray([1.0]))
        np.testing.assert_allclose(
            np.asarray(wct_ops.wct_from_stats(jnp.asarray(fc), blended, 1.0)),
            np.asarray(wct_ops.wct_from_stats(jnp.asarray(fc), s, 1.0)),
            atol=1e-6,
        )


class TestStyleStatsCache:
    def test_cached_stats_equal_direct(self, rng):
        fc, fs = _feat(rng, c=8), _feat(rng, h=9, w=7, c=8)
        stats = wct_ops.style_stats(jnp.asarray(fs))
        via_cache = wct_ops.wct_from_stats(jnp.asarray(fc), stats, 0.7)
        direct = wct_ops.wct(jnp.asarray(fc), jnp.asarray(fs), 0.7)
        np.testing.assert_array_equal(np.asarray(via_cache), np.asarray(direct))


class TestTruncModeGuards:
    """The three truncation overrides are exclusive, eigh-only modes.

    VERDICT r3 items 5/6 + ADVICE r3: requesting a spectrum mask
    (trunc_topk / rel_trunc) on a Newton–Schulz path must raise — NS
    has no mask, so silently dropping the knob would hand a
    fidelity-gate author a wrong-but-plausible comparison.
    """

    def test_topk_with_newton_schulz_raises(self, rng):
        fc = _feat(rng, c=12)
        fs = _feat(rng, h=9, w=7, c=12)
        with pytest.raises(ValueError, match="trunc_topk requires"):
            wct_ops.wct(
                jnp.asarray(fc), jnp.asarray(fs), 0.8,
                method="newton_schulz", trunc_topk=(8, 8),
            )

    def test_topk_with_auto_resolving_to_ns_raises(self, rng):
        # auto picks NS above 64 channels: the RESOLVED method governs.
        fc = _feat(rng, h=12, w=12, c=96)
        fs = _feat(rng, h=12, w=12, c=96)
        with pytest.raises(ValueError, match="trunc_topk requires"):
            wct_ops.wct(
                jnp.asarray(fc), jnp.asarray(fs), 0.8,
                method="auto", trunc_topk=(40, 40),
            )

    def test_rel_trunc_with_newton_schulz_raises(self, rng):
        fc = _feat(rng, c=12)
        fs = _feat(rng, h=9, w=7, c=12)
        with pytest.raises(ValueError, match="rel_trunc requires"):
            wct_ops.wct(
                jnp.asarray(fc), jnp.asarray(fs), 0.8,
                method="newton_schulz_fast", rel_trunc=1e-3,
            )

    def test_trunc_modes_mutually_exclusive(self, rng):
        fc = _feat(rng, c=12)
        fs = _feat(rng, h=9, w=7, c=12)
        with pytest.raises(ValueError, match="mutually exclusive"):
            wct_ops.wct(
                jnp.asarray(fc), jnp.asarray(fs), 0.8,
                soft_trunc=True, rel_trunc=1e-3,
            )
        with pytest.raises(ValueError, match="mutually exclusive"):
            wct_ops.wct(
                jnp.asarray(fc), jnp.asarray(fs), 0.8,
                soft_trunc=True, trunc_topk=(8, 8),
            )

    def test_rel_trunc_range_validated(self, rng):
        fc = _feat(rng, c=12)
        fs = _feat(rng, h=9, w=7, c=12)
        for bad in (0.0, 1.0, -1e-3, 2.0):
            with pytest.raises(ValueError, match="rel_trunc must be"):
                wct_ops.wct(
                    jnp.asarray(fc), jnp.asarray(fs), 0.8, rel_trunc=bad
                )

    def test_topk_beyond_numerical_rank_stays_psd(self, rng):
        """ADVICE r3: a caller-supplied k past the f32 numerical rank
        must not send negative noise eigenvalues through s^{-1/2}
        unguarded (sign-flipped/huge whitening modes). The floored
        branch keeps the kernel finite and PSD."""
        fc = _feat(rng, h=4, w=3, c=24)  # rank ≤ 11 of 24
        kern, _ = wct_ops.whitening_kernel(
            jnp.asarray(fc), trunc_topk=20
        )
        k = np.asarray(kern, np.float64)
        assert np.all(np.isfinite(k))
        np.testing.assert_allclose(k, k.T, atol=1e-3)
        evals = np.linalg.eigvalsh((k + k.T) / 2)
        assert evals.min() > -1e-3, evals.min()


class TestRelTrunc:
    """rel_trunc: the cross-solver-reproducible relative threshold
    (VERDICT r3 item 5 — productized from scripts/exp_matched_mask.py,
    where the keep mask measured BIT-IDENTICAL between f32 eigh and the
    float64 oracle with no forcing)."""

    REL = 1e-3

    def _oracle(self, fc, fs, alpha, rel, eps=1e-8):
        h, w, c = fc.shape
        fc_flat = fc.reshape(-1, c).astype(np.float64)
        fs_flat = fs.reshape(-1, c).astype(np.float64)

        def sym_pow(f_flat, power):
            mu = f_flat.mean(0)
            centered = f_flat - mu
            cov = centered.T @ centered / (f_flat.shape[0] - 1) + eps * np.eye(c)
            s, u = np.linalg.eigh(cov)
            s_pow = np.where(s > rel * s.max(), np.abs(s) ** power, 0.0)
            return (u * s_pow) @ u.T, mu, s

        w_c, mu_c, s_c = sym_pow(fc_flat, -0.5)
        k_s, mu_s, s_s = sym_pow(fs_flat, +0.5)
        colored = (fc_flat - mu_c) @ w_c @ k_s + mu_s
        out = alpha * colored + (1 - alpha) * fc_flat
        return out.reshape(h, w, c), s_c, s_s

    def test_matches_hard_when_well_conditioned(self, rng):
        # Random full-rank Gram: every eigenvalue clears both 1e-5 and
        # 1e-3·s_max, so relative == absolute masking.
        fc = _feat(rng, c=8, scale=1.5)
        fs = _feat(rng, h=9, w=7, c=8, scale=2.0)
        hard = np.asarray(wct_ops.wct(jnp.asarray(fc), jnp.asarray(fs), 0.8))
        rel = np.asarray(wct_ops.wct(
            jnp.asarray(fc), jnp.asarray(fs), 0.8, rel_trunc=self.REL
        ))
        np.testing.assert_allclose(hard, rel, atol=1e-5, rtol=1e-5)

    def test_mask_bit_identical_across_solvers_rank_deficient(self, rng):
        """THE productized claim: on rank-deficient features the
        relative mask's keep-COUNT is identical between the f32
        production Gram/eigh and the float64 oracle — no forcing —
        because the cut lands in a well-separated part of the spectrum
        instead of inside the f32 noise cloud (where the absolute 1e-5
        threshold measurably flips)."""
        fc = _feat(rng, h=4, w=3, c=24, scale=1.5)  # rank ≤ 11
        fs = _feat(rng, h=4, w=3, c=24, scale=2.0, shift=0.3)
        for f in (fc, fs):
            flat64 = f.reshape(-1, 24).astype(np.float64)
            mu = flat64.mean(0)
            cen = flat64 - mu
            cov64 = cen.T @ cen / (flat64.shape[0] - 1) + 1e-8 * np.eye(24)
            s64 = np.linalg.eigvalsh(cov64)
            cov32, _ = wct_ops._gram(jnp.asarray(f.reshape(-1, 24)))
            cov32 = cov32 + 1e-8 * jnp.eye(24)
            s32 = np.asarray(jnp.linalg.eigh(cov32)[0])
            k64 = int((s64 > self.REL * s64.max()).sum())
            k32 = int((s32 > self.REL * s32.max()).sum())
            assert k64 == k32, (k64, k32)
            # ... and the absolute threshold's count DOES straddle the
            # noise cloud here (sanity that this input exercises the
            # failure mode rel_trunc removes): near-null f32 eigenvalues
            # exist below the relative cut.
            assert (np.abs(s32) < self.REL * s32.max()).sum() > 0

    def test_matches_float64_oracle_rank_deficient(self, rng):
        fc = _feat(rng, h=4, w=3, c=24, scale=1.5)
        fs = _feat(rng, h=4, w=3, c=24, scale=2.0, shift=0.3)
        ours = np.asarray(wct_ops.wct(
            jnp.asarray(fc), jnp.asarray(fs), 0.8, rel_trunc=self.REL
        ))
        ref, s_c, s_s = self._oracle(fc, fs, 0.8, self.REL)
        # No forcing on either side — agreement here is exactly the
        # cross-solver reproducibility rel_trunc exists to provide.
        np.testing.assert_allclose(ours, ref, atol=5e-3, rtol=5e-3)

    def test_alpha_zero_identity(self, rng):
        fc = _feat(rng, h=4, w=3, c=24)
        fs = _feat(rng, h=4, w=3, c=24)
        out = wct_ops.wct(
            jnp.asarray(fc), jnp.asarray(fs), 0.0, rel_trunc=self.REL
        )
        np.testing.assert_allclose(np.asarray(out), fc, atol=1e-4)

    def test_grouped_rel_trunc_runs(self, rng):
        fc = _feat(rng, c=16)
        fs = _feat(rng, h=9, w=7, c=16)
        out = wct_ops.wct(
            jnp.asarray(fc), jnp.asarray(fs), 0.8, groups=2,
            rel_trunc=self.REL,
        )
        assert np.all(np.isfinite(np.asarray(out)))

    def test_whiten_color_kernels_rel(self, rng):
        """swap5's one-decomposition path honors rel_trunc: kernels
        match the separate whitening/style calls."""
        f = _feat(rng, h=4, w=3, c=24, scale=1.5)
        inv, sq, mu = wct_ops.whiten_color_kernels(
            jnp.asarray(f), rel_trunc=self.REL
        )
        w_k, mu_w = wct_ops.whitening_kernel(
            jnp.asarray(f), rel_trunc=self.REL
        )
        stats = wct_ops.style_stats(jnp.asarray(f), rel_trunc=self.REL)
        np.testing.assert_allclose(
            np.asarray(inv), np.asarray(w_k), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(sq), np.asarray(stats.kernel), atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(mu), np.asarray(mu_w))
