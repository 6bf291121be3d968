"""Unit tests for ops/reductions (batch-stable sum helpers).

Numeric parity with numpy oracles on the CPU backend; the TPU-path
bitwise-stability property itself is gated on-device by
``bench/tpu_sanity.py`` checks 6–7 (it cannot be observed on CPU,
where the helpers intentionally dispatch to plain reductions).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from wct_tpu.ops import reductions


@pytest.fixture
def x(rng):
    return (rng.standard_normal((37, 16)) * 3 + 1).astype(np.float32)


class TestReductions:
    def test_sum0_mean0(self, x):
        np.testing.assert_allclose(
            np.asarray(reductions.sum0(jnp.asarray(x))), x.sum(0), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(reductions.mean0(jnp.asarray(x))), x.mean(0), rtol=1e-6
        )

    def test_moments0_two_pass_accuracy(self, rng):
        # Large mean, small variance: the E[x²]−μ² shortcut would lose
        # most significant digits; two-pass must not.
        base = rng.standard_normal((64, 8)).astype(np.float32)
        shifted = base * 1e-2 + 1e3
        mu, var = reductions.moments0(jnp.asarray(shifted))
        np.testing.assert_allclose(np.asarray(mu), shifted.mean(0), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(var), shifted.astype(np.float64).var(0), rtol=1e-2
        )

    def test_vecmat(self, x, rng):
        v = rng.standard_normal(37).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(reductions.vecmat(jnp.asarray(v), jnp.asarray(x))),
            v @ x, rtol=1e-5,
        )

    def test_gram0(self, x):
        np.testing.assert_allclose(
            np.asarray(reductions.gram0(jnp.asarray(x))), x.T @ x, rtol=1e-5
        )

    def test_gram0_batched(self, rng):
        xg = rng.standard_normal((3, 21, 8)).astype(np.float32)
        got = np.asarray(reductions.gram0_batched(jnp.asarray(xg)))
        want = np.einsum("gnc,gnd->gcd", xg, xg)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_trace_inf_norm(self, rng):
        a = rng.standard_normal((24, 24)).astype(np.float32)
        np.testing.assert_allclose(
            float(reductions.trace(jnp.asarray(a))), np.trace(a), rtol=1e-6
        )
        np.testing.assert_allclose(
            float(reductions.inf_norm(jnp.asarray(a))),
            np.abs(a).sum(1).max(), rtol=1e-6,
        )


class TestGramPallas:
    """Interpret-mode logic tests of the Pallas centered-Gram kernel
    (the on-TPU determinism + perf measurements live in its docstring
    and bench/tpu_sanity.py)."""

    @pytest.mark.parametrize(
        "n,c", [(132, 512), (1000, 64), (4096, 128), (7, 256)]
    )
    def test_matches_numpy(self, rng, n, c):
        from wct_tpu.ops import gram_pallas

        x = (rng.standard_normal((n, c)) * 2 + 0.5).astype(np.float32)
        cov, mean = gram_pallas.centered_gram(jnp.asarray(x), interpret=True)
        mu = x.mean(0)
        want = (x - mu).T @ (x - mu)
        np.testing.assert_allclose(np.asarray(mean), mu, rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(cov), want, rtol=2e-4, atol=2e-3)

    def test_matches_wct_gram_semantics(self, rng):
        # cov/(n−1) must equal ops.wct._gram's covariance.
        from wct_tpu.ops import gram_pallas
        from wct_tpu.ops import wct as wct_ops

        x = rng.standard_normal((90, 32)).astype(np.float32)
        cov_p, mean_p = gram_pallas.centered_gram(jnp.asarray(x), interpret=True)
        cov_x, mean_x = wct_ops._gram(jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(cov_p) / (90 - 1), np.asarray(cov_x), rtol=2e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(mean_p), np.asarray(mean_x), rtol=1e-5, atol=1e-6
        )
