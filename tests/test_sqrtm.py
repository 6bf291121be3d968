"""Newton–Schulz matrix-sqrt tests: NS vs eigh oracle, Pallas vs XLA."""

import jax.numpy as jnp
import numpy as np
import pytest

from wct_tpu.ops import sqrtm


def _spd(rng, c, cond=100.0):
    """Random SPD matrix with controlled condition number."""
    q, _ = np.linalg.qr(rng.standard_normal((c, c)))
    eigs = np.geomspace(1.0, 1.0 / cond, c)
    return (q * eigs) @ q.T


@pytest.mark.parametrize("c", [16, 64])
def test_ns_matches_eigh(rng, c):
    a = _spd(rng, c).astype(np.float32)
    sq, isq = sqrtm.newton_schulz_sqrtm(jnp.asarray(a), num_iters=30, reg=0.0)
    np.testing.assert_allclose(
        np.asarray(sq) @ np.asarray(sq), a, atol=1e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(sq) @ np.asarray(isq), np.eye(c), atol=5e-3
    )


def test_ns_regularization_floors_spectrum(rng):
    # Nearly singular input: with reg the inverse sqrt must stay finite.
    a = _spd(rng, 16, cond=1e10).astype(np.float32)
    sq, isq = sqrtm.newton_schulz_sqrtm(jnp.asarray(a), reg=1e-4)
    assert np.all(np.isfinite(np.asarray(sq)))
    assert np.all(np.isfinite(np.asarray(isq)))


@pytest.mark.parametrize("c", [64, 128])
def test_pallas_matches_xla(rng, c):
    # c=64 also exercises the lane-dim padding path (pads to 128).
    a = _spd(rng, c).astype(np.float32)
    sq_x, isq_x = sqrtm.newton_schulz_sqrtm(jnp.asarray(a), use_pallas=False)
    sq_p, isq_p = sqrtm.newton_schulz_sqrtm(jnp.asarray(a), use_pallas=True)
    np.testing.assert_allclose(np.asarray(sq_x), np.asarray(sq_p), atol=1e-4)
    np.testing.assert_allclose(np.asarray(isq_x), np.asarray(isq_p), atol=1e-3)


def test_wct_newton_schulz_method_close_to_eigh(rng):
    from wct_tpu.ops import wct as wct_ops

    fc = rng.standard_normal((12, 10, 16)).astype(np.float32)
    fs = (rng.standard_normal((9, 8, 16)) * 2 + 1).astype(np.float32)
    out_eigh = wct_ops.wct(jnp.asarray(fc), jnp.asarray(fs), 1.0, method="eigh")
    out_ns = wct_ops.wct(
        jnp.asarray(fc), jnp.asarray(fs), 1.0, method="newton_schulz"
    )
    # NS floors the spectrum instead of truncating → close, not equal.
    np.testing.assert_allclose(
        np.asarray(out_eigh), np.asarray(out_ns), atol=0.05, rtol=0.05
    )
