"""AdaIN unit tests: exact moment matching (SURVEY.md §4.1)."""

import jax.numpy as jnp
import numpy as np

from wct_tpu.ops import adain as adain_ops


def _feat(rng, h=12, w=10, c=8, scale=1.0, shift=0.0):
    return (rng.standard_normal((h, w, c)) * scale + shift).astype(np.float32)


def test_moments_match_style(rng):
    fc = _feat(rng, scale=3.0, shift=-2.0)
    fs = _feat(rng, h=9, w=7, scale=0.5, shift=4.0)
    out = np.asarray(adain_ops.adain(jnp.asarray(fc), jnp.asarray(fs), 1.0))
    np.testing.assert_allclose(
        out.mean((0, 1)), fs.mean((0, 1)), atol=1e-3
    )
    np.testing.assert_allclose(
        out.std((0, 1)), fs.std((0, 1)), atol=1e-2, rtol=1e-2
    )


def test_alpha_zero_identity(rng):
    fc, fs = _feat(rng), _feat(rng, h=9, w=7)
    out = adain_ops.adain(jnp.asarray(fc), jnp.asarray(fs), 0.0)
    np.testing.assert_allclose(np.asarray(out), fc, atol=1e-5)


def test_matches_numpy_oracle(rng):
    fc, fs = _feat(rng, scale=2.0), _feat(rng, h=9, w=7, shift=1.0)
    eps = adain_ops.DEFAULT_EPS
    mu_c, var_c = fc.mean((0, 1)), fc.var((0, 1))
    mu_s, var_s = fs.mean((0, 1)), fs.var((0, 1))
    oracle = np.sqrt(var_s + eps) * (fc - mu_c) / np.sqrt(var_c + eps) + mu_s
    out = np.asarray(adain_ops.adain(jnp.asarray(fc), jnp.asarray(fs), 1.0))
    np.testing.assert_allclose(out, oracle, atol=1e-4, rtol=1e-4)


def test_cached_stats_path(rng):
    fc, fs = _feat(rng), _feat(rng, h=9, w=7)
    stats = adain_ops.adain_stats(jnp.asarray(fs))
    a = adain_ops.adain_from_stats(jnp.asarray(fc), stats, 0.6)
    b = adain_ops.adain(jnp.asarray(fc), jnp.asarray(fs), 0.6)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
