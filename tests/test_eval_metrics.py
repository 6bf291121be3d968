"""Fixed quality-protocol tests: pixel texture metrics + frozen evaluator.

The round-5 protocol's value rests on two properties asserted here:
(1) the metrics are genuine distances that order textures sensibly,
and (2) the frozen evaluator is bit-reproducible (fingerprint-pinned)
so cross-round numbers stay comparable.
"""

import numpy as np
import pytest

from wct_tpu.eval import frozen, texture


def _smooth(size=96):
    x, y = np.meshgrid(np.linspace(0, 1, size), np.linspace(0, 1, size))
    return np.stack([x, y, 0.5 * (x + y)], -1)


def _noise(size=96, seed=1):
    return np.random.default_rng(seed).random((size, size, 3))


def _stripes(size=96, period=6):
    x = np.arange(size)[None, :] * np.ones((size, 1))
    v = 0.5 + 0.5 * np.sin(2 * np.pi * x / period)
    return np.stack([v, v, v], -1)


class TestTextureMetrics:
    def test_self_distance_zero(self):
        img = _noise()
        d = texture.texture_distances(img, img)
        assert d["spectrum"] == 0.0
        assert d["color"] == 0.0
        assert d["contrast"] == 0.0
        assert d["pixel_agg"] == 0.0

    def test_symmetry(self):
        a, b = _smooth(), _noise()
        ab = texture.texture_distances(a, b)
        ba = texture.texture_distances(b, a)
        for k in ("spectrum", "color", "contrast"):
            assert ab[k] == pytest.approx(ba[k], rel=1e-12)

    def test_orders_texture_scale(self):
        """An output matching the style's texture scale must score
        closer than one at a very different scale."""
        fine = _stripes(period=4)
        fine2 = _stripes(period=4) * 0.98 + 0.01  # same scale, tiny shift
        coarse = _stripes(period=32)
        d_same = texture.spectrum_distance(fine2, fine)
        d_diff = texture.spectrum_distance(coarse, fine)
        assert d_same < d_diff / 5

    def test_color_emd_detects_palette_shift(self):
        img = _noise()
        shifted = np.clip(img + 0.2, 0, 1)
        assert texture.color_distance(img, img) == 0.0
        # EMD of a +0.2 shift (with clipping) ≈ 0.2 ballpark
        assert 0.1 < texture.color_distance(shifted, img) < 0.3

    def test_contrast_detects_flatness(self):
        busy = _noise()
        flat = np.full_like(busy, 0.5)
        assert texture.contrast_distance(flat, busy) > 10 * texture.contrast_distance(
            busy, busy
        )

    def test_smaller_style_image_works(self):
        # style image sized differently from the output is the norm
        out, style = _noise(96), _noise(64, seed=2)
        d = texture.texture_distances(out, style)
        assert all(np.isfinite(v) for v in d.values())


class TestFrozenEvaluator:
    def test_fingerprint_pinned(self):
        """Bit-reproducibility across platforms/versions — if this ever
        fails, the evaluator drifted and every historical number is
        suspect; investigate before touching the constant."""
        assert frozen.fingerprint() == frozen.FINGERPRINT

    def test_crelu_pairing_preserves_information(self):
        """relu(x) − relu(−x) = x: paired ± filters make the first conv
        lossless, the property that keeps deep random features alive."""
        import jax.numpy as jnp

        p = frozen.evaluator_params()
        w = np.asarray(p["conv1_1"]["w"])  # [3, 3, 3, 64]
        half = w.shape[-1] // 2
        np.testing.assert_allclose(w[..., :half], -w[..., half:], atol=0)
        # conv1_1's patch space (27) is smaller than its 32 pairs, so
        # its u has orthonormal ROWS (still injective). conv2_1
        # (576 ≥ 64) has orthonormal columns — assert there.
        w2 = np.asarray(p["conv2_1"]["w"])
        h2 = w2.shape[-1] // 2
        m = w2.reshape(-1, w2.shape[-1])[:, :h2]
        np.testing.assert_allclose(m.T @ m, np.eye(h2), atol=1e-5)
        del jnp

    def test_distance_zero_on_self_and_positive_otherwise(self):
        a, b = _noise(64), _stripes(64)
        st = frozen.gram_stats(b)
        assert frozen.gram_distance(b, st)["frozen_gram_rel"] == 0.0
        assert frozen.gram_distance(a, st)["frozen_gram_rel"] > 0.01

    def test_orders_textures(self):
        """Same-family textures score closer than cross-family ones."""
        s = _stripes(64, period=6)
        s_like = np.clip(_stripes(64, period=6) + 0.02 * _noise(64), 0, 1)
        other = _noise(64)
        st = frozen.gram_stats(s)
        d_like = frozen.gram_distance(s_like, st)["frozen_gram_rel"]
        d_other = frozen.gram_distance(other, st)["frozen_gram_rel"]
        assert d_like < d_other
