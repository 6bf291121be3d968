"""Color-control tests: preserve_colors and CORAL (SURVEY.md §4.1)."""

import numpy as np

from wct_tpu.utils import colors


def test_ycc_roundtrip(rng):
    rgb = rng.random((8, 9, 3)).astype(np.float64)
    back = colors.ycc_to_rgb(colors.rgb_to_ycc(rgb))
    np.testing.assert_allclose(back, rgb, atol=1e-10)


def test_preserve_colors_keeps_chroma(rng):
    # Mid-range images so luma/chroma recombination stays in gamut
    # (clipping would otherwise legitimately perturb chroma).
    content = (0.4 + 0.2 * rng.random((8, 8, 3))).astype(np.float32)
    stylized = (0.4 + 0.2 * rng.random((8, 8, 3))).astype(np.float32)
    out = colors.preserve_colors_np(content, stylized)
    out_ycc = colors.rgb_to_ycc(out)
    content_ycc = colors.rgb_to_ycc(content)
    stylized_ycc = colors.rgb_to_ycc(stylized)
    # Chroma from content, luma from stylized (up to [0,1] clipping).
    np.testing.assert_allclose(out_ycc[..., 1:], content_ycc[..., 1:], atol=2e-2)
    np.testing.assert_allclose(out_ycc[..., 0], stylized_ycc[..., 0], atol=2e-2)


def test_preserve_colors_identity(rng):
    img = rng.random((6, 6, 3)).astype(np.float32)
    np.testing.assert_allclose(colors.preserve_colors_np(img, img), img, atol=1e-5)


def test_coral_matches_target_stats(rng):
    src = (rng.random((32, 32, 3)) * 0.5).astype(np.float32)
    tgt = (rng.random((32, 32, 3)) * 0.5 + 0.4).astype(np.float32)
    out = colors.coral_numpy(src, tgt)

    out_flat = out.reshape(-1, 3).astype(np.float64)
    tgt_flat = tgt.reshape(-1, 3).astype(np.float64)
    np.testing.assert_allclose(out_flat.mean(0), tgt_flat.mean(0), atol=2e-2)
    np.testing.assert_allclose(
        np.cov(out_flat, rowvar=False), np.cov(tgt_flat, rowvar=False), atol=2e-2
    )


def test_coral_identity(rng):
    img = (rng.random((16, 16, 3)) * 0.8 + 0.1).astype(np.float32)
    out = colors.coral_numpy(img, img)
    np.testing.assert_allclose(out, img, atol=1e-3)
