"""Round-4 pool generator (train/data.py v2 recipe) invariants.

The v2 generator backs the round-4 joint encoder training
(scripts/train_encoder.py); these tests pin the contract the trainer
and the finalize pipeline rely on: shape/dtype/range, seed
determinism (pool caching reuses a file generated elsewhere), and the
eval-photo exclusion that keeps the real-photo eval honest
(reference analogue: the MS-COCO train/val split, train.py:~80
(reconstructed)).
"""

import numpy as np
import pytest

from wct_tpu.train import data


def test_synthetic_image_v2_contract():
    rng = np.random.default_rng(3)
    photos = data._load_photos()
    for _ in range(8):  # cover several branch draws
        img = data.synthetic_image_v2(rng, 64, photos)
        assert img.shape == (64, 64, 3)
        assert img.dtype == np.float32
        assert np.isfinite(img).all()
        assert img.min() >= 0.0 and img.max() <= 1.0


def test_synthetic_image_v2_deterministic():
    photos = data._load_photos()
    a = [data.synthetic_image_v2(np.random.default_rng(11), 48, photos)
         for _ in range(3)]
    b = [data.synthetic_image_v2(np.random.default_rng(11), 48, photos)
         for _ in range(3)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_rich_pool_contract_and_determinism():
    p1 = data.rich_pool(6, 32, seed=5)
    p2 = data.rich_pool(6, 32, seed=5)
    assert p1.shape == (6, 32, 32, 3)
    assert p1.dtype == np.uint8
    np.testing.assert_array_equal(p1, p2)
    # different seeds actually differ
    p3 = data.rich_pool(6, 32, seed=6)
    assert not np.array_equal(p1, p3)
    # images within one pool differ (no accidental rng reuse)
    assert not np.array_equal(p1[0], p1[1])


def test_rich_pool_has_variety():
    """The v2 pool must not collapse to one generator branch: across a
    small pool, per-image statistics should span a wide range (plain v1
    plaids vs photo mosaics vs blurred composites differ strongly in
    gradient energy)."""
    pool = data.rich_pool(24, 48, seed=7).astype(np.float32) / 255.0
    grad = np.abs(np.diff(pool, axis=2)).mean(axis=(1, 2, 3))
    assert grad.max() / max(grad.min(), 1e-6) > 2.0


def test_train_photos_exclude_eval_photo():
    paths = data.train_photo_paths()
    for p in paths:
        assert "grace_hopper" not in str(p)


@pytest.mark.skipif(not data.train_photo_paths(),
                    reason="no bundled photos in this environment")
def test_load_photos_shapes():
    photos = data._load_photos()
    assert photos
    for ph in photos:
        assert ph.ndim == 3 and ph.shape[2] == 3
        assert ph.dtype == np.float32
        assert 0.0 <= ph.min() and ph.max() <= 1.0
