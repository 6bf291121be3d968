"""Bucketed-serving tests: exact output sizes, bounded compile count."""

import jax
import numpy as np
import pytest

from wct_tpu.models import cascade
from wct_tpu.utils import serving


def test_bucket_shape():
    assert serving.bucket_shape(500, 513, 128) == (512, 640)
    assert serving.bucket_shape(128, 128, 128) == (128, 128)
    assert serving.bucket_shape(1, 1, 128) == (128, 128)


def test_pad_to_bucket_roundtrip(rng):
    img = rng.random((50, 70, 3)).astype(np.float32)
    padded, (h, w) = serving.pad_to_bucket(img, 64)
    assert padded.shape == (64, 128, 3)
    np.testing.assert_array_equal(padded[:h, :w], img)


class TestBucketedStylizer:
    @pytest.fixture(scope="class")
    def engine(self):
        params = cascade.init_params(jax.random.PRNGKey(0))
        cfg = cascade.CascadeConfig(relu_targets=("relu2_1", "relu1_1"))
        eng = serving.BucketedStylizer(params, cfg, granularity=32)
        rng = np.random.default_rng(1)
        eng.set_style(rng.random((32, 32, 3)).astype(np.float32))
        return eng

    def test_exact_output_sizes(self, engine, rng):
        for shape in [(30, 40), (32, 32), (33, 61)]:
            img = rng.random(shape + (3,)).astype(np.float32)
            out = engine.stylize(img, 0.7)
            assert out.shape == shape + (3,)
            assert np.isfinite(out).all()

    def test_same_bucket_reuses_compiled_program(self, engine, rng):
        n0 = cascade.stylize._cache_size()
        engine.stylize(rng.random((20, 25, 3)).astype(np.float32))
        n1 = cascade.stylize._cache_size()
        # (20,25) and (30,17) both bucket to (32,32): no new trace.
        engine.stylize(rng.random((30, 17, 3)).astype(np.float32))
        assert cascade.stylize._cache_size() == n1
        assert n1 >= n0

    def test_no_style_raises(self, rng):
        params = cascade.init_params(jax.random.PRNGKey(0))
        eng = serving.BucketedStylizer(
            params, cascade.CascadeConfig(relu_targets=("relu1_1",))
        )
        with pytest.raises(RuntimeError, match="no style"):
            eng.stylize(rng.random((16, 16, 3)).astype(np.float32))
