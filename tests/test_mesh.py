"""Data-parallel sharding tests on an 8-virtual-device CPU mesh (§4.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wct_tpu.models import cascade
from wct_tpu.parallel import mesh as mesh_lib

KEY = jax.random.PRNGKey(0)
SIZE = 32


@pytest.fixture(scope="module")
def setup():
    params = cascade.init_params(KEY)
    rng = np.random.default_rng(11)
    content = rng.random((8, SIZE, SIZE, 3), np.float32)
    style = rng.random((SIZE, SIZE, 3), np.float32)
    cfg = cascade.CascadeConfig(relu_targets=("relu2_1", "relu1_1"))
    cache = cascade.precompute_style(params["encoder"], jnp.asarray(style), cfg)
    return params, content, cache, cfg


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_sharded_matches_single_device(setup):
    params, content, cache, cfg = setup
    mesh = mesh_lib.create_mesh()
    sharded_in = mesh_lib.shard_batch(jnp.asarray(content), mesh)
    out_sharded = mesh_lib.stylize_sharded(
        params, sharded_in, cache, 0.7, cfg, mesh
    )
    out_single = cascade.stylize(params, jnp.asarray(content), cache, 0.7, cfg)
    # DP must not change the math: per-image work is independent.
    np.testing.assert_allclose(
        np.asarray(out_sharded), np.asarray(out_single), atol=1e-5
    )


def test_output_sharding_is_batch_split(setup):
    params, content, cache, cfg = setup
    mesh = mesh_lib.create_mesh()
    out = mesh_lib.stylize_sharded(
        params, mesh_lib.shard_batch(jnp.asarray(content), mesh), cache, 1.0, cfg, mesh
    )
    # Each device holds exactly its batch shard.
    shard_shapes = {s.data.shape for s in out.addressable_shards}
    assert shard_shapes == {(1, SIZE, SIZE, 3)}
