"""Compiled-graph regression tests (SURVEY.md §4.5).

The north star requires the whole cascade to be ONE device program: no
host round-trips (the reference bounced to CPU for tf.svd). These
tests inspect the lowered/compiled HLO for host-transfer constructs
(infeed/outfeed/host callbacks). CPU lowering legitimately contains
LAPACK custom-calls for eigh — on TPU eigh lowers on-device — so the
check targets callback/infeed machinery, which would appear on ANY
backend if someone slipped a host dependency into the graph.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from functools import partial

from wct_tpu.models import cascade

FORBIDDEN = ("infeed", "outfeed", "python_callback", "PythonCallback", "xla_ffi_python")


@pytest.fixture(scope="module")
def lowered_text():
    params = cascade.init_params(jax.random.PRNGKey(0))
    cfg = cascade.CascadeConfig(relu_targets=("relu2_1", "relu1_1"))
    rng = np.random.default_rng(0)
    style = jnp.asarray(rng.random((32, 32, 3), np.float32))
    cache = cascade.precompute_style(params["encoder"], style, cfg)
    content = jnp.asarray(rng.random((2, 32, 32, 3), np.float32))
    lowered = jax.jit(partial(cascade.stylize_fn, cfg=cfg)).lower(
        params, content, cache, jnp.float32(0.8)
    )
    return lowered.as_text()


def test_no_host_transfers_in_cascade(lowered_text):
    for token in FORBIDDEN:
        assert token not in lowered_text, f"host construct {token!r} in HLO"


def test_single_program(lowered_text):
    # The whole multi-level cascade lowers to one module (one program
    # dispatch per frame/batch — the reference needed one sess.run plus
    # up to 10 hidden host SVD round-trips).
    assert lowered_text.count("module @") <= 1


def test_newton_schulz_cascade_also_clean():
    params = cascade.init_params(jax.random.PRNGKey(0))
    cfg = cascade.CascadeConfig(
        relu_targets=("relu2_1", "relu1_1"), method="newton_schulz"
    )
    rng = np.random.default_rng(0)
    style = jnp.asarray(rng.random((32, 32, 3), np.float32))
    cache = cascade.precompute_style(params["encoder"], style, cfg)
    content = jnp.asarray(rng.random((1, 32, 32, 3), np.float32))
    text = (
        jax.jit(partial(cascade.stylize_fn, cfg=cfg))
        .lower(params, content, cache, jnp.float32(0.8))
        .as_text()
    )
    for token in FORBIDDEN:
        assert token not in text
    # NS path must not even contain an eigh (it's pure matmuls).
    assert "Eigh" not in text and "eigh" not in text
