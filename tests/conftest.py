"""Test harness: force an 8-virtual-device CPU platform BEFORE jax loads.

The multi-device tests run on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``) — the TPU-world
equivalent of a fake backend (SURVEY.md §4.4). Must run before any
``import jax`` anywhere in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the env var; the config update is what
# actually pins the platform.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
