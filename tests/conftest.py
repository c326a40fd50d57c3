"""Test harness config: run every test on 8 virtual CPU devices with x64
available, the idiomatic JAX way to test pjit/shard_map meshes without a TPU
pod (SURVEY.md section 4). Must run before jax is imported anywhere."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# jax may already have been imported (with a TPU plugin) by a sitecustomize
# hook before conftest runs; the config update wins over the captured env.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture
def rng():
    import numpy as np

    return np.random.default_rng(42)
