"""Test configuration: force an 8-device CPU mesh before JAX initialises.

Multi-device sharding tests run on virtual CPU devices (the standard JAX
fake-cluster trick); Pallas kernels run in interpreter mode on CPU.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: harness may preset 'axon'
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The axon sitecustomize re-registers the TPU backend regardless of the env
# var, so force the platform through jax.config (before first backend use).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
