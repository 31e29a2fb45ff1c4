"""Test harness: run everything on a virtual 8-device CPU mesh so sharding
tests need no TPU hardware; correctness tests are device-agnostic."""
import os

# The image pre-sets JAX_PLATFORMS=axon (the TPU tunnel) and its sitecustomize
# imports jax at interpreter startup, so env vars alone are too late —
# jax.config.update is the reliable switch. Tests run on a virtual 8-device
# CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from hope_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
