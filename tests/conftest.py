"""Test configuration: run all tests on a virtual 8-device CPU mesh.

The real TPU chip is reserved for bench runs; tests must be hermetic and
exercise multi-device sharding, so we force the host platform with 8 virtual
devices before JAX initializes (SURVEY.md §4 test strategy).
"""

import os

# The axon TPU-tunnel sitecustomize imports jax at interpreter startup, which
# latches JAX_PLATFORMS=axon from the env before this file runs. Setting
# os.environ here is too late — flip the already-imported config flag instead.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8, (
    f"tests need 8 virtual CPU devices, got {jax.devices()}")

# persistent compile cache: the suite re-jits the same CPU programs every
# run; the cache (shared with the CLI entry points) cuts repeat runs a lot
from egtr_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
