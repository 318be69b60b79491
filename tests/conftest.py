"""Test configuration: run all tests on a virtual 8-device CPU mesh.

The real TPU chip is reserved for bench runs; tests must be hermetic and
exercise multi-device sharding, so we force the host platform with 8 virtual
devices before JAX initializes (SURVEY.md §4 test strategy).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
