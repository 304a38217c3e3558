"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is unavailable in CI; sharding paths are validated on
XLA's host-platform virtual devices instead.
"""

import os

# The harness presets JAX_PLATFORMS=axon (the TPU tunnel) and a sitecustomize
# imports jax at interpreter startup, freezing that choice into jax.config
# before this conftest runs. Override through the config API, not env vars.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older jax: the XLA_FLAGS path above covers it

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
