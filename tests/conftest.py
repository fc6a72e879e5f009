"""Test configuration: force an 8-virtual-device CPU backend.

Multi-chip hardware is unavailable in CI; sharding is validated on a virtual
CPU mesh (XLA host-platform device count), the standard way to test pjit
meshes without a pod (SURVEY.md §4).
"""
import os

# The environment pins JAX_PLATFORMS=axon (the TPU tunnel); tests must override
# it, not setdefault. Set ZVDB_TEST_TPU=1 to run the suite on the real chip.
if not os.environ.get("ZVDB_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not os.environ.get("ZVDB_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

# persistent compile cache — repeated pytest runs skip recompilation
jax.config.update("jax_compilation_cache_dir", "/tmp/zvdb_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
