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

# persistent compile cache — repeated pytest runs skip recompilation. The
# cache lives IN THE REPO (.cache/jax_cpu, gitignored), not /tmp: /tmp is
# wiped between rounds, which made every first suite run pay the full
# ~34-min cold-compile wall (utils/cache.py). CPU tests use their OWN cache
# dir: sharing one dir with TPU bench processes produced a corrupt entry
# that segfaulted the reader (jax compilation_cache get_executable_and_time)
# when both ran concurrently.
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_cache = os.path.join(_repo, ".cache", "jax_cpu")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_live_executables():
    """Free compiled executables between test modules.

    A single pytest process accumulates hundreds of XLA CPU executables; at
    ~module 19 of 26 the NEXT compile segfaults inside XLA
    (backend_compile_and_load — reproduced 3/3 on this image, same test,
    cold or warm persistent cache, while the same module passes in a fresh
    process). Dropping executable references between modules keeps the
    process below the crash threshold; the persistent compile cache makes
    re-compiles cheap."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
