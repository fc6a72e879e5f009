"""Repo-local JAX compilation-cache location.

/tmp is wiped between benchmark rounds on this machine, so a /tmp cache dir
makes every driver run pay the full cold-compile wall (~20-30 s per program
through the remote compile service; the round-4 driver bench timed out on
exactly this). A cache inside the repo survives the wipe: warm runs of the
test suite and bench.py stay warm across sessions.

CPU and TPU caches are separate directories: sharing one dir between a TPU
bench process and the CPU test suite produced a corrupt entry that
segfaulted the reader (see tests/conftest.py).
"""
import os


def cache_dir(kind: str) -> str:
    """Return (and create) the persistent compile-cache dir for a backend
    kind ("tpu" or "cpu")."""
    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    d = os.path.join(root, ".cache", f"jax_{kind}")
    os.makedirs(d, exist_ok=True)
    return d


def setup_compile_cache(kind: str = "tpu") -> str:
    """Point JAX's persistent compilation cache at the repo-local dir."""
    import jax

    d = cache_dir(kind)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return d
