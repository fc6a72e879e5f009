"""Engine routing by measured distance concentration (utils/router.py).

Pins the measured regime boundary from docs/PERF.md: 128d uniform data
(where graphs plateau at 0.80 recall) must route to flat; clustered
SIFT-like data (graphs at 0.99+) must route to the graph engine.
"""
import numpy as np

from zvdb_tpu.utils.router import relative_contrast, suggest_engine


def test_uniform_routes_to_flat():
    rng = np.random.default_rng(0)
    x = rng.random((20000, 128), dtype=np.float32)   # the reference workload
    eng, rc = suggest_engine(x)
    assert eng == "flat" and rc < 1.5, (eng, rc)


def test_clustered_routes_to_graph():
    rng = np.random.default_rng(1)
    centers = rng.standard_normal((200, 128)).astype(np.float32)
    x = (centers[rng.integers(0, 200, 20000)]
         + 0.15 * rng.standard_normal((20000, 128))).astype(np.float32)
    eng, rc = suggest_engine(x)
    assert eng == "cagra" and rc > 2.0, (eng, rc)


def test_gaussian_highdim_routes_to_flat():
    # isotropic gaussian at high dim concentrates too (the "hardest" query
    # protocol in the bench harness)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((20000, 256)).astype(np.float32)
    eng, rc = suggest_engine(x)
    assert eng == "flat", (eng, rc)


def test_tiny_corpus_defaults_to_graphable():
    eng, rc = suggest_engine(np.zeros((4, 8), np.float32))
    assert rc == float("inf") and eng == "cagra"
