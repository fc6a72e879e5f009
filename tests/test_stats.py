"""Memory accounting / structure stats (reference benchmark.md:121-144 only
estimated memory overhead; we measure it)."""
import numpy as np

from zvdb_tpu import FlatConfig, FlatIndex, HNSW, HNSWConfig, IVFConfig, IVFIndex
from zvdb_tpu.utils.stats import index_stats


def test_hnsw_stats(rng):
    x = rng.standard_normal((2000, 16)).astype(np.float32)
    idx = HNSW(HNSWConfig(dim=16, m=8, build_batch=512))
    idx.build(x)
    s = index_stats(idx)
    assert s["n"] == 2000
    assert s["total_bytes"] > 0
    assert s["degree"]["isolated"] == 0
    assert s["degree"]["max"] <= 16  # m0 = 2m
    assert len(s["levels_hist"]) >= 1
    assert s["overhead_vs_raw"] > 0  # graph tables cost something


def test_ivf_stats(rng):
    x = rng.standard_normal((3000, 16)).astype(np.float32)
    idx = IVFIndex(IVFConfig(dim=16, n_clusters=16))
    idx.build(x)
    s = index_stats(idx)
    assert s["clusters"]["count"] >= 16
    assert 0.0 <= s["clusters"]["pad_waste"] < 1.0
    assert s["n"] == 3000


def test_flat_stats(rng):
    idx = FlatIndex(FlatConfig(dim=8), capacity=100)
    idx.add(rng.standard_normal((50, 8)).astype(np.float32))
    s = index_stats(idx)
    assert s["n"] == 50 and s["total_bytes"] > 0
