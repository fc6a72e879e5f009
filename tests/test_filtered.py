"""Filtered (allowlist) search contract tests.

Production vector DBs filter ANN results by a predicate over ids (FAISS
IDSelector / Qdrant payload filters). zvdb-tpu reuses the delete plumbing:
the allowlist complement rides the same mask the tombstones use, so beams
keep routing through non-matching nodes and results contain only listed
ids. The flat engine is exact at any selectivity; graph/IVF engines filter
their ef-/probe-wide candidate pools (raise ef/nprobe for selective
filters).
"""
import numpy as np
import pytest

from zvdb_tpu import (
    CagraConfig, CagraIndex, FlatConfig, FlatIndex, HNSW, HNSWConfig,
    IVFConfig, IVFIndex,
)


def clustered(n, d, seed, nc=50):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((nc, d)).astype(np.float32)
    a = rng.integers(0, nc, n)
    return (centers[a] + 0.15 * rng.standard_normal((n, d))).astype(np.float32)


def _only_allowed(ids, allow_set):
    flat = np.asarray(ids).ravel()
    return set(flat[flat >= 0]) <= allow_set


def _gt_filtered(x, q, allow_ids, k):
    d2 = ((q[:, None, :] - x[None, allow_ids, :]) ** 2).sum(-1)
    return np.asarray(allow_ids)[np.argsort(d2, axis=1)[:, :k]]


def test_flat_filtered_exact_and_approx():
    n, d, k = 3000, 16, 5
    x = clustered(n, d, seed=30)
    q = x[:64] + 0.01
    allow = np.arange(0, n, 3)
    gt = _gt_filtered(x, q, allow, k)
    idx = FlatIndex(FlatConfig(dim=d))
    idx.add(x)
    for approx in (False, True):
        i = np.asarray(idx.search(q, k, approx=approx, allowed=allow)[1])
        assert _only_allowed(i, set(allow))
        hits = np.mean([len(set(i[r]) & set(gt[r])) / k for r in range(64)])
        assert hits >= (1.0 if not approx else 0.95)
    # bool-mask form == id-list form
    m = np.zeros(n, bool)
    m[allow] = True
    i2 = np.asarray(idx.search(q, k, allowed=m)[1])
    np.testing.assert_array_equal(
        i2, np.asarray(idx.search(q, k, allowed=allow)[1]))
    # filter composes with deletes
    idx.remove(allow[:10])
    i3 = np.asarray(idx.search(q, k, allowed=allow)[1])
    assert _only_allowed(i3, set(allow[10:]))
    with pytest.raises(IndexError):
        idx.search(q, k, allowed=[n + 1])


def test_flat_filtered_pca_path():
    n, d, k = 3000, 64, 5
    x = clustered(n, d, seed=31)
    q = x[:64] + 0.01
    allow = np.arange(0, n, 4)
    gt = _gt_filtered(x, q, allow, k)
    idx = FlatIndex(FlatConfig(dim=d, pca_dim=16, rerank=16))
    idx.add(x)
    i = np.asarray(idx.search(q, k, approx=True, allowed=allow)[1])
    assert _only_allowed(i, set(allow))
    hits = np.mean([len(set(i[r]) & set(gt[r])) / k for r in range(64)])
    assert hits >= 0.9


def test_cagra_filtered():
    n, d, k = 4000, 16, 5
    x = clustered(n, d, seed=32)
    q = x[:128] + 0.01
    allow = np.arange(0, n, 2)
    gt = _gt_filtered(x, q, allow, k)
    idx = CagraIndex(CagraConfig(dim=d, degree=16))
    idx.build(x)
    i = np.asarray(idx.search(q, k, ef_search=48, allowed=allow)[1])
    assert _only_allowed(i, set(allow))
    hits = np.mean([len(set(i[r]) & set(gt[r])) / k for r in range(128)])
    assert hits >= 0.9
    # unfiltered behavior unchanged afterwards
    i0 = np.asarray(idx.search(x[:64], 1, ef_search=32)[1])
    assert (i0[:, 0] == np.arange(64)).mean() >= 0.95


def test_hnsw_filtered():
    n, d, k = 4000, 16, 5
    x = clustered(n, d, seed=33)
    q = x[:128] + 0.01
    allow = np.arange(0, n, 2)
    gt = _gt_filtered(x, q, allow, k)
    idx = HNSW(HNSWConfig(dim=d, m=16, ef_construction=64))
    idx.build(x)
    i = np.asarray(idx.search(q, k, ef_search=48, allowed=allow)[1])
    assert _only_allowed(i, set(allow))
    hits = np.mean([len(set(i[r]) & set(gt[r])) / k for r in range(128)])
    assert hits >= 0.9


def test_ivf_filtered():
    n, d, k = 4000, 16, 5
    x = clustered(n, d, seed=34)
    q = x[:128] + 0.01
    allow = np.arange(0, n, 2)
    gt = _gt_filtered(x, q, allow, k)
    idx = IVFIndex(IVFConfig(dim=d, n_clusters=32))
    idx.build(x)
    i = np.asarray(idx.search(q, k, nprobe=8, allowed=allow)[1])
    assert _only_allowed(i, set(allow))
    hits = np.mean([len(set(i[r]) & set(gt[r])) / k for r in range(128)])
    assert hits >= 0.9


# ---------------------------------------------------------------------------
# sharded engines (8-virtual-device CPU mesh via conftest)


def test_sharded_filtered_all_engines():
    from zvdb_tpu.parallel.sharded import ShardedHNSW
    from zvdb_tpu.parallel.sharded_cagra import ShardedCagra
    from zvdb_tpu.parallel.sharded_flat import ShardedFlat
    from zvdb_tpu.parallel.sharded_ivf import ShardedIVF

    n, d, k = 2400, 16, 5
    x = clustered(n, d, seed=35)
    q = x[:96] + 0.01
    allow = np.arange(0, n, 2)
    allow_set = set(allow)
    gt = _gt_filtered(x, q, allow, k)

    engines = [
        (ShardedFlat(FlatConfig(dim=d)), dict(), 1.0),
        (ShardedCagra(CagraConfig(dim=d, degree=16)),
         dict(ef_search=48), 0.9),
        (ShardedHNSW(HNSWConfig(dim=d, m=16, ef_construction=48)),
         dict(ef_search=48), 0.9),
        (ShardedIVF(IVFConfig(dim=d, n_clusters=16)),
         dict(nprobe=8), 0.9),
    ]
    for idx, kw, floor in engines:
        idx.build(x)
        i = np.asarray(idx.search(q, k, allowed=allow, **kw)[1])
        assert _only_allowed(i, allow_set), type(idx).__name__
        hits = np.mean([len(set(i[r]) & set(gt[r])) / k for r in range(96)])
        assert hits >= floor, (type(idx).__name__, hits)
        # unfiltered search still fine afterwards
        i0 = np.asarray(idx.search(x[:32], 1, **kw)[1])
        assert (i0[:, 0] == np.arange(32)).mean() >= 0.9, type(idx).__name__


def test_filter_mode_scan_exact_at_low_selectivity():
    """Round-4 policy: graph/IVF filtered search defaults to the EXACT
    masked scan (measured on hardware: the beam path collapses to 0.358
    recall at 1% selectivity at ef=1200; the scan is exact and faster at
    every selectivity — docs/PERF.md). At 1% selectivity the default mode
    must be exact; filter_mode='beam'/'probe' keeps the old behavior."""
    n, d, k = 4000, 16, 5
    x = clustered(n, d, seed=35)
    q = x[:64] + 0.01
    rng = np.random.default_rng(35)
    allow = np.sort(rng.choice(n, n // 100, replace=False))  # 1%
    gt = _gt_filtered(x, q, allow, k)

    engines = [
        CagraIndex(CagraConfig(dim=d, degree=16)),
        HNSW(HNSWConfig(dim=d, m=16, ef_construction=64)),
        IVFIndex(IVFConfig(dim=d, n_clusters=32)),
        IVFIndex(IVFConfig(dim=d, n_clusters=32, dtype="int8", rerank=4)),
    ]
    for idx in engines:
        idx.build(x)
        i = np.asarray(idx.search(q, k, allowed=allow)[1])
        assert _only_allowed(i, set(allow)), type(idx).__name__
        hits = np.mean([len(set(i[r]) & set(gt[r])) / k for r in range(64)])
        assert hits >= 0.99, (type(idx).__name__, hits)
        # deletes compose with the scan filter
        idx.remove(allow[:2])
        i2 = np.asarray(idx.search(q, k, allowed=allow)[1])
        assert not np.isin(i2.ravel(), allow[:2]).any(), type(idx).__name__
    # explicit beam/probe modes still run (recall may be poor — by design)
    c = engines[0]
    ib = np.asarray(c.search(q, k, allowed=allow, ef_search=64,
                             filter_mode="beam")[1])
    assert _only_allowed(ib, set(allow))
    v = engines[2]
    ip = np.asarray(v.search(q, k, allowed=allow, nprobe=16,
                             filter_mode="probe")[1])
    assert _only_allowed(ip, set(allow))
    with pytest.raises(ValueError):
        c.search(q, k, allowed=allow, filter_mode="bogus")
    # int8 IVF WITHOUT a shadow store falls back to the probe path
    v8 = IVFIndex(IVFConfig(dim=d, n_clusters=32, dtype="int8", rerank=0))
    v8.build(x)
    i8 = np.asarray(v8.search(q, k, allowed=allow, nprobe=32)[1])
    assert _only_allowed(i8, set(allow))


def test_sharded_filter_mode_scan_exact():
    """Sharded engines: default filter_mode='scan' is EXACT at 1%
    selectivity (per-shard masked scan + global merge,
    parallel/scan_filter.py); 'beam'/'probe' modes still run."""
    from zvdb_tpu.parallel.sharded import ShardedHNSW
    from zvdb_tpu.parallel.sharded_cagra import ShardedCagra
    from zvdb_tpu.parallel.sharded_ivf import ShardedIVF

    n, d, k = 2400, 16, 5
    x = clustered(n, d, seed=36)
    q = x[:48] + 0.01
    rng = np.random.default_rng(36)
    allow = np.sort(rng.choice(n, n // 100, replace=False))
    gt = _gt_filtered(x, q, allow, k)
    allow_set = set(allow)

    engines = [
        (ShardedCagra(CagraConfig(dim=d, degree=16)), "beam"),
        (ShardedHNSW(HNSWConfig(dim=d, m=16, ef_construction=48)), "beam"),
        (ShardedIVF(IVFConfig(dim=d, n_clusters=16)), "probe"),
    ]
    for idx, alt in engines:
        idx.build(x)
        i = np.asarray(idx.search(q, k, allowed=allow)[1])
        assert _only_allowed(i, allow_set), type(idx).__name__
        hits = np.mean([len(set(i[r]) & set(gt[r])) / k for r in range(48)])
        assert hits >= 0.99, (type(idx).__name__, hits)
        # deletes compose
        idx.remove(allow[:2])
        i2 = np.asarray(idx.search(q, k, allowed=allow)[1])
        assert not np.isin(i2.ravel(), allow[:2]).any(), type(idx).__name__
        # alt mode runs and respects the allowlist (recall may be poor)
        ia = np.asarray(idx.search(q, k, allowed=allow,
                                   filter_mode=alt)[1])
        assert _only_allowed(ia, allow_set), type(idx).__name__
        with pytest.raises(ValueError):
            idx.search(q, k, allowed=allow, filter_mode="bogus")
