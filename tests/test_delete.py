"""Delete (remove/compact) contract tests.

The reference has NO delete (src/hnsw.zig:77 — dense sequential ids are safe
only because nothing is ever removed). zvdb-tpu adds mark-and-filter deletes:
  * remove(ids): tombstone; ids never renumber; freed slots are not reused;
    deleted ids can never appear in any search result.
  * graph engines keep tombstoned nodes as traversal waypoints (edges stay),
    so recall on the survivors does not collapse with delete fraction.
  * compact(): drops tombstones, renumbers survivors to [0, L) in former
    order, returns the survivors' old ids (new_id == position).
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


def _no_dead_in_results(ids, dead):
    flat = np.asarray(ids).ravel()
    return not np.isin(flat[flat >= 0], list(dead)).any()


# ---------------------------------------------------------------------------
# flat


def test_flat_remove_excludes_from_results():
    n, d = 2000, 16
    x = clustered(n, d, seed=1)
    idx = FlatIndex(FlatConfig(dim=d))
    idx.add(x)
    # self-query: every point returns itself at rank 0
    ids0 = np.asarray(idx.search(x[:200], 1)[1])
    assert (ids0[:, 0] == np.arange(200)).all()
    dead = set(range(0, 200, 2))
    assert idx.remove(sorted(dead)) == len(dead)
    assert len(idx) == n - len(dead)
    s, i = idx.search(x[:200], 5)
    assert _no_dead_in_results(i, dead)
    # survivors still return themselves
    alive = np.asarray([r for r in range(200) if r not in dead])
    ii = np.asarray(idx.search(x[alive], 1)[1])
    assert (ii[:, 0] == alive).all()
    # idempotent / bounds
    assert idx.remove(sorted(dead)) == 0
    with pytest.raises(IndexError):
        idx.remove([n + 5])
    with pytest.raises(IndexError):
        idx.get([next(iter(dead))])


def test_flat_remove_dot_metric_matches_oracle():
    n, d = 1000, 16
    x = clustered(n, d, seed=11)
    idx = FlatIndex(FlatConfig(dim=d, metric="dot"))
    idx.add(x)
    dead = set(range(0, n, 3))
    idx.remove(sorted(dead))
    q = x[:64]
    i = np.asarray(idx.search(q, 1)[1])
    dots = q @ x.T
    dots[:, sorted(dead)] = -np.inf
    np.testing.assert_array_equal(i[:, 0], dots.argmax(axis=1))


def test_flat_remove_approx_and_rerank_paths():
    n, d = 3000, 16
    x = clustered(n, d, seed=2)
    idx = FlatIndex(FlatConfig(dim=d, rerank=4))
    idx.add(x)
    dead = list(range(100))
    idx.remove(dead)
    i_ap = np.asarray(idx.search(x[:300], 10, approx=True)[1])
    assert _no_dead_in_results(i_ap, set(dead))


def test_flat_compact_renumbers_and_search_survives():
    n, d = 1500, 16
    x = clustered(n, d, seed=3)
    idx = FlatIndex(FlatConfig(dim=d))
    idx.add(x)
    dead = set(range(1, n, 7))
    idx.remove(sorted(dead))
    old_ids = idx.compact()
    assert len(idx) == n - len(dead)
    assert old_ids.shape == (n - len(dead),)
    assert not np.isin(old_ids, list(dead)).any()
    # new_id == position: searching an old vector finds its new id
    i = np.asarray(idx.search(x[old_ids[:128]], 1)[1])
    assert (i[:, 0] == np.arange(128)).all()
    # inserts after compact continue from the new count
    idx.add(x[:4] + 0.001)
    assert len(idx) == n - len(dead) + 4


def test_flat_delete_roundtrips_through_save(tmp_path):
    n, d = 800, 8
    x = clustered(n, d, seed=4)
    idx = FlatIndex(FlatConfig(dim=d))
    idx.add(x)
    idx.remove([0, 5, 9])
    p = str(tmp_path / "flat.npz")
    idx.save(p)
    back = FlatIndex.load(p)
    assert len(back) == len(idx)
    assert back._dead == {0, 5, 9}
    i = np.asarray(back.search(x[:64], 3)[1])
    assert _no_dead_in_results(i, {0, 5, 9})


# ---------------------------------------------------------------------------
# cagra


def test_cagra_remove_filters_results_and_survivors_stay_reachable():
    n, d = 4000, 16
    x = clustered(n, d, seed=5)
    idx = CagraIndex(CagraConfig(dim=d, degree=16))
    idx.build(x)
    dead = set(range(0, 400, 2))
    assert idx.remove(sorted(dead)) == len(dead)
    assert len(idx) == n - len(dead)
    i = np.asarray(idx.search(x[:400], 5, ef_search=32)[1])
    assert _no_dead_in_results(i, dead)
    alive = np.asarray([r for r in range(400) if r not in dead])
    ii = np.asarray(idx.search(x[alive], 1, ef_search=32)[1])
    assert (ii[:, 0] == alive).mean() >= 0.95   # waypoints keep routing
    with pytest.raises(IndexError):
        idx.get([0])
    # insert after delete: new ids continue past the high-water mark
    idx.insert(x[:3] + 0.001)
    i2 = np.asarray(idx.search((x[:3] + 0.001), 1, ef_search=32)[1])
    assert set(i2[:, 0]) == {n, n + 1, n + 2}


def test_cagra_compact_rebuilds_without_dead():
    n, d = 3000, 16
    x = clustered(n, d, seed=6)
    idx = CagraIndex(CagraConfig(dim=d, degree=16))
    idx.build(x)
    dead = set(range(0, n, 5))
    idx.remove(sorted(dead))
    old_ids = idx.compact()
    assert len(idx) == n - len(dead)
    assert not np.isin(old_ids, sorted(dead)).any()
    i = np.asarray(idx.search(x[old_ids[:256]], 1, ef_search=32)[1])
    assert (i[:, 0] == np.arange(256)).mean() >= 0.95


def test_cagra_delete_roundtrips_through_save(tmp_path):
    n, d = 2000, 16
    x = clustered(n, d, seed=7)
    idx = CagraIndex(CagraConfig(dim=d, degree=16))
    idx.build(x)
    idx.remove([1, 2, 3])
    p = str(tmp_path / "cagra.npz")
    idx.save(p)
    back = CagraIndex.load(p)
    assert back._dead == {1, 2, 3}
    assert len(back) == n - 3
    i = np.asarray(back.search(x[:64], 3, ef_search=32)[1])
    assert _no_dead_in_results(i, {1, 2, 3})


# ---------------------------------------------------------------------------
# hnsw


def test_hnsw_remove_filters_results_and_survivors_stay_reachable():
    n, d = 4000, 16
    x = clustered(n, d, seed=8)
    idx = HNSW(HNSWConfig(dim=d, m=16, ef_construction=64))
    idx.build(x)
    dead = set(range(0, 400, 2))
    assert idx.remove(sorted(dead)) == len(dead)
    assert len(idx) == n - len(dead)
    i = np.asarray(idx.search(x[:400], 5, ef_search=32)[1])
    assert _no_dead_in_results(i, dead)
    alive = np.asarray([r for r in range(400) if r not in dead])
    ii = np.asarray(idx.search(x[alive], 1, ef_search=32)[1])
    assert (ii[:, 0] == alive).mean() >= 0.95
    with pytest.raises(IndexError):
        idx.get([0])
    # insert continues past the high-water mark
    idx.insert(x[:2] + 0.001)
    i2 = np.asarray(idx.search(x[:2] + 0.001, 1, ef_search=32)[1])
    assert set(i2[:, 0]) == {n, n + 1}


def test_hnsw_compact_and_save_roundtrip(tmp_path):
    n, d = 2500, 16
    x = clustered(n, d, seed=9)
    idx = HNSW(HNSWConfig(dim=d, m=16, ef_construction=64))
    idx.build(x)
    idx.remove([0, 7, 11])
    p = str(tmp_path / "hnsw.npz")
    idx.save(p)
    back = HNSW.load(p)
    assert back._dead == {0, 7, 11}
    assert len(back) == n - 3
    i = np.asarray(back.search(x[:64], 3, ef_search=32)[1])
    assert _no_dead_in_results(i, {0, 7, 11})
    old_ids = back.compact()
    assert old_ids.shape == (n - 3,)
    i = np.asarray(back.search(x[old_ids[:128]], 1, ef_search=32)[1])
    assert (i[:, 0] == np.arange(128)).mean() >= 0.95


# ---------------------------------------------------------------------------
# ivf


def test_ivf_remove_filters_results_and_survivors_stay_reachable():
    n, d = 4000, 16
    x = clustered(n, d, seed=12)
    idx = IVFIndex(IVFConfig(dim=d, n_clusters=32))
    idx.build(x)
    dead = set(range(0, 400, 2))
    assert idx.remove(sorted(dead)) == len(dead)
    assert len(idx) == n - len(dead)
    i = np.asarray(idx.search(x[:400], 5, nprobe=8)[1])
    assert _no_dead_in_results(i, dead)
    alive = np.asarray([r for r in range(400) if r not in dead])
    ii = np.asarray(idx.search(x[alive], 1, nprobe=8)[1])
    assert (ii[:, 0] == alive).mean() >= 0.95
    with pytest.raises(IndexError):
        idx.get([0])
    # add after delete: ids continue; dead stays dead through the append
    idx.add(x[:2] + 0.001)
    i2 = np.asarray(idx.search(x[:2] + 0.001, 1, nprobe=8)[1])
    assert set(i2[:, 0]) == {n, n + 1}
    i3 = np.asarray(idx.search(x[:400], 5, nprobe=8)[1])
    assert _no_dead_in_results(i3, dead)


def test_ivf_delete_survives_repack_and_save(tmp_path):
    n, d = 1000, 16
    x = clustered(n, d, seed=13)
    idx = IVFIndex(IVFConfig(dim=d, n_clusters=16))
    idx.build(x)
    idx.remove(list(range(0, 50)))
    # force the overflow/repack path with a big append
    idx.add(clustered(3000, d, seed=14))
    idx.flush()
    i = np.asarray(idx.search(x[:100], 5, nprobe=8)[1])
    assert _no_dead_in_results(i, set(range(50)))
    assert len(idx) == n + 3000 - 50
    p = str(tmp_path / "ivf.npz")
    idx.save(p)
    back = IVFIndex.load(p)
    assert back._dead == set(range(50))
    i = np.asarray(back.search(x[:100], 5, nprobe=8)[1])
    assert _no_dead_in_results(i, set(range(50)))
    old_ids = back.compact()
    assert len(back) == n + 3000 - 50
    assert not np.isin(old_ids, np.arange(50)).any()


def test_ivf_remove_int8_rerank_path():
    n, d = 2000, 16
    x = clustered(n, d, seed=15)
    idx = IVFIndex(IVFConfig(dim=d, n_clusters=16, dtype="int8", rerank=4))
    idx.build(x)
    dead = list(range(0, 100))
    idx.remove(dead)
    i = np.asarray(idx.search(x[:200], 5, nprobe=8)[1])
    assert _no_dead_in_results(i, set(dead))


# ---------------------------------------------------------------------------
# sharded flat (8-virtual-device CPU mesh via conftest)


def test_sharded_flat_remove_and_roundtrip(tmp_path):
    from zvdb_tpu.parallel.sharded_flat import ShardedFlat

    n, d = 2000, 16
    x = clustered(n, d, seed=16)
    idx = ShardedFlat(FlatConfig(dim=d))
    idx.build(x)
    dead = set(range(0, 200, 2))
    assert idx.remove(sorted(dead)) == len(dead)
    assert len(idx) == n - len(dead)
    i = np.asarray(idx.search(x[:200], 5)[1])
    assert _no_dead_in_results(i, dead)
    alive = np.asarray([r for r in range(200) if r not in dead])
    ii = np.asarray(idx.search(x[alive], 1)[1])
    assert (ii[:, 0] == alive).all()
    p = str(tmp_path / "sf.npz")
    idx.save(p)
    back = ShardedFlat.load(p)
    assert back._dead == dead
    assert len(back) == n - len(dead)
    i = np.asarray(back.search(x[:200], 5)[1])
    assert _no_dead_in_results(i, dead)


# ---------------------------------------------------------------------------
# sharded graph + ivf engines (8-virtual-device CPU mesh via conftest)


def test_sharded_cagra_remove_and_roundtrip(tmp_path):
    from zvdb_tpu.parallel.sharded_cagra import ShardedCagra

    n, d = 3000, 16
    x = clustered(n, d, seed=17)
    idx = ShardedCagra(CagraConfig(dim=d, degree=16))
    idx.build(x)
    dead = set(range(0, 300, 3))
    assert idx.remove(sorted(dead)) == len(dead)
    assert len(idx) == n - len(dead)
    i = np.asarray(idx.search(x[:300], 5, ef_search=32)[1])
    assert _no_dead_in_results(i, dead)
    alive = np.asarray([r for r in range(300) if r not in dead])
    ii = np.asarray(idx.search(x[alive], 1, ef_search=32)[1])
    assert (ii[:, 0] == alive).mean() >= 0.9
    p = str(tmp_path / "sc.npz")
    idx.save(p)
    back = ShardedCagra.load(p)
    assert back._dead == dead
    i = np.asarray(back.search(x[:300], 5, ef_search=32)[1])
    assert _no_dead_in_results(i, dead)


def test_sharded_hnsw_remove_and_roundtrip(tmp_path):
    from zvdb_tpu.parallel.sharded import ShardedHNSW

    n, d = 3000, 16
    x = clustered(n, d, seed=18)
    idx = ShardedHNSW(HNSWConfig(dim=d, m=16, ef_construction=48))
    idx.build(x)
    dead = set(range(0, 300, 3))
    assert idx.remove(sorted(dead)) == len(dead)
    assert len(idx) == n - len(dead)
    i = np.asarray(idx.search(x[:300], 5, ef_search=32)[1])
    assert _no_dead_in_results(i, dead)
    alive = np.asarray([r for r in range(300) if r not in dead])
    ii = np.asarray(idx.search(x[alive], 1, ef_search=32)[1])
    assert (ii[:, 0] == alive).mean() >= 0.9
    p = str(tmp_path / "sh.npz")
    idx.save(p)
    back = ShardedHNSW.load(p)
    assert back._dead == dead
    i = np.asarray(back.search(x[:300], 5, ef_search=32)[1])
    assert _no_dead_in_results(i, dead)


def test_sharded_ivf_remove_append_and_roundtrip(tmp_path):
    from zvdb_tpu.parallel.sharded_ivf import ShardedIVF

    n, d = 2000, 16
    x = clustered(n, d, seed=19)
    idx = ShardedIVF(IVFConfig(dim=d, n_clusters=16))
    idx.build(x)
    dead = set(range(0, 200, 2))
    assert idx.remove(sorted(dead)) == len(dead)
    assert len(idx) == n - len(dead)
    i = np.asarray(idx.search(x[:200], 5, nprobe=8)[1])
    assert _no_dead_in_results(i, dead)
    alive = np.asarray([r for r in range(200) if r not in dead])
    ii = np.asarray(idx.search(x[alive], 1, nprobe=8)[1])
    assert (ii[:, 0] == alive).mean() >= 0.95
    # append path (converts to local ids + id_map) keeps tombstones dead
    idx.add(x[:4] + 0.001)
    i2 = np.asarray(idx.search(x[:200], 5, nprobe=8)[1])
    assert _no_dead_in_results(i2, dead)
    p = str(tmp_path / "si.npz")
    idx.save(p)
    back = ShardedIVF.load(p)
    assert back._dead == dead
    i = np.asarray(back.search(x[:200], 5, nprobe=8)[1])
    assert _no_dead_in_results(i, dead)


def test_remove_all_then_compact_then_insert():
    """Lifecycle edge: delete EVERY point, search (all -1), compact to an
    empty index, then insert again — on all four engines. (Empty-corpus
    build previously crashed the graph/ivf builders.)"""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((200, 8)).astype(np.float32)
    engines = [
        FlatIndex(FlatConfig(dim=8)),
        CagraIndex(CagraConfig(dim=8, degree=8)),
        HNSW(HNSWConfig(dim=8, m=8, ef_construction=16)),
        IVFIndex(IVFConfig(dim=8, n_clusters=4)),
    ]
    for idx in engines:
        name = type(idx).__name__
        idx.build(x) if hasattr(idx, "build") else idx.add(x)
        idx.remove(list(range(200)))
        assert len(idx) == 0, name
        assert (np.asarray(idx.search(x[:4], 3)[1]) == -1).all(), name
        assert idx.compact().size == 0, name
        assert (np.asarray(idx.search(x[:4], 3)[1]) == -1).all(), name
        idx.insert(x[:5])
        ids = np.asarray(idx.search(x[:5], 1)[1])
        assert (ids[:, 0] == np.arange(5)).all(), name


def test_sharded_compact_all_engines():
    """compact() on the sharded engines: tombstones dropped, survivors
    renumbered to [0, L) in former order, search works on the new ids."""
    from zvdb_tpu.parallel.sharded import ShardedHNSW
    from zvdb_tpu.parallel.sharded_cagra import ShardedCagra
    from zvdb_tpu.parallel.sharded_flat import ShardedFlat
    from zvdb_tpu.parallel.sharded_ivf import ShardedIVF

    n, d = 1600, 16
    x = clustered(n, d, seed=20)
    dead = sorted(range(0, n, 5))
    engines = [
        (ShardedFlat(FlatConfig(dim=d)), dict()),
        (ShardedCagra(CagraConfig(dim=d, degree=16)), dict(ef_search=32)),
        (ShardedHNSW(HNSWConfig(dim=d, m=16, ef_construction=48)),
         dict(ef_search=32)),
        (ShardedIVF(IVFConfig(dim=d, n_clusters=16)), dict(nprobe=8)),
    ]
    for idx, kw in engines:
        name = type(idx).__name__
        idx.build(x)
        idx.remove(dead)
        old_ids = idx.compact()
        assert len(idx) == n - len(dead), name
        assert old_ids.shape == (n - len(dead),), name
        assert not np.isin(old_ids, dead).any(), name
        ii = np.asarray(idx.search(x[old_ids[:128]], 1, **kw)[1])
        assert (ii[:, 0] == np.arange(128)).mean() >= 0.9, name


def test_flat_concurrent_add_remove_threadsafe():
    """8 threads interleaving add() and remove() lose no update (the
    reference's concurrent-access contract, src/test_hnsw.zig:154-209,
    extended to deletes)."""
    import threading

    d = 8
    idx = FlatIndex(FlatConfig(dim=d))
    rng = np.random.default_rng(0)
    idx.add(rng.standard_normal((800, d)).astype(np.float32))

    def adder(t):
        r = np.random.default_rng(t)
        for _ in range(25):
            idx.add(r.standard_normal((4, d)).astype(np.float32))

    def remover(t):
        for i in range(25):
            idx.remove([t * 100 + i])

    ts = [threading.Thread(target=adder, args=(t,)) for t in range(4)] + \
         [threading.Thread(target=remover, args=(t,)) for t in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    # 800 + 4*25*4 added, 4*25 removed — len must balance exactly
    assert len(idx) == 800 + 400 - 100
    assert idx._n_total == 1200
    # every tombstone is actually marked on device
    assert (np.asarray(idx.state.norms)[sorted(idx._dead)] == np.inf).all()
    # removed ids never surface
    i = np.asarray(idx.search(idx.get([150])[0], 5)[1])
    assert not np.isin(i.ravel(), sorted(idx._dead)).any()
