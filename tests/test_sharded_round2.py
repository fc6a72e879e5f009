"""Sharded-layer completeness: IVF rerank, incremental insert, save/load,
and a (data, shard) mesh exercising the DP axis (SURVEY.md §2.3 ledger)."""
import numpy as np
import pytest

from zvdb_tpu import (
    FlatConfig, HNSWConfig, IVFConfig, SearchConfig, exact_ground_truth,
)
from zvdb_tpu.parallel.mesh import DATA_AXIS, make_mesh
from zvdb_tpu.parallel.sharded import ShardedHNSW
from zvdb_tpu.parallel.sharded_flat import ShardedFlat
from zvdb_tpu.parallel.sharded_ivf import ShardedIVF

# compile-heavy multi-device tier — deselect with -m 'not slow' (fast gate)
pytestmark = pytest.mark.slow


def recall_at_k(ids, gt_ids, k):
    return np.mean(
        [len(set(ids[r, :k]) & set(gt_ids[r, :k])) / k for r in range(ids.shape[0])]
    )


def clustered(n, d, seed, nc=50):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((nc, d)).astype(np.float32)
    a = rng.integers(0, nc, n)
    return (centers[a] + 0.15 * rng.standard_normal((n, d))).astype(np.float32)


# ---------------------------------------------------------------------------
# ShardedIVF: rerank + add + save/load


def test_sharded_ivf_int8_rerank(rng):
    n, d, k = 12000, 32, 10
    x = clustered(n, d, seed=1)
    q = (x[rng.integers(0, n, 200)]
         + 0.05 * rng.standard_normal((200, d))).astype(np.float32)
    _, gt = exact_ground_truth(x, q, k)
    idx = ShardedIVF(IVFConfig(dim=d, n_clusters=64, nprobe=16, dtype="int8",
                               rerank=4), mesh=make_mesh(n_shards=4))
    idx.build(x)
    _, ids = idx.search(q, k)
    r = recall_at_k(np.asarray(ids), gt, k)
    assert r >= 0.9, f"sharded int8+rerank recall {r:.3f}"
    # returned ids are GLOBAL external ids
    assert int(np.asarray(ids).max()) < n


def test_sharded_ivf_add_and_roundtrip(tmp_path, rng):
    n, d = 6000, 16
    x = clustered(n, d, seed=2)
    idx = ShardedIVF(IVFConfig(dim=d, n_clusters=32, nprobe=32),
                     mesh=make_mesh(n_shards=4))
    idx.build(x)
    probe = x[:128]
    _, ids0 = idx.search(probe, 1)
    hit0 = (np.asarray(ids0)[:, 0] == np.arange(128)).mean()
    assert hit0 >= 0.99

    extra = clustered(400, d, seed=3)
    idx.add(extra)
    assert len(idx) == n + 400
    _, ids1 = idx.search(probe, 1)
    hit1 = (np.asarray(ids1)[:, 0] == np.arange(128)).mean()
    assert hit1 >= 0.99, "ids must stay stable across sharded add"
    _, idsn = idx.search(extra[:64], 1)
    hitn = (np.asarray(idsn)[:, 0] == n + np.arange(64)).mean()
    assert hitn >= 0.9, f"new-point hit {hitn:.2f}"

    path = str(tmp_path / "sivf.npz")
    idx.save(path)
    loaded = ShardedIVF.load(path, mesh=make_mesh(n_shards=4))
    _, ids2 = loaded.search(probe, 1)
    np.testing.assert_array_equal(np.asarray(ids1), np.asarray(ids2))
    # loaded index still accepts adds
    loaded.add(extra[:16] + 0.3)
    assert len(loaded) == n + 400 + 16
    loaded.search(probe[:4], 1)


def test_sharded_ivf_rerank_add(rng):
    n, d = 5000, 16
    x = clustered(n, d, seed=4)
    idx = ShardedIVF(IVFConfig(dim=d, n_clusters=16, nprobe=16, rerank=4),
                     mesh=make_mesh(n_shards=2))
    idx.build(x)
    idx.add(clustered(300, d, seed=5))
    _, ids = idx.search(x[:64], 1)
    assert (np.asarray(ids)[:, 0] == np.arange(64)).mean() >= 0.99


# ---------------------------------------------------------------------------
# ShardedHNSW: insert + save/load


def test_sharded_hnsw_insert_and_roundtrip(tmp_path, rng):
    n, d = 4000, 16
    x = clustered(n, d, seed=6)
    idx = ShardedHNSW(HNSWConfig(dim=d, m=8, ef_construction=32,
                                 build_batch=256),
                      mesh=make_mesh(n_shards=4))
    idx.build(x)
    extra = clustered(300, d, seed=7)
    idx.insert(extra)
    assert len(idx) == n + 300
    _, ids = idx.search(extra[:64], 1, ef_search=48)
    hit = (np.asarray(ids)[:, 0] == n + np.arange(64)).mean()
    assert hit >= 0.9, f"sharded insert hit {hit:.2f}"
    _, old = idx.search(x[:64], 1, ef_search=48)
    assert (np.asarray(old)[:, 0] == np.arange(64)).mean() >= 0.9

    path = str(tmp_path / "shnsw.npz")
    idx.save(path)
    loaded = ShardedHNSW.load(path, mesh=make_mesh(n_shards=4))
    assert len(loaded) == n + 300
    s0, i0 = idx.search(x[:16], 5, ef_search=48)
    s1, i1 = loaded.search(x[:16], 5, ef_search=48)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_sharded_hnsw_insert_grows_capacity(rng):
    d = 8
    x = clustered(600, d, seed=8)
    idx = ShardedHNSW(HNSWConfig(dim=d, m=4, ef_construction=16,
                                 build_batch=64),
                      mesh=make_mesh(n_shards=2))
    idx.build(x)
    cap0 = idx.shard_cap
    idx.insert(clustered(2000, d, seed=9))
    idx.flush()
    assert idx.shard_cap > cap0
    assert len(idx) == 2600
    _, ids = idx.search(x[:32], 1, ef_search=32)
    assert (np.asarray(ids)[:, 0] == np.arange(32)).mean() >= 0.9


# ---------------------------------------------------------------------------
# ShardedFlat: add + save/load


def test_sharded_flat_add_and_roundtrip(tmp_path, rng):
    n, d = 3000, 16
    x = clustered(n, d, seed=10)
    idx = ShardedFlat(FlatConfig(dim=d), mesh=make_mesh(n_shards=4))
    idx.build(x)
    idx.add(clustered(500, d, seed=11))
    assert len(idx) == n + 500
    _, ids = idx.search(x[:64], 1, approx=False)
    assert (np.asarray(ids)[:, 0] == np.arange(64)).all()

    path = str(tmp_path / "sflat.npz")
    idx.save(path)
    loaded = ShardedFlat.load(path, mesh=make_mesh(n_shards=4))
    _, ids2 = loaded.search(x[:64], 1, approx=False)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids2))


# ---------------------------------------------------------------------------
# DP axis: (data=2, shard=4) mesh


def test_data_parallel_mesh_search(rng):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    n, d, k = 4000, 16, 5
    x = clustered(n, d, seed=12)
    mesh = make_mesh(n_shards=4, n_data=2)
    assert mesh.shape[DATA_AXIS] == 2
    idx = ShardedHNSW(HNSWConfig(dim=d, m=8, ef_construction=32,
                                 build_batch=256), mesh=mesh)
    idx.build(x)
    q = (x[rng.integers(0, n, 64)]
         + 0.05 * rng.standard_normal((64, d))).astype(np.float32)
    _, gt = exact_ground_truth(x, q, k)
    s, ids = idx.search(q, k, ef_search=48)   # B=64 sharded over data axis
    r = recall_at_k(np.asarray(ids), gt, k)
    assert r >= 0.9, f"DP-mesh recall {r:.3f}"
    # single-query path still works under the DP mesh (padded internally
    # or replicated; at minimum it must not crash and must return the point)
    s1, i1 = idx.search(x[:2], 1, ef_search=32)
    assert (np.asarray(i1)[:, 0] == np.arange(2)).all()
