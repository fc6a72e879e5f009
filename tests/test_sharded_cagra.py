"""ShardedCagra: per-shard graphs, fan-out search, SPMD insert, save/load.

Runs on the 8-virtual-device CPU mesh (conftest). Mirrors the ShardedHNSW
contracts (tests/test_sharded_round2.py) for the flagship graph engine.
"""
import numpy as np
import pytest

from zvdb_tpu import CagraConfig, ShardedCagra, make_mesh

# compile-heavy multi-device tier — deselect with -m 'not slow' (fast gate)
pytestmark = pytest.mark.slow


def clustered(n, d, seed, nc=50):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((nc, d)).astype(np.float32)
    a = rng.integers(0, nc, n)
    return (centers[a] + 0.15 * rng.standard_normal((n, d))).astype(np.float32)


def test_sharded_cagra_build_and_search(rng):
    d, n = 16, 4000
    x = clustered(n, d, seed=3)
    idx = ShardedCagra(CagraConfig(dim=d, degree=16), mesh=make_mesh(n_shards=4))
    idx.build(x)
    assert len(idx) == n
    _, ids = idx.search(x[:128], 1, ef_search=32)
    hit = (np.asarray(ids)[:, 0] == np.arange(128)).mean()
    assert hit >= 0.9, f"self-hit {hit}"
    # global ids span all shards
    _, ids5 = idx.search(x[:64], 5, ef_search=32)
    assert np.asarray(ids5).max() >= n // 4


def test_sharded_cagra_insert_and_roundtrip(tmp_path, rng):
    d, n = 12, 1500
    x = clustered(n, d, seed=4)
    idx = ShardedCagra(CagraConfig(dim=d, degree=8, build_batch=128),
                       mesh=make_mesh(n_shards=2))
    idx.build(x)
    extra = clustered(400, d, seed=5)
    idx.insert(extra)
    assert len(idx) == n + 400
    _, ids = idx.search(extra[:64], 1, ef_search=48)
    hit = (np.asarray(ids)[:, 0] == n + np.arange(64)).mean()
    assert hit >= 0.9, f"insert self-hit {hit}"
    # original points still found
    _, old = idx.search(x[:64], 1, ef_search=48)
    assert (np.asarray(old)[:, 0] == np.arange(64)).mean() >= 0.9

    path = str(tmp_path / "scagra.npz")
    idx.save(path)
    loaded = ShardedCagra.load(path, mesh=make_mesh(n_shards=2))
    assert len(loaded) == n + 400
    s0, i0 = idx.search(x[:16], 5, ef_search=32)
    s1, i1 = loaded.search(x[:16], 5, ef_search=32)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_sharded_cagra_small_n(rng):
    """n < n_shards leaves tail shards empty — build must not crash and every
    point must be findable (advisor round-2 medium: empty-shard build raised
    through _tiny_graph's top_k on a [0, 0] score matrix)."""
    d = 8
    for n in (2, 9):
        x = rng.standard_normal((n, d)).astype(np.float32)
        idx = ShardedCagra(CagraConfig(dim=d, degree=8),
                           mesh=make_mesh(n_shards=4))
        idx.build(x)
        assert len(idx) == n
        _, ids = idx.search(x, 1, ef_search=16)
        assert (np.asarray(ids)[:, 0] == np.arange(n)).all()
    # first _flush with fewer pending inserts than shards (same crash path)
    idx = ShardedCagra(CagraConfig(dim=d, degree=8), mesh=make_mesh(n_shards=4))
    idx.insert(rng.standard_normal((3, d)).astype(np.float32))
    _, ids = idx.search(np.zeros((1, d), np.float32), 3, ef_search=16)
    assert (np.asarray(ids) >= 0).sum() == 3


def test_sharded_cagra_empty_and_dim_mismatch(rng):
    idx = ShardedCagra(CagraConfig(dim=8, degree=8), mesh=make_mesh(n_shards=2))
    s, ids = idx.search(np.zeros((3, 8), np.float32), 4)
    assert (np.asarray(ids) == -1).all()
    with pytest.raises(ValueError):
        idx.search(np.zeros((3, 5), np.float32), 2)
