"""Sharded brute-force engine on the virtual 8-device mesh."""
import numpy as np
import pytest

import jax

from zvdb_tpu import FlatConfig, exact_ground_truth
from zvdb_tpu.parallel.mesh import make_mesh
from zvdb_tpu.parallel.sharded_flat import ShardedFlat

# compile-heavy multi-device tier — deselect with -m 'not slow' (fast gate)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return make_mesh(n_shards=8)


def test_sharded_flat_exact(rng, mesh8):
    n, d, k = 5000, 24, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((40, d)).astype(np.float32)
    idx = ShardedFlat(FlatConfig(dim=d), mesh=mesh8)
    idx.build(x)
    s, ids = idx.search(q, k, approx=False)
    ids = np.asarray(ids)
    _, gt = exact_ground_truth(x, q, k)
    # exact sharded == exact single (up to boundary ties)
    overlap = np.mean([len(set(ids[r]) & set(gt[r])) / k for r in range(40)])
    assert overlap >= 0.99


def test_sharded_flat_uneven_and_metrics(rng, mesh8):
    n, d, k = 123, 16, 7
    x = rng.standard_normal((n, d)).astype(np.float32)
    idx = ShardedFlat(FlatConfig(dim=d, metric="cosine"), mesh=mesh8)
    idx.build(x)
    s, ids = idx.search(x[:5], k, approx=False)
    ids = np.asarray(ids)
    assert (ids[:, 0] == np.arange(5)).all()  # self-hit first under cosine
    assert ids.shape == (5, k)


def test_sharded_flat_empty(mesh8):
    idx = ShardedFlat(FlatConfig(dim=8), mesh=mesh8)
    s, ids = idx.search(np.zeros((2, 8), np.float32), 3)
    assert (np.asarray(ids) == -1).all()


def test_sharded_search_range_matches_oracle(rng, mesh8):
    """ShardedFlat.search_range mirrors FlatIndex.search_range
    (tests/test_flat.py range block): exact global counts (per-shard counts
    summed over the mesh), the max_results globally-best in-range ids,
    tombstone exclusion, dot-metric similarity floor."""
    n, d = 3000, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = x[:32] + 0.01
    idx = ShardedFlat(FlatConfig(dim=d), mesh=mesh8)
    idx.build(x)
    r = 2.0
    s, i, c = (np.asarray(v) for v in idx.search_range(q, r, max_results=64))
    d2 = ((q[:, None, :] - x[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(c, (d2 <= r).sum(1))
    for b in range(32):
        got = set(i[b][i[b] >= 0])
        inr = np.nonzero(d2[b] <= r)[0]
        want = set(inr[np.argsort(d2[b][inr])][:64])
        assert got == want
    assert (s[i >= 0] <= r).all()
    # removed rows leave both the results and the counts
    idx.remove([0, 1])
    s2, i2, c2 = (np.asarray(v)
                  for v in idx.search_range(q, r, max_results=64))
    d2m = d2.copy()
    d2m[:, [0, 1]] = np.inf
    np.testing.assert_array_equal(c2, (d2m <= r).sum(1))
    assert not np.isin(i2.ravel(), [0, 1]).any()
    # dot metric: radius is a similarity floor
    idxd = ShardedFlat(FlatConfig(dim=d, metric="dot"), mesh=mesh8)
    idxd.build(x)
    _, _, cd = idxd.search_range(q, 5.0, max_results=64)
    np.testing.assert_array_equal(np.asarray(cd), (q @ x.T >= 5.0).sum(1))
    # truncation: tiny max_results still reports exact counts
    _, it, ct = idx.search_range(q, r, max_results=4)
    np.testing.assert_array_equal(np.asarray(ct), c2)
    assert ((np.asarray(it) >= 0).sum(1) <= 4).all()
    # empty index contract
    e = ShardedFlat(FlatConfig(dim=d), mesh=mesh8)
    se, ie, ce = e.search_range(q, r)
    assert (np.asarray(ie) == -1).all() and (np.asarray(ce) == 0).all()
