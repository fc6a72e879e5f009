"""Sharded brute-force engine on the virtual 8-device mesh."""
import numpy as np
import pytest

import jax

from zvdb_tpu import FlatConfig, exact_ground_truth
from zvdb_tpu.parallel.mesh import make_mesh
from zvdb_tpu.parallel.sharded_flat import ShardedFlat


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
