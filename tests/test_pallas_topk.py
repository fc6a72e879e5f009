"""Pallas bin-parallel flat-scan top-k (ops/pallas_topk.py).

Interpret-mode correctness on CPU; the compiled-on-TPU validation and the
microbench vs approx_min_k live in examples/pallas_topk_bench.py (run on the
real chip).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zvdb_tpu.ops import distance as D
from zvdb_tpu.ops.pallas_topk import flat_scan_bins, flat_scan_topk

I = dict(interpret=True)


def _mk(n, d, b, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    return x, q


def test_exact_when_bins_cover_corpus():
    # N <= L: c % L is injective, so every bin holds exactly one column and
    # the result must equal the exact top-k.
    x, q = _mk(50, 17, 7)
    norms = D.sq_norms(jnp.asarray(x))
    s, ids = flat_scan_topk(jnp.asarray(q), jnp.asarray(x), norms, k=5,
                            l_bins=64, chunk=64, bq_tile=8, **I)
    ref = D.pairwise_scores(jnp.asarray(q), jnp.asarray(x), norms, "l2")
    rs, ri = jax.lax.top_k(-ref, 5)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ri))
    np.testing.assert_allclose(np.asarray(s), -np.asarray(rs), rtol=1e-5)


def test_bins_are_true_bin_minima():
    # each returned bin value must be the exact min over its residue class
    x, q = _mk(300, 24, 5, seed=1)
    l_bins = 32
    norms = D.sq_norms(jnp.asarray(x))
    bs, bi = flat_scan_bins(jnp.asarray(q), jnp.asarray(x), norms,
                            l_bins=l_bins, chunk=64, bq_tile=8, **I)
    ref = np.asarray(D.pairwise_scores(jnp.asarray(q), jnp.asarray(x), norms, "l2"))
    cols = np.arange(300)
    for lane in range(l_bins):
        members = cols[cols % l_bins == lane]
        want = ref[:, members].min(axis=1)
        np.testing.assert_allclose(np.asarray(bs)[:, lane], want, rtol=1e-5)
        # id must point at a member achieving the min
        got_ids = np.asarray(bi)[:, lane]
        assert np.all(np.isin(got_ids, members))
        np.testing.assert_allclose(
            ref[np.arange(5), got_ids], want, rtol=1e-5)


def test_recall_beats_collision_bound():
    x, q = _mk(4096, 32, 64, seed=2)
    k, L = 10, 128
    norms = D.sq_norms(jnp.asarray(x))
    _, ids = flat_scan_topk(jnp.asarray(q), jnp.asarray(x), norms, k=k,
                            l_bins=L, chunk=256, bq_tile=16, **I)
    ref = D.pairwise_scores(jnp.asarray(q), jnp.asarray(x), norms, "l2")
    _, gt = jax.lax.top_k(-ref, k)
    hit = np.mean([
        len(set(np.asarray(ids)[i]) & set(np.asarray(gt)[i])) / k
        for i in range(ids.shape[0])
    ])
    bound = L / k * (1 - (1 - 1 / L) ** k)   # 0.965 at k=10, L=128
    assert hit >= bound - 0.03, hit


def test_dot_metric_and_invalid_rows():
    x, q = _mk(100, 16, 4, seed=3)
    norms = jnp.zeros((100,)).at[60:].set(jnp.inf)   # rows 60+ invalid
    s, ids = flat_scan_topk(jnp.asarray(q), jnp.asarray(x), norms, k=4,
                            l_bins=128, chunk=128, bq_tile=8, metric="dot", **I)
    assert np.asarray(ids).max() < 60
    ref = np.asarray(D.pairwise_scores(
        jnp.asarray(q), jnp.asarray(x[:60]), jnp.zeros((60,)), "dot"))
    rs, ri = jax.lax.top_k(-jnp.asarray(ref), 4)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ri))


def test_k_larger_than_bins_pads_invalid():
    x, q = _mk(20, 8, 3, seed=4)
    norms = D.sq_norms(jnp.asarray(x))
    s, ids = flat_scan_topk(jnp.asarray(q), jnp.asarray(x), norms, k=40,
                            l_bins=32, chunk=32, bq_tile=8, **I)
    assert s.shape == (3, 40) and ids.shape == (3, 40)
    assert np.all(np.asarray(ids)[:, 32:] == -1)
    assert np.all(np.isinf(np.asarray(s)[:, 32:]))
    # the first 20 slots cover the whole corpus exactly
    assert np.all(np.sort(np.asarray(ids)[:, :20], axis=1) == np.arange(20))


def test_flat_engine_pallas_path_matches():
    # FlatIndex(scan="pallas") agrees with the exact engine on CPU interpret
    from zvdb_tpu import FlatConfig, FlatIndex

    x, q = _mk(500, 13, 16, seed=5)
    exact = FlatIndex(FlatConfig(dim=13), capacity=512)
    exact.add(x)
    es, ei = exact.search(q, 10)
    pal = FlatIndex(FlatConfig(dim=13, scan="pallas", l_bins=512,
                               pallas_chunk=512), capacity=512)
    pal.add(x)
    ps, pi = pal.search(q, 10, approx=True)
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(ei))
    np.testing.assert_allclose(np.asarray(ps), np.asarray(es), rtol=1e-4,
                               atol=1e-4)
