"""Fat-row hop expansion (cagra.fat_rows): one gather per expanded node.

The fat pack [cap+1, deg*(D+2)] carries each neighborhood's (vector|norm|id)
rows; search results must be IDENTICAL to the thin path (same beam, same
scores — the pack stores exact f32 copies).
"""
import dataclasses

import numpy as np

from zvdb_tpu import CagraConfig, CagraIndex


def clustered(n, d, seed, nc=50):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((nc, d)).astype(np.float32)
    a = rng.integers(0, nc, n)
    return (centers[a] + 0.15 * rng.standard_normal((n, d))).astype(np.float32)


def _pair(metric, dtype="float32"):
    x = clustered(3000, 24, seed=7)
    thin = CagraIndex(CagraConfig(dim=24, degree=16, metric=metric,
                                  dtype=dtype, fat_rows="off"))
    fat = CagraIndex(CagraConfig(dim=24, degree=16, metric=metric,
                                 dtype=dtype, fat_rows="on"))
    thin.build(x)
    fat.build(x)
    return x, thin, fat


def test_fat_matches_thin_l2():
    x, thin, fat = _pair("l2")
    assert fat._fat_enabled() and not thin._fat_enabled()
    q = x[:100] + 0.01
    st, it = thin.search(q, 10)
    sf, if_ = fat.search(q, 10)
    np.testing.assert_array_equal(np.asarray(it), np.asarray(if_))
    np.testing.assert_allclose(np.asarray(st), np.asarray(sf), rtol=1e-5,
                               atol=1e-5)


def test_fat_matches_thin_cosine():
    x, thin, fat = _pair("cosine")
    q = x[50:120]
    st, it = thin.search(q, 5)
    sf, if_ = fat.search(q, 5)
    np.testing.assert_array_equal(np.asarray(it), np.asarray(if_))


def test_fat_pack_invalidated_on_insert():
    x, _, fat = _pair("l2")
    fat.search(x[:4], 3)                     # builds the cached pack
    assert fat._fat_pack is not None
    extra = clustered(64, 24, seed=9)
    fat.insert(extra)
    _, ids = fat.search(extra, 1)            # flush + re-pack
    assert (np.asarray(ids)[:, 0] == 3000 + np.arange(64)).mean() >= 0.9


def test_fat_auto_respects_budget():
    x = clustered(500, 24, seed=3)
    small = CagraIndex(CagraConfig(dim=24, degree=8, fat_rows="auto",
                                   fat_budget_bytes=100))
    small.build(x)
    assert not small._fat_enabled()          # pack would exceed budget
    big = CagraIndex(CagraConfig(dim=24, degree=8, fat_rows="auto"))
    big.build(x)
    assert big._fat_enabled()
    off = CagraIndex(CagraConfig(dim=24, degree=8))   # measured-slower: off
    off.build(x)
    assert not off._fat_enabled()
