"""Sharded <-> single-chip EXACT equivalence (VERDICT r4 item 9).

The merge path (shard routing, global-id offsetting, all-gather top-k
fold) is the one multi-chip surface a virtual CPU mesh can fully verify —
so these tests demand id/score EQUALITY against the single-chip engine,
not recall bounds, for every engine family, including under deletes and
filtered search:

  flat — exact scan both sides: equality is unconditional.
  pq   — refine pool >= corpus (rerank=256 at k=10 covers n=2000): the
         float32 rescore makes both sides exact-over-original-vectors,
         so equality holds REGARDLESS of codebook differences.
  ivf  — nprobe >= total clusters: exhaustive probing on both sides.
  cagra/hnsw — beams at saturating ef on a corpus where both sides reach
         exact top-k (pinned empirically; deterministic on fixed seeds);
         filtered search routes through the exact masked scan on both
         sides (the round-4 policy), so filter equality is unconditional.

Mismatched ids are tolerated ONLY where the two sides' scores tie within
float tolerance (different-but-equidistant neighbors are a legitimate
order difference, not a merge bug).
"""
import numpy as np
import pytest

import jax

from zvdb_tpu import (
    CagraConfig, CagraIndex, FlatConfig, FlatIndex, HNSW, HNSWConfig,
    IVFConfig, IVFIndex, PQConfig, PQFlatIndex,
    ShardedCagra, ShardedFlat, ShardedHNSW, ShardedIVF, ShardedPQFlat,
)
from zvdb_tpu.parallel.mesh import make_mesh

# compile-heavy multi-device tier — deselect with -m 'not slow' (fast gate)
pytestmark = pytest.mark.slow

N, D, NQ, K = 2000, 24, 48, 10


@pytest.fixture(scope="module")
def mesh4():
    assert len(jax.devices()) >= 4, "conftest must force >=4 virtual devices"
    return make_mesh(n_shards=4)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(42)
    cents = rng.standard_normal((24, D)).astype(np.float32) * 4
    x = (cents[rng.integers(0, 24, N)]
         + rng.standard_normal((N, D))).astype(np.float32)
    q = (x[rng.integers(0, N, NQ)]
         + 0.05 * rng.standard_normal((NQ, D))).astype(np.float32)
    return x, q


def assert_same(sa, ia, sb, ib, atol=1e-3):
    """Exact-equivalence check, tolerant only to tie swaps: scores must
    match elementwise, and any id mismatch must sit at a position where
    both sides scored equal (within float tolerance)."""
    sa, ia, sb, ib = map(np.asarray, (sa, ia, sb, ib))
    fin = np.isfinite(sa) | np.isfinite(sb)
    np.testing.assert_allclose(np.where(fin, sa, 0.0),
                               np.where(fin, sb, 0.0),
                               rtol=1e-3, atol=atol)
    neq = (ia != ib) & fin
    if neq.any():
        # a swapped id must carry the same score on both sides (a tie)
        assert np.allclose(sa[neq], sb[neq], rtol=1e-3, atol=atol), (
            ia[neq][:8], ib[neq][:8], sa[neq][:8], sb[neq][:8])


def _victims(x, q):
    """A handful of guaranteed-hot ids to delete: the queries' own sources."""
    d2 = ((q[:4, None, :] - x[None]) ** 2).sum(-1)
    return np.unique(np.argmin(d2, axis=1))


# ---------------------------------------------------------------- flat

def test_flat_equivalence(data, mesh4):
    x, q = data
    cfg = FlatConfig(dim=D, precision="highest")
    single = FlatIndex(cfg, capacity=N)
    single.add(x)
    sh = ShardedFlat(cfg, mesh=mesh4)
    sh.build(x)
    assert_same(*single.search(q, K), *sh.search(q, K, approx=False))
    # deletes
    dead = _victims(x, q)
    assert single.remove(dead) == sh.remove(dead) == dead.size
    assert_same(*single.search(q, K), *sh.search(q, K, approx=False))
    # filtered search (allowlist; exact masked scan both sides)
    allowed = np.arange(0, N, 3)
    assert_same(*single.search(q, K, allowed=allowed),
                *sh.search(q, K, approx=False, allowed=allowed))


# ---------------------------------------------------------------- pq

def test_pq_equivalence_full_pool(data, mesh4):
    """With the refine pool covering the whole corpus and a float32 refine
    store, both sides are exact over the original vectors — equality holds
    regardless of per-shard codebook differences."""
    x, q = data
    cfg = PQConfig(dim=D, n_sub=8, n_codes=256, refine="float32",
                   rerank=256, train_sample=1024, tile_n=1024)
    single = PQFlatIndex(cfg)
    single.build(x)
    sh = ShardedPQFlat(cfg, mesh=mesh4)
    sh.build(x)
    assert_same(*single.search(q, K, approx=False),
                *sh.search(q, K, approx=False))
    # deletes
    dead = _victims(x, q)
    assert single.remove(dead) == sh.remove(dead) == dead.size
    assert_same(*single.search(q, K, approx=False),
                *sh.search(q, K, approx=False))
    # filtered search
    allowed = np.arange(0, N, 3)
    assert_same(*single.search(q, K, approx=False, allowed=allowed),
                *sh.search(q, K, approx=False, allowed=allowed))


# ---------------------------------------------------------------- ivf

def test_ivf_equivalence_exhaustive(data, mesh4):
    """nprobe >= every cluster on both sides = exact scan: the shard-local
    probe routing (deliberately NOT equivalent at finite nprobe, see
    sharded_ivf.py:249) must still merge to the exact answer when
    exhaustive."""
    x, q = data
    cfg = IVFConfig(dim=D, n_clusters=8, nprobe=8, precision="highest",
                    kmeans_sample=1024)
    single = IVFIndex(cfg)
    single.build(x)
    sh = ShardedIVF(cfg, mesh=mesh4)
    sh.build(x)
    big = 10 ** 6   # clamped to the local cluster count per shard
    assert_same(*single.search(q, K, nprobe=8), *sh.search(q, K, nprobe=big))
    # deletes
    dead = _victims(x, q)
    assert single.remove(dead) == sh.remove(dead) == dead.size
    assert_same(*single.search(q, K, nprobe=8), *sh.search(q, K, nprobe=big))
    # filtered search (exact masked scan both sides)
    allowed = np.arange(0, N, 3)
    assert_same(*single.search(q, K, nprobe=8, allowed=allowed),
                *sh.search(q, K, nprobe=big, allowed=allowed))


# ---------------------------------------------------------------- graphs

def _graph_equiv(single, sh, x, q, ef):
    assert_same(*single.search(q, K, ef_search=ef),
                *sh.search(q, K, ef_search=ef))
    # deletes: dead nodes keep routing beams, are filtered from results
    dead = _victims(x, q)
    assert single.remove(dead) == sh.remove(dead) == dead.size
    assert_same(*single.search(q, K, ef_search=ef),
                *sh.search(q, K, ef_search=ef))
    # filtered search: the round-4 policy routes filters through the exact
    # masked scan on BOTH sides, so equality is unconditional here
    allowed = np.arange(0, N, 3)
    assert_same(*single.search(q, K, allowed=allowed),
                *sh.search(q, K, allowed=allowed))


def test_cagra_equivalence_saturating_ef(data, mesh4):
    """At saturating ef on this corpus both sides return the exact top-k
    (pinned against the flat oracle first, so a failure distinguishes
    'merge broke' from 'beam missed')."""
    x, q = data
    cfg = CagraConfig(dim=D, degree=24)
    single = CagraIndex(cfg)
    single.build(x)
    sh = ShardedCagra(cfg, mesh=mesh4)
    sh.build(x)
    oracle = FlatIndex(FlatConfig(dim=D, precision="highest"), capacity=N)
    oracle.add(x)
    so, io = oracle.search(q, K)
    assert_same(so, io, *single.search(q, K, ef_search=256))
    _graph_equiv(single, sh, x, q, ef=256)


def test_hnsw_equivalence_saturating_ef(data, mesh4):
    x, q = data
    cfg = HNSWConfig(dim=D, m=12, ef_construction=96, build_batch=512)
    single = HNSW(cfg)
    single.build(x)
    sh = ShardedHNSW(cfg, mesh=mesh4)
    sh.build(x)
    oracle = FlatIndex(FlatConfig(dim=D, precision="highest"), capacity=N)
    oracle.add(x)
    so, io = oracle.search(q, K)
    assert_same(so, io, *single.search(q, K, ef_search=256))
    _graph_equiv(single, sh, x, q, ef=256)


# ---------------------------------------------------------------- ivfpq

def test_ivfpq_equivalence_exhaustive_pool(data, mesh4):
    """Sixth engine (round-5): exhaustive probes + collision-free bin pool
    + float32 refine covering the corpus makes both sides exact over the
    original vectors, so sharded merge must equal the single chip exactly.
    l_bins=1024 >= any cluster's row count -> one bin per row, zero ADC
    pool eviction; rerank=256 -> refine pool k*rerank=2560 >= N=2000."""
    x, q = data
    from zvdb_tpu import IVFPQConfig, IVFPQIndex, ShardedIVFPQ

    cfg = IVFPQConfig(dim=D, n_sub=8, n_clusters=8, nprobe=8,
                      refine="float32", rerank=256, l_bins=1024,
                      chunk=1024, train_sample=1024, kmeans_sample=1024)
    single = IVFPQIndex(cfg)
    single.build(x)
    sh = ShardedIVFPQ(cfg, mesh=mesh4)
    sh.build(x)
    big = 10 ** 6   # clamped to the local cluster count per shard
    assert_same(*single.search(q, K, nprobe=8),
                *sh.search(q, K, nprobe=big))
    # deletes
    dead = _victims(x, q)
    assert single.remove(dead) == sh.remove(dead) == dead.size
    assert_same(*single.search(q, K, nprobe=8),
                *sh.search(q, K, nprobe=big))
    # filtered search (exact masked scan both sides)
    allowed = np.arange(0, N, 3)
    assert_same(*single.search(q, K, nprobe=8, allowed=allowed),
                *sh.search(q, K, nprobe=big, allowed=allowed))
