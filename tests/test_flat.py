"""Flat (brute-force) index: exactness, metrics, tiling, incremental adds."""
import numpy as np
import pytest

from zvdb_tpu import FlatConfig, FlatIndex, exact_ground_truth


def _np_scores(x, q, metric):
    """Ascending-is-better scores in float64 (squared L2 or negated similarity)."""
    x = x.astype(np.float64)
    q = q.astype(np.float64)
    if metric == "cosine":
        x = x / np.linalg.norm(x, axis=-1, keepdims=True)
        q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    if metric == "l2":
        return ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    return -(q @ x.T)


def _np_ground_truth(x, q, k, metric):
    return np.argsort(_np_scores(x, q, metric), axis=-1, kind="stable")[:, :k]


def assert_topk_correct(x, q, ids, k, metric, eps=1e-4):
    """Every returned id must score within eps of the true k-th best score
    (tolerates float accumulation-order ties at the boundary)."""
    s = _np_scores(x, q, metric)
    kth = np.sort(s, axis=-1)[:, k - 1]
    for r in range(q.shape[0]):
        got = s[r, ids[r]]
        assert (got <= kth[r] + eps).all(), (r, got, kth[r])


@pytest.mark.parametrize("metric", ["l2", "dot", "cosine"])
def test_exact_matches_numpy(rng, metric):
    x = rng.standard_normal((500, 32)).astype(np.float32)
    q = rng.standard_normal((17, 32)).astype(np.float32)
    idx = FlatIndex(FlatConfig(dim=32, metric=metric), capacity=500)
    idx.add(x)
    scores, ids = idx.search(q, 10)
    assert_topk_correct(x, q, np.asarray(ids), 10, metric)


def test_tiled_search_matches_untiled(rng):
    x = rng.standard_normal((1000, 16)).astype(np.float32)
    q = rng.standard_normal((8, 16)).astype(np.float32)
    a = FlatIndex(FlatConfig(dim=16, tile_n=128), capacity=1000)
    b = FlatIndex(FlatConfig(dim=16, tile_n=100000), capacity=1000)
    a.add(x)
    b.add(x)
    sa, ia = a.search(q, 7)
    sb, ib = b.search(q, 7)
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))
    np.testing.assert_allclose(np.asarray(sa), np.asarray(sb), rtol=1e-5)


def test_empty_and_small(rng):
    idx = FlatIndex(FlatConfig(dim=8))
    s, i = idx.search(rng.standard_normal((3, 8)).astype(np.float32), 5)
    assert (np.asarray(i) == -1).all()
    # k > n: trailing slots invalid
    idx.add(rng.standard_normal((2, 8)).astype(np.float32))
    s, i = idx.search(rng.standard_normal((1, 8)).astype(np.float32), 5)
    i = np.asarray(i)
    assert (i[0, :2] >= 0).all() and (i[0, 2:] == -1).all()


def test_incremental_adds_and_growth(rng):
    idx = FlatIndex(FlatConfig(dim=8), capacity=4)
    xs = rng.standard_normal((40, 8)).astype(np.float32)
    for row in xs:
        idx.insert(row)
    assert len(idx) == 40
    q = xs[13]
    s, i = idx.search(q, 1)
    assert int(i[0]) == 13
    assert float(s[0]) < 1e-5


def test_exact_ground_truth_helper(rng):
    x = rng.standard_normal((200, 12)).astype(np.float32)
    q = rng.standard_normal((5, 12)).astype(np.float32)
    s, i = exact_ground_truth(x, q, 3, metric="l2")
    assert_topk_correct(x, q, i, 3, "l2")


def test_int8_storage_close_to_exact(rng):
    # int8 symmetric quantization: ranking nearly preserved, scores close
    x = rng.standard_normal((2000, 32)).astype(np.float32)
    q = rng.standard_normal((50, 32)).astype(np.float32)
    a = FlatIndex(FlatConfig(dim=32), capacity=2000)
    b = FlatIndex(FlatConfig(dim=32, dtype="int8"), capacity=2000)
    a.add(x)
    b.add(x)
    _, ia = a.search(q, 10)
    _, ib = b.search(q, 10)
    ia, ib = np.asarray(ia), np.asarray(ib)
    overlap = np.mean([len(set(ia[r]) & set(ib[r])) / 10 for r in range(50)])
    assert overlap >= 0.9, f"int8 overlap {overlap:.3f}"


def test_dimension_mismatch_raises(rng):
    # reference panics on mismatched dims (src/hnsw.zig:184); we raise
    idx = FlatIndex(FlatConfig(dim=8), capacity=10)
    with pytest.raises(ValueError):
        idx.add(np.zeros((2, 9), np.float32))
    idx.add(np.zeros((2, 8), np.float32))
    with pytest.raises(ValueError):
        idx.search(np.zeros((1, 4), np.float32), 1)


def test_rerank_two_pass_matches_exact(rng):
    """FlatConfig.rerank: native-rate scan + exact rerank == exact top-k
    (on CPU the scan precision is f32 anyway; the contract here is ids and
    exact rescored values, incl. int8 per-vector dequant)."""
    from zvdb_tpu import FlatConfig, FlatIndex

    x = rng.standard_normal((2000, 24)).astype(np.float32)
    q = x[:50] + 0.01
    ex = FlatIndex(FlatConfig(dim=24), capacity=2048)
    ex.add(x)
    es, ei = ex.search(q, 10)
    for dtype in ("float32", "int8"):
        rr = FlatIndex(FlatConfig(dim=24, dtype=dtype, rerank=4,
                                  recall_target=0.97), capacity=2048)
        rr.add(x)
        rs, ri = rr.search(q, 10, approx=True)
        hit = np.mean([
            len(set(np.asarray(ri)[i]) & set(np.asarray(ei)[i])) / 10
            for i in range(50)
        ])
        assert hit >= (0.99 if dtype == "float32" else 0.9), (dtype, hit)
        # rescored values are true distances to STORED vectors: for f32 they
        # match the exact engine's scores on agreeing slots
        if dtype == "float32":
            same = np.asarray(ri) == np.asarray(ei)
            # catastrophic cancellation makes near-zero squared distances
            # absolute-error quantities (||q||^2 - 2qx + ||x||^2)
            np.testing.assert_allclose(np.asarray(rs)[same],
                                       np.asarray(es)[same], rtol=1e-4,
                                       atol=2e-3)


def test_search_range_matches_oracle():
    """Fixed-capacity range query (FAISS range_search analog): exact counts,
    the max_results best in-range ids, user-score radius convention, and
    tombstone exclusion."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3000, 16)).astype(np.float32)
    q = x[:32] + 0.01
    idx = FlatIndex(FlatConfig(dim=16))
    idx.add(x)
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
    idxd = FlatIndex(FlatConfig(dim=16, metric="dot"))
    idxd.add(x)
    _, _, cd = idxd.search_range(q, 5.0, max_results=64)
    np.testing.assert_array_equal(np.asarray(cd), (q @ x.T >= 5.0).sum(1))
    # single-query squeeze
    s1, i1, c1 = idx.search_range(q[0], r, max_results=8)
    assert s1.shape == (8,) and int(c1) == int(c2[0])


@pytest.mark.parametrize("metric", ["l2", "cosine"])
def test_pca_filtered_search(metric):
    """PCA-filtered two-pass (pHNSW/AQR pattern): projected approx scan +
    exact full-dim rerank recovers top-k recall on clustered high-dim data,
    and the projection tracks deletes."""
    rng = np.random.default_rng(0)
    nc, n, d = 64, 6000, 256
    centers = rng.standard_normal((nc, d)).astype(np.float32)
    x = (centers[rng.integers(0, nc, n)]
         + 0.2 * rng.standard_normal((n, d))).astype(np.float32)
    q = (x[rng.integers(0, n, 300)]
         + 0.05 * rng.standard_normal((300, d))).astype(np.float32)
    oracle = FlatIndex(FlatConfig(dim=d, metric=metric))
    oracle.add(x)
    gt = np.asarray(oracle.search(q, 10)[1])
    idx = FlatIndex(FlatConfig(dim=d, metric=metric, pca_dim=64, rerank=16))
    idx.add(x)
    ids = np.asarray(idx.search(q, 10, approx=True)[1])
    rec = np.mean([len(set(ids[r]) & set(gt[r])) / 10 for r in range(300)])
    assert rec >= 0.95, rec
    # deletes invalidate + re-derive the projection
    idx.remove(list(range(100)))
    ids = np.asarray(idx.search(x[:100], 5, approx=True)[1])
    assert not np.isin(ids.ravel(), np.arange(100)).any()


def test_pca_projection_invalidated_on_same_size_rebuild():
    """Review regression: rebuilding with an equal-size corpus must not
    reuse the previous corpus's cached PCA projection (the old revision key
    (n, n_dead) collided on same-size rebuilds)."""
    rng = np.random.default_rng(3)
    nc, n, d = 32, 3000, 64
    ca = rng.standard_normal((nc, d)).astype(np.float32)
    a = (ca[rng.integers(0, nc, n)]
         + 0.2 * rng.standard_normal((n, d))).astype(np.float32)
    cb = 10 + rng.standard_normal((nc, d)).astype(np.float32)  # disjoint
    b = (cb[rng.integers(0, nc, n)]
         + 0.2 * rng.standard_normal((n, d))).astype(np.float32)
    idx = FlatIndex(FlatConfig(dim=d, pca_dim=16, rerank=16))
    idx.add(a)
    _ = idx.search(a[:8], 5, approx=True)   # caches projection of corpus A
    idx.build(b)                            # same size, different corpus
    i = np.asarray(idx.search(b[:128], 1, approx=True)[1])
    assert (i[:, 0] == np.arange(128)).mean() >= 0.95
