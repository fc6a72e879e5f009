"""IVF-Flat engine: recall, balance, incremental adds, persistence, metrics."""
import numpy as np
import pytest

from zvdb_tpu import IVFConfig, IVFIndex, exact_ground_truth


def recall_at_k(ids, gt_ids, k):
    return np.mean(
        [len(set(ids[r, :k]) & set(gt_ids[r, :k])) / k for r in range(ids.shape[0])]
    )


def clustered(n, d, seed, nc=50):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((nc, d)).astype(np.float32)
    a = rng.integers(0, nc, n)
    return (centers[a] + 0.15 * rng.standard_normal((n, d))).astype(np.float32)


def test_ivf_recall_l2(rng):
    n, d, k = 20000, 32, 10
    x = clustered(n, d, seed=1)
    q = x[rng.integers(0, n, 200)] + 0.05 * rng.standard_normal((200, d)).astype(np.float32)
    q = q.astype(np.float32)
    _, gt = exact_ground_truth(x, q, k)
    idx = IVFIndex(IVFConfig(dim=d, n_clusters=64, nprobe=8))
    idx.build(x)
    _, ids = idx.search(q, k)
    r = recall_at_k(np.asarray(ids), gt, k)
    assert r >= 0.92, f"ivf recall {r:.3f}"
    # full probe == exact
    _, ids_full = idx.search(q, k, nprobe=64)
    r_full = recall_at_k(np.asarray(ids_full), gt, k)
    assert r_full >= 0.999, f"full-probe recall {r_full:.4f}"


def test_ivf_recall_improves_with_nprobe(rng):
    n, d, k = 10000, 16, 10
    x = clustered(n, d, seed=2)
    q = clustered(300, d, seed=3)
    _, gt = exact_ground_truth(x, q, k)
    idx = IVFIndex(IVFConfig(dim=d, n_clusters=64))
    idx.build(x)
    rs = []
    for npb in (1, 4, 16, 64):
        _, ids = idx.search(q, k, nprobe=npb)
        rs.append(recall_at_k(np.asarray(ids), gt, k))
    assert rs == sorted(rs) or rs[-1] > 0.99
    assert rs[-1] >= 0.999


def test_ivf_cosine_and_dot(rng):
    n, d, k = 5000, 24, 5
    x = clustered(n, d, seed=4)
    q = clustered(100, d, seed=5)
    for metric in ("cosine", "dot"):
        _, gt = exact_ground_truth(x, q, k, metric=metric)
        idx = IVFIndex(IVFConfig(dim=d, n_clusters=32, nprobe=16, metric=metric))
        idx.build(x)
        s, ids = idx.search(q, k)
        r = recall_at_k(np.asarray(ids), gt, k)
        assert r >= 0.9, f"{metric} recall {r:.3f}"
        s = np.asarray(s)
        assert (np.diff(s, axis=1) <= 1e-5).all()  # similarity descending


def test_ivf_block_balance(rng):
    x = clustered(8000, 16, seed=6)
    idx = IVFIndex(IVFConfig(dim=16, n_clusters=32, max_cluster_factor=1.5))
    idx.build(x)
    counts = np.asarray(idx.state.counts)
    cap = idx.state.blocks.shape[1]
    assert counts.sum() == 8000
    assert (counts <= cap).all()
    ids = np.asarray(idx.state.b_ids)
    live = ids[ids >= 0]
    assert len(live) == 8000 and len(set(live.tolist())) == 8000


def test_ivf_incremental_add(rng):
    x = clustered(4000, 16, seed=7)
    idx = IVFIndex(IVFConfig(dim=16, n_clusters=32, nprobe=8))
    idx.build(x[:3000])
    idx.add(x[3000:])
    assert len(idx) == 4000
    # note: flush re-packs ids; search for a newly added exact point
    s, ids = idx.search(x[3500], 1, nprobe=32)
    assert float(np.asarray(s)[0]) < 1e-6


def test_ivf_int8_blocks(rng):
    # int8 residual storage: 4x memory, ranking nearly preserved
    n, d, k = 8000, 32, 10
    x = clustered(n, d, seed=11)
    q = clustered(200, d, seed=12)
    _, gt = exact_ground_truth(x, q, k)
    idx = IVFIndex(IVFConfig(dim=d, n_clusters=32, nprobe=8, dtype="int8"))
    idx.build(x)
    assert idx.state.blocks.dtype == np.int8
    _, ids = idx.search(q, k)
    r = recall_at_k(np.asarray(ids), gt, k)
    assert r >= 0.9, f"int8 ivf recall {r:.3f}"
    # exact rerank recovers (nearly) full recall on top of int8 scanning
    idx2 = IVFIndex(IVFConfig(dim=d, n_clusters=32, nprobe=8, dtype="int8",
                              rerank=4))
    idx2.build(x)
    _, ids2 = idx2.search(q, k)
    r2 = recall_at_k(np.asarray(ids2), gt, k)
    assert r2 >= r - 1e-6
    assert r2 >= 0.95, f"int8+rerank recall {r2:.3f}"


def test_ivf_save_load(tmp_path, rng):
    x = clustered(3000, 16, seed=8)
    idx = IVFIndex(IVFConfig(dim=16, n_clusters=32))
    idx.build(x)
    q = clustered(20, 16, seed=9)
    s0, i0 = idx.search(q, 5)
    p = str(tmp_path / "ivf.npz")
    idx.save(p)
    loaded = IVFIndex.load(p)
    s1, i1 = loaded.search(q, 5)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_ivf_empty_and_k_gt_n(rng):
    idx = IVFIndex(IVFConfig(dim=8, n_clusters=8))
    s, ids = idx.search(np.zeros((2, 8), np.float32), 3)
    assert (np.asarray(ids) == -1).all()
    idx.build(clustered(5, 8, seed=10))
    s, ids = idx.search(np.zeros((1, 8), np.float32), 10, nprobe=8)
    ids = np.asarray(ids)
    assert (ids >= 0).sum() == 5


def test_pair_scan_matches_grouped_scan():
    """The two scan modes (pair gather vs ScaNN grouping) must agree.

    Mode choice is c*8 > b*p: a small batch takes the pair path, a large
    batch the grouped path — same index, same queries, same results."""
    import jax
    import jax.numpy as jnp

    from zvdb_tpu import IVFConfig, IVFIndex
    from zvdb_tpu.index.ivf import _grouped_scan, _pair_scan
    from zvdb_tpu.ops import distance as D

    rng = np.random.default_rng(5)
    x = rng.standard_normal((4000, 24)).astype(np.float32)
    idx = IVFIndex(IVFConfig(dim=24, n_clusters=64, nprobe=6))
    idx.build(x)
    q = x[:32] + 0.01
    qp = D.preprocess_queries(jnp.asarray(q), "l2")
    st = idx.state
    cs = D.pairwise_scores(qp, st.centroids, st.c_norms, "l2")
    _, probes = jax.lax.top_k(-cs, 6)
    ps, pi = _pair_scan(st, qp, cs, probes, 10, "l2", False)
    gs, gi = _grouped_scan(st, qp, cs, probes, 10, "l2", False, 4.0)
    # same candidates per query (slot layouts differ; compare as sets of
    # (id) with matching scores)
    for r in range(32):
        pd = {int(i): float(s) for s, i in zip(np.asarray(ps)[r], np.asarray(pi)[r]) if i >= 0}
        gd = {int(i): float(s) for s, i in zip(np.asarray(gs)[r], np.asarray(gi)[r]) if i >= 0}
        assert set(pd) == set(gd)
        for i in pd:
            assert abs(pd[i] - gd[i]) < 1e-4


def test_pair_scan_int8_residual_rerank_small_batch():
    # small batch forces the pair path end-to-end with residual codes
    from zvdb_tpu import IVFConfig, IVFIndex

    rng = np.random.default_rng(6)
    centers = rng.standard_normal((40, 16)).astype(np.float32)
    x = (centers[rng.integers(0, 40, 4000)]
         + 0.1 * rng.standard_normal((4000, 16))).astype(np.float32)
    idx = IVFIndex(IVFConfig(dim=16, n_clusters=64, nprobe=8, dtype="int8",
                             rerank=4))
    idx.build(x)
    _, ids = idx.search(x[:8], 1)     # b=8, p=8 -> c*8=512 > 64 -> pair mode
    assert (np.asarray(ids)[:, 0] == np.arange(8)).mean() >= 0.99


def test_ivf_search_range_matches_oracle():
    """IVF range query (mirrors tests/test_flat.py's range block): EXACT
    counts and the max_results globally-best ids despite the probe
    structure — the scan deliberately bypasses probes (a radius cannot be
    probe-bounded) and runs flat over the grouped blocks. Covers deletes,
    dot metric, truncation, the int8-residual routing through the rerank
    shadow store, and the no-shadow int8 error."""
    rng = np.random.default_rng(5)
    n, d = 3000, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = x[:32] + 0.01
    idx = IVFIndex(IVFConfig(dim=d, n_clusters=16, nprobe=2))
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
    # truncation: tiny max_results still reports exact counts
    _, it, ct = idx.search_range(q, r, max_results=4)
    np.testing.assert_array_equal(np.asarray(ct), c2)
    assert ((np.asarray(it) >= 0).sum(1) <= 4).all()
    # dot metric: radius is a similarity floor
    idxd = IVFIndex(IVFConfig(dim=d, metric="dot", n_clusters=16))
    idxd.build(x)
    _, _, cd = idxd.search_range(q, 5.0, max_results=64)
    np.testing.assert_array_equal(np.asarray(cd), (q @ x.T >= 5.0).sum(1))
    # int8 residual blocks: exact through the rerank shadow store
    idx8 = IVFIndex(IVFConfig(dim=d, n_clusters=16, dtype="int8", rerank=4))
    idx8.build(x)
    idx8.remove([0, 1])
    s8, i8, c8 = (np.asarray(v)
                  for v in idx8.search_range(q, r, max_results=64))
    np.testing.assert_array_equal(c8, c2)
    for b in range(32):
        assert set(i8[b][i8[b] >= 0]) == set(i2[b][i2[b] >= 0])
    # LARGE radius on int8: the rerank shadow store is zero-initialized and
    # padded past n — padding rows must never scan as live zero vectors
    # (advisor r4 high: counts inflated by rcap-n at radius >= ||q||^2, and
    # phantom ids >= n could enter results)
    rbig = float((q ** 2).sum(1).max()) + 10.0
    sb, ib, cb = (np.asarray(v)
                  for v in idx8.search_range(q, rbig, max_results=64))
    np.testing.assert_array_equal(cb, (d2m <= rbig).sum(1))
    assert ib.max() < n
    # ...and the int8 filtered masked-scan path has the same live-count gate
    _, iflt = idx8.search(q[:8], 5, allowed=np.arange(n))
    iflt = np.asarray(iflt)
    assert iflt.max() < n and (iflt >= 0).all()
    # int8 WITHOUT a shadow store cannot answer exactly -> explicit error
    idx8n = IVFIndex(IVFConfig(dim=d, n_clusters=16, dtype="int8", rerank=0))
    idx8n.build(x)
    with pytest.raises(ValueError):
        idx8n.search_range(q, r)
    # empty index contract
    e = IVFIndex(IVFConfig(dim=d))
    se, ie, ce = e.search_range(q, r)
    assert (np.asarray(ie) == -1).all() and (np.asarray(ce) == 0).all()
