"""Round-2 correctness fixes & reference-parity gaps.

Covers the advisor findings (IVF rerank-shadow dtype on load, id-stable O(new)
incremental add, bf16 HNSW persistence) and the two reference-surface gaps:
get(ids) -> stored vectors (reference src/hnsw.zig:214,235 returns Node copies
carrying the point; src/test_hnsw.zig:60-66 asserts retrievability) and int8
graph storage (the HNSW(i32) analog, src/test_hnsw.zig:239-273).
"""
import numpy as np
import pytest

from zvdb_tpu import (
    FlatConfig, FlatIndex, HNSW, HNSWConfig, IVFConfig, IVFIndex,
    exact_ground_truth,
)


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
# ADVICE fix: int8+rerank save/load round-trip (shadow dtype must stay f32)


def test_ivf_int8_rerank_save_load_roundtrip(tmp_path, rng):
    n, d, k = 8000, 32, 10
    x = clustered(n, d, seed=11)
    q = x[rng.integers(0, n, 100)] + 0.05 * rng.standard_normal((100, d)).astype(np.float32)
    q = q.astype(np.float32)
    idx = IVFIndex(IVFConfig(dim=d, n_clusters=32, nprobe=8, dtype="int8", rerank=4))
    idx.build(x)
    s0, i0 = idx.search(q, k)
    path = str(tmp_path / "ivf_int8.npz")
    idx.save(path)
    loaded = IVFIndex.load(path)
    s1, i1 = loaded.search(q, k)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# ADVICE fix: add() must preserve external ids and (int8) corpus integrity


@pytest.mark.parametrize("dtype,rerank", [("float32", 0), ("int8", 4)])
def test_ivf_add_preserves_ids_and_recall(dtype, rerank, rng):
    n, d, k = 6000, 32, 5
    x = clustered(n, d, seed=21)
    idx = IVFIndex(IVFConfig(dim=d, n_clusters=32, nprobe=32, dtype=dtype,
                             rerank=rerank))
    idx.build(x)
    # self-query: every point must find itself under its ORIGINAL id
    probe = x[:256]
    _, ids0 = idx.search(probe, 1)
    hit0 = (np.asarray(ids0)[:, 0] == np.arange(256)).mean()
    assert hit0 >= 0.99, f"pre-add self-hit {hit0:.3f}"

    extra = clustered(500, d, seed=22)
    idx.add(extra)
    assert len(idx) == n + 500
    # previously returned ids must still resolve to the same points
    _, ids1 = idx.search(probe, 1)
    hit1 = (np.asarray(ids1)[:, 0] == np.arange(256)).mean()
    assert hit1 >= 0.99, f"post-add self-hit {hit1:.3f} (ids were reassigned?)"
    # new points get the next dense ids and are findable
    _, idsn = idx.search(extra[:64], 1)
    hitn = (np.asarray(idsn)[:, 0] == n + np.arange(64)).mean()
    assert hitn >= 0.95, f"new-point self-hit {hitn:.3f}"
    # int8: distances stay sane after add (the old flush re-quantized codes
    # as raw vectors, exploding mean top-1 distance 0.005 -> 45)
    s, _ = idx.search(probe, 1)
    assert float(np.asarray(s)[:, 0].mean()) < 0.1


def test_ivf_add_appends_in_place_without_repack(rng):
    """Small adds must take the O(new) device-append path (no block-capacity
    change, counts grow in place)."""
    n, d = 4000, 16
    x = clustered(n, d, seed=31)
    idx = IVFIndex(IVFConfig(dim=d, n_clusters=16, nprobe=16))
    idx.build(x)
    cap_before = idx.state.blocks.shape
    counts_before = int(np.asarray(idx.state.counts).sum())
    idx.add(clustered(64, d, seed=32))
    idx.flush()
    assert idx.state.blocks.shape == cap_before, "append must not repack blocks"
    assert int(np.asarray(idx.state.counts).sum()) == counts_before + 64
    assert int(idx.state.n) == n + 64


def test_ivf_add_overflow_repacks_correctly(rng):
    """Overflowing a cluster's spare capacity falls back to a repack that
    keeps ids stable (reconstruction happens in external-id order)."""
    n, d = 2000, 16
    x = clustered(n, d, seed=41, nc=8)
    idx = IVFIndex(IVFConfig(dim=d, n_clusters=8, nprobe=8,
                             block_headroom=1.05))
    idx.build(x)
    # dump many points into one tight cluster to force overflow
    hot = (x[0] + 0.01 * rng.standard_normal((600, d))).astype(np.float32)
    idx.add(hot)
    assert len(idx) == n + 600
    probe = x[:128]
    _, ids = idx.search(probe, 1)
    hit = (np.asarray(ids)[:, 0] == np.arange(128)).mean()
    assert hit >= 0.99, f"post-repack self-hit {hit:.3f}"
    _, idsn = idx.search(hot[:64], 1)
    assert (np.asarray(idsn)[:, 0] >= n).mean() >= 0.9


# ---------------------------------------------------------------------------
# ADVICE fix: bf16 HNSW persistence


def test_hnsw_bf16_save_load_roundtrip(tmp_path, rng):
    x = rng.standard_normal((1200, 16)).astype(np.float32)
    idx = HNSW(HNSWConfig(dim=16, m=8, ef_construction=48, build_batch=512,
                          dtype="bfloat16"))
    idx.build(x)
    q = rng.standard_normal((16, 16)).astype(np.float32)
    s0, i0 = idx.search(q, 5)
    path = str(tmp_path / "bf16.npz")
    idx.save(path)
    loaded = HNSW.load(path)
    s1, i1 = loaded.search(q, 5)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-5)


# ---------------------------------------------------------------------------
# parity gap: get(ids) -> stored vectors, every engine


def test_flat_get_returns_stored_vectors(rng):
    x = rng.standard_normal((500, 24)).astype(np.float32)
    idx = FlatIndex(FlatConfig(dim=24), capacity=500)
    idx.add(x)
    ids = np.array([0, 17, 499])
    np.testing.assert_allclose(idx.get(ids), x[ids], rtol=1e-6)
    with pytest.raises(IndexError):
        idx.get([500])
    with pytest.raises(IndexError):
        idx.get([-1])


def test_flat_get_int8_dequantizes(rng):
    x = rng.standard_normal((300, 16)).astype(np.float32)
    idx = FlatIndex(FlatConfig(dim=16, dtype="int8"), capacity=300)
    idx.add(x)
    got = idx.get(np.arange(300))
    err = np.abs(got - x).max()
    assert err < np.abs(x).max() / 100, f"int8 reconstruction err {err}"


def test_hnsw_get_returns_stored_vectors(rng):
    x = rng.standard_normal((800, 16)).astype(np.float32)
    idx = HNSW(HNSWConfig(dim=16, m=8, ef_construction=32, build_batch=256))
    idx.build(x)
    ids = np.array([3, 100, 799])
    np.testing.assert_allclose(idx.get(ids), x[ids], rtol=1e-6)
    # the reference contract: a searched point's returned id resolves to its
    # stored vector (src/test_hnsw.zig:60-66)
    s, i = idx.search(x[42], 1)
    np.testing.assert_allclose(idx.get(int(np.asarray(i)[0]))[0], x[42], rtol=1e-6)
    # incremental inserts are retrievable too
    extra = rng.standard_normal((10, 16)).astype(np.float32)
    idx.insert(extra)
    np.testing.assert_allclose(idx.get([800, 809]), extra[[0, 9]], rtol=1e-6)
    with pytest.raises(IndexError):
        idx.get([810])


def test_ivf_get_returns_stored_vectors(rng):
    x = clustered(2000, 16, seed=51)
    idx = IVFIndex(IVFConfig(dim=16, n_clusters=16))
    idx.build(x)
    ids = np.array([0, 1234, 1999])
    np.testing.assert_allclose(idx.get(ids), x[ids], rtol=1e-5, atol=1e-6)
    # int8 without rerank: dequantized within quantization error
    idx8 = IVFIndex(IVFConfig(dim=16, n_clusters=16, dtype="int8"))
    idx8.build(x)
    got = idx8.get(ids)
    assert np.abs(got - x[ids]).max() < 0.05
    with pytest.raises(IndexError):
        idx.get([2000])


# ---------------------------------------------------------------------------
# parity gap: int8 graph storage (HNSW(i32) analog)


def test_hnsw_int8_storage_recall_and_roundtrip(tmp_path, rng):
    # The reference's HNSW(i32) analog (src/test_hnsw.zig:239-273): integer
    # codes + one dequant scale. int8 is a LOSSY representation, so the
    # engine is judged against exact kNN over the dequantized corpus (what a
    # perfect search of the stored data would return); recall vs the f32
    # corpus is additionally bounded below (representation loss only).
    n, d, k = 8000, 32, 10
    x = clustered(n, d, seed=61)
    q = x[rng.integers(0, n, 200)] + 0.05 * rng.standard_normal((200, d)).astype(np.float32)
    q = q.astype(np.float32)
    _, gt = exact_ground_truth(x, q, k)
    idx = HNSW(HNSWConfig(dim=d, m=12, ef_construction=64, build_batch=1024,
                          dtype="int8"))
    idx.build(x)
    assert str(idx.state.vectors.dtype) == "int8"
    _, ids = idx.search(q, k, ef_search=64)
    # graph quality: vs exact search of the same (dequantized) stored data
    x_deq = idx.get(np.arange(n))
    _, gt_deq = exact_ground_truth(x_deq, q, k)
    r_deq = recall_at_k(np.asarray(ids), gt_deq, k)
    assert r_deq >= 0.85, f"int8 hnsw recall vs dequantized oracle {r_deq:.3f}"
    # end-to-end: representation loss bounds recall vs the f32 corpus
    r = recall_at_k(np.asarray(ids), gt, k)
    assert r >= 0.55, f"int8 hnsw recall vs f32 oracle {r:.3f}"
    # persistence round-trips codes + scale
    path = str(tmp_path / "hnsw_int8.npz")
    idx.save(path)
    loaded = HNSW.load(path)
    s1, i1 = loaded.search(q[:16], k, ef_search=64)
    s0, i0 = idx.search(q[:16], k, ef_search=64)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    # get() dequantizes: error bounded by half a quant step per component
    got = idx.get(np.arange(64))
    step = float(np.abs(x).max()) / 127.0
    assert np.abs(got - x[:64]).max() <= 0.51 * step + 1e-6


def test_hnsw_int8_unit_scale_floats_functional(rng):
    # Unit-scale float data: int8 quant noise is comparable to neighbor gaps,
    # so recall degrades but the engine must stay functional and well-ordered.
    n, d, k = 4000, 32, 10
    x = clustered(n, d, seed=62)
    q = x[rng.integers(0, n, 100)].astype(np.float32)
    _, gt = exact_ground_truth(x, q, k)
    idx = HNSW(HNSWConfig(dim=d, m=12, ef_construction=64, build_batch=1024,
                          dtype="int8"))
    idx.build(x)
    s, ids = idx.search(q, k, ef_search=64)
    r = recall_at_k(np.asarray(ids), gt, k)
    assert r >= 0.55, f"int8 hnsw float recall {r:.3f}"
    s = np.asarray(s)
    assert (np.diff(s, axis=1) >= -1e-5).all(), "scores must ascend"


def test_hnsw_int8_incremental_insert(rng):
    x = clustered(2000, 16, seed=71)
    idx = HNSW(HNSWConfig(dim=16, m=8, ef_construction=32, build_batch=512,
                          dtype="int8"))
    idx.build(x)
    extra = clustered(100, 16, seed=72)
    idx.insert(extra)
    _, ids = idx.search(extra[:32], 1, ef_search=48)
    hit = (np.asarray(ids)[:, 0] == 2000 + np.arange(32)).mean()
    assert hit >= 0.85, f"int8 insert self-hit {hit:.2f}"
