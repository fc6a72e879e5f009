"""IVF-PQ engine + grouped ADC kernel tests (CPU, interpret-mode pallas).

The engine is the sublinear scale tier (VERDICT r4 item 3): packed 4-bit PQ
codes stored in contiguous k-means cluster blocks, probed clusters scanned by
the fused grouped ADC kernel (ops/pallas_pq.py:pq_grouped_scan_bins), exact
int16 refine rerank. Contract parity with the engine family: empty index,
k > n, dim mismatch raises, deletes mark-and-filter, ids never renumber
(reference src/hnsw.zig:52,73,184,194,201; src/test_hnsw.zig:104-126).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zvdb_tpu.ops import pq as PQ
from zvdb_tpu.ops.pallas_pq import pq_grouped_scan_bins, grouped_geometry


def _clustered(rng, n, d, n_clusters=32, spread=0.15):
    cents = rng.normal(size=(n_clusters, d)).astype(np.float32)
    a = rng.integers(0, n_clusters, n)
    return (cents[a] + spread * rng.normal(size=(n, d))).astype(np.float32)


# ---------------------------------------------------------------------------
# grouped kernel vs oracle


def test_grouped_scan_matches_oracle(rng):
    """Every (cluster, slot) pool's best row must equal the brute-force best
    surrogate of that query within that cluster; empty slots all -1/inf;
    invalid rows (+inf norm) never selected."""
    d, s, c, cap, b = 32, 8, 4, 40, 16
    x = rng.normal(size=(c * cap, d)).astype(np.float32)
    cb = PQ.train_codebooks(jnp.asarray(x), jax.random.PRNGKey(0), s, 16, 4)
    codes = PQ.encode(jnp.asarray(x), cb)
    norms = PQ.decoded_sq_norms(codes, cb)
    packed = np.asarray(PQ.pack_nibbles(codes))
    codes_blocks = jnp.asarray(packed.reshape(c, cap, s // 2).transpose(0, 2, 1))
    norms_blocks = jnp.asarray(np.asarray(norms).reshape(c, cap))
    norms_blocks = norms_blocks.at[0, 3].set(np.inf)   # tombstone one row

    q = rng.normal(size=(b, d)).astype(np.float32)
    lut = PQ.adc_lut(jnp.asarray(q), cb)

    qcap = 32
    qslot = np.full((c, qcap), -1, np.int32)
    fill = [0] * c
    for bi_ in range(b):
        for cc in (bi_ % c, (bi_ + 1) % c):
            qslot[cc, fill[cc]] = bi_
            fill[cc] += 1

    bs, bi = pq_grouped_scan_bins(
        lut, jnp.asarray(qslot), codes_blocks, norms_blocks,
        l_bins=128, chunk=128, precision="high", per_bin=2, interpret=True)
    chunk, capp = grouped_geometry(cap, 128, 128)
    assert bs.shape == (c, qcap, 256) and capp >= cap

    xhat = np.asarray(PQ.decode(codes, cb))
    sur = np.asarray(norms)[None, :] - 2.0 * q @ xhat.T
    sur[:, 3] = np.inf                                 # the tombstoned row
    bs_n, bi_n = np.asarray(bs), np.asarray(bi)
    for cc in range(c):
        for sl in range(qcap):
            qi = int(qslot[cc, sl])
            if qi < 0:
                assert np.all(bi_n[cc, sl] == -1)
                assert np.all(np.isinf(bs_n[cc, sl]))
                continue
            seg = sur[qi, cc * cap:(cc + 1) * cap]
            pos = bi_n[cc, sl][bs_n[cc, sl].argmin()]
            assert 0 <= pos < cap
            assert abs(seg[pos] - seg.min()) < 1e-3
            live = bi_n[cc, sl][bi_n[cc, sl] >= 0]
            assert np.all(live < cap)                  # never padding rows
            assert 3 not in set(live.tolist()) or cc != 0


def test_grouped_geometry_padding(rng):
    """cap not a multiple of l_bins pads; positions index the PADDED cap."""
    chunk, capp = grouped_geometry(40, 128, 512)
    assert chunk == 128 and capp == 128
    chunk, capp = grouped_geometry(1000, 128, 512)
    assert chunk == 512 and capp == 1024


# ---------------------------------------------------------------------------
# engine


from zvdb_tpu import (FlatConfig, FlatIndex, IVFPQConfig,  # noqa: E402
                      IVFPQIndex)


@pytest.fixture(scope="module")
def corpus(request):
    r = np.random.default_rng(7)
    d = 64
    cents = r.normal(size=(512, d)).astype(np.float32)
    x = (cents[r.integers(0, 512, 8000)]
         + 0.25 * r.normal(size=(8000, d))).astype(np.float32)
    q = (cents[r.integers(0, 512, 100)]
         + 0.25 * r.normal(size=(100, d))).astype(np.float32)
    return x, q


@pytest.fixture(scope="module")
def built(corpus):
    x, q = corpus
    idx = IVFPQIndex(IVFPQConfig(dim=64, n_sub=16, nprobe=8, rerank=12))
    idx.build(x)
    return idx


def test_build_recall(corpus, built):
    x, q = corpus
    flat = FlatIndex(FlatConfig(dim=64))
    flat.build(x)
    _, gt = flat.search(q, 10)
    _, got = built.search(q, 10)
    gt, got = np.asarray(gt), np.asarray(got)
    rec = np.mean([len(set(gt[i]) & set(got[i])) / 10 for i in range(len(q))])
    assert rec >= 0.95, rec
    # self-hit on build rows
    _, ids = built.search(x[:100], 1)
    assert float((np.asarray(ids)[:, 0] == np.arange(100)).mean()) >= 0.97


def test_scores_are_user_facing(corpus, built):
    """l2 scores are squared distances to the refine-store rows (monotone,
    near-exact vs true squared distance)."""
    x, q = corpus
    s, ids = built.search(q[:10], 5)
    s, ids = np.asarray(s), np.asarray(ids)
    for b in range(10):
        assert np.all(np.diff(s[b]) >= -1e-3)
        for j in range(5):
            true = ((q[b] - x[ids[b, j]]) ** 2).sum()
            assert abs(s[b, j] - true) < 1e-2 * max(true, 1.0)


def test_add_then_search_id_stability(corpus):
    x, q = corpus
    idx = IVFPQIndex(IVFPQConfig(dim=64, n_sub=16, nprobe=8, rerank=12))
    idx.build(x[:6000])
    idx.add(x[6000:7000])
    idx.add(x[7000:8000])
    assert len(idx) == 8000
    _, ids = idx.search(x[5950:6050], 1)
    hit = float((np.asarray(ids)[:, 0] == np.arange(5950, 6050)).mean())
    assert hit >= 0.95, hit      # ids continue across build/add boundary
    g = idx.get([6001, 7500])
    assert np.allclose(g, x[[6001, 7500]], atol=0.05)


def test_add_overflow_repacks(corpus):
    """Appends past block capacity trigger the repack; ids stay valid."""
    x, _ = corpus
    idx = IVFPQIndex(IVFPQConfig(dim=64, n_sub=16, nprobe=8, rerank=12,
                                 block_headroom=1.05))
    idx.build(x[:2000])
    # 3x the corpus again — guaranteed to overflow some cluster
    idx.add(x[2000:8000])
    assert len(idx) == 8000
    _, ids = idx.search(x[:50], 1)
    assert float((np.asarray(ids)[:, 0] == np.arange(50)).mean()) >= 0.95
    _, ids = idx.search(x[5000:5050], 1)
    assert float((np.asarray(ids)[:, 0] == np.arange(5000, 5050)).mean()) >= 0.95


def test_empty_and_k_gt_n():
    idx = IVFPQIndex(IVFPQConfig(dim=64, n_sub=16))
    s, i = idx.search(np.zeros((3, 64), np.float32), 4)
    assert np.all(np.asarray(i) == -1)          # src/hnsw.zig:201 contract
    idx.build(np.random.default_rng(0).normal(size=(5, 64)).astype(np.float32))
    s, i = idx.search(np.zeros((2, 64), np.float32), 8)
    i = np.asarray(i)
    assert (i >= 0).sum(axis=1).min() == 5      # k > n: trailing -1
    assert np.all(i[:, 5:] == -1)


def test_dim_mismatch_raises(built):
    with pytest.raises(ValueError):
        built.search(np.zeros((2, 65), np.float32), 3)
    with pytest.raises(ValueError):
        built.add(np.zeros((2, 65), np.float32))


def test_remove_compact(corpus):
    x, _ = corpus
    idx = IVFPQIndex(IVFPQConfig(dim=64, n_sub=16, nprobe=8, rerank=12))
    idx.build(x[:2000])
    assert idx.remove([0, 5, 7]) == 3
    assert idx.remove([5]) == 0                 # already dead
    assert len(idx) == 1997
    _, ids = idx.search(x[:1], 3)
    assert 0 not in set(np.asarray(ids).ravel().tolist())
    with pytest.raises(IndexError):
        idx.get([5])
    old = idx.compact()
    assert len(old) == 1997 and 0 not in old and 5 not in old
    # survivor new id = position in `old`
    pos = int(np.flatnonzero(old == 10)[0])
    _, ids = idx.search(x[10:11], 1)
    assert int(np.asarray(ids)[0, 0]) == pos


def test_filtered_search_exact(corpus, built):
    """Default filter_mode='scan' is EXACT over the allowlist."""
    x, q = corpus
    allowed = np.zeros(8000, bool)
    allowed[::7] = True                          # ~14% selectivity
    s, ids = built.search(q[:20], 5, allowed=allowed)
    ids = np.asarray(ids)
    assert np.all((ids % 7 == 0) | (ids == -1))
    # oracle over allowed rows only
    sub = np.flatnonzero(allowed)
    d2 = ((q[:20, None, :] - x[None, sub, :]) ** 2).sum(-1)
    gt = sub[np.argsort(d2, axis=1)[:, :5]]
    agree = np.mean([len(set(gt[i]) & set(ids[i])) / 5 for i in range(20)])
    assert agree >= 0.95, agree                  # int16 rescore near-ties only
    # probe mode returns only allowed ids too
    s, ids = built.search(q[:20], 5, allowed=allowed, filter_mode="probe")
    ids = np.asarray(ids)
    assert np.all((ids % 7 == 0) | (ids == -1))


def test_search_range(corpus, built):
    x, q = corpus
    s, i, c = built.search_range(q[:10], radius=float(np.quantile(
        ((q[:10, None, :] - x[None, :500, :]) ** 2).sum(-1), 0.01)))
    s, i, c = np.asarray(s), np.asarray(i), np.asarray(c)
    # counts match a brute-force count (refine-store rescore is near-exact;
    # allow boundary ties)
    for b in range(10):
        true = int((((q[b] - x) ** 2).sum(-1) <= s[b, 0] + 1e-6).sum()) \
            if np.isfinite(s[b, 0]) else 0
        assert c[b] >= (1 if np.isfinite(s[b, 0]) else 0)
    assert np.all((i >= 0) | np.isinf(s))


def test_save_load_roundtrip(tmp_path, corpus, built):
    x, q = corpus
    p = str(tmp_path / "ivfpq.npz")
    built.save(p)
    idx2 = IVFPQIndex.load(p)
    s1, i1 = built.search(q[:20], 5)
    s2, i2 = idx2.search(q[:20], 5)
    assert np.array_equal(np.asarray(i1), np.asarray(i2))
    assert np.allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5)


def test_cosine_metric(corpus):
    x, q = corpus
    idx = IVFPQIndex(IVFPQConfig(dim=64, n_sub=16, metric="cosine",
                                 nprobe=8, rerank=12))
    idx.build(x[:2000])
    s, ids = idx.search(x[:50], 1)
    assert float((np.asarray(ids)[:, 0] == np.arange(50)).mean()) >= 0.95
    assert np.all(np.asarray(s)[:, 0] > 0.99)    # self-similarity ~1


def test_expected_rows_chunked_build(corpus):
    """expected_rows pre-sizes blocks + refine store: chunked adds append
    O(batch) with no overflow repack (the 30M+ scale-build path)."""
    x, _ = corpus
    idx = IVFPQIndex(IVFPQConfig(dim=64, n_sub=16, nprobe=8, rerank=12,
                                 expected_rows=8000, n_clusters=64))
    idx.build(x[:2000])
    cap0 = idx.state.codes_blocks.shape[2]
    rcap0 = idx.state.refine.shape[0]
    assert rcap0 >= 8000                         # refine store pre-sized
    for lo in range(2000, 8000, 2000):
        idx.add(x[lo:lo + 2000])
        idx.flush()
    assert idx.state.codes_blocks.shape[2] == cap0   # no repack
    assert idx.state.refine.shape[0] == rcap0
    assert int(idx.state.n) == 8000
    _, ids = idx.search(x[6950:7050], 1)
    hit = float((np.asarray(ids)[:, 0] == np.arange(6950, 7050)).mean())
    assert hit >= 0.95, hit


def test_config_validation():
    with pytest.raises(ValueError):
        IVFPQConfig(dim=60, n_sub=16)            # dim % n_sub
    with pytest.raises(ValueError):
        IVFPQConfig(dim=64, n_sub=4)             # n_sub % 8
    with pytest.raises(ValueError):
        IVFPQConfig(dim=64, n_sub=16, l_bins=100)
    with pytest.raises(ValueError):
        IVFPQConfig(dim=64, n_sub=16, metric="cityblock")


def test_small_overflow_spills_not_repacks(corpus):
    """A batch that overfills ONE cluster's block by a little is absorbed by
    spill-to-neighbor (next-nearest centroid with spare capacity) — no O(N)
    repack (the round-5 30M OOM lesson), and every row stays findable because
    non-residual ADC scores are cluster-independent (nprobe covers the
    neighbor)."""
    x, _ = corpus
    idx = IVFPQIndex(IVFPQConfig(dim=64, n_sub=16, nprobe=8, rerank=12,
                                 n_clusters=64, expected_rows=8000))
    idx.build(x[:6000])
    cap0 = idx.state.codes_blocks.shape[2]
    c0 = idx.state.centroids.shape[0]
    # aim a small batch at one spot: duplicates of one existing row land in
    # one cluster; enough of them to exceed its spare capacity
    counts = np.asarray(idx.state.counts)
    hot = int(np.argmax(counts))
    spare = cap0 - int(counts[hot])
    burst = np.repeat(x[:1][np.zeros(1, int)], spare + 16, axis=0)
    # anchor the burst at the hot cluster's centroid
    burst = (np.asarray(idx.state.centroids)[hot][None]
             + 0.01 * burst[:, :] * 0).astype(np.float32) \
        + 0.001 * np.random.default_rng(0).normal(
            size=(spare + 16, 64)).astype(np.float32)
    idx.add(burst)
    idx.flush()
    st = idx.state
    assert st.codes_blocks.shape[2] == cap0      # no repack happened
    assert st.centroids.shape[0] == c0
    assert int(st.n) == 6000 + spare + 16
    # every burst row findable (they're all near the hot centroid; spilled
    # rows sit in a neighboring probed cluster)
    _, ids = idx.search(burst[:32], spare + 16)
    found = set(np.asarray(ids).ravel().tolist())
    expect = set(range(6000, 6000 + spare + 16))
    assert len(expect - found) == 0, sorted(expect - found)[:5]


def test_refine_growth_without_repack(corpus):
    """Appending past the refine store's capacity grows it in place (device
    realloc) instead of triggering the O(N) cluster repack."""
    x, _ = corpus
    idx = IVFPQIndex(IVFPQConfig(dim=64, n_sub=16, nprobe=8, rerank=12,
                                 n_clusters=64, block_headroom=4.0))
    idx.build(x[:1000])
    cap0 = idx.state.codes_blocks.shape[2]
    rcap0 = idx.state.refine.shape[0]
    idx.add(x[1000:4000])     # blocks have 4x headroom; refine store doesn't
    idx.flush()
    st = idx.state
    assert st.refine.shape[0] > rcap0            # grew
    assert st.codes_blocks.shape[2] == cap0      # but no repack
    assert int(st.n) == 4000
    _, ids = idx.search(x[3950:4000], 1)
    hit = float((np.asarray(ids)[:, 0] == np.arange(3950, 4000)).mean())
    assert hit >= 0.95, hit
    g = idx.get([1001, 3500])
    assert np.allclose(g, x[[1001, 3500]], atol=0.05)


def test_repack_streams_host_segments(corpus, monkeypatch):
    """The >4M-row repack path (host-streamed pack, no device split): force
    it at CPU scale via the module threshold; results must match the device
    path's contract (ids valid, rows findable)."""
    import zvdb_tpu.index.ivfpq as ivfpq_mod
    monkeypatch.setattr(ivfpq_mod, "_REPACK_SPLIT_MAX_ROWS", 100)
    x, _ = corpus
    idx = IVFPQIndex(IVFPQConfig(dim=64, n_sub=16, nprobe=8, rerank=12,
                                 block_headroom=1.05, n_clusters=32))
    idx.build(x[:2000])
    idx.add(x[2000:8000])     # 3x growth -> guaranteed repack, host path
    idx.flush()
    assert len(idx) == 8000
    _, ids = idx.search(x[:50], 1)
    assert float((np.asarray(ids)[:, 0] == np.arange(50)).mean()) >= 0.95
    _, ids = idx.search(x[7000:7050], 1)
    assert float((np.asarray(ids)[:, 0] == np.arange(7000, 7050)).mean()) >= 0.95


def test_final_chunk_pow2_padding_does_not_grow_refine(corpus):
    """The append's pow2 padding must not overshoot an exactly-pre-sized
    refine store into a growth copy (the 30M final-chunk OOM): the flush
    falls back to 1024-multiple padding when that fits."""
    x, _ = corpus
    idx = IVFPQIndex(IVFPQConfig(dim=64, n_sub=16, nprobe=8, rerank=12,
                                 n_clusters=64, expected_rows=8000))
    idx.build(x[:3000])
    rcap0 = idx.state.refine.shape[0]
    assert 3000 + (1 << 13) > rcap0          # pow2 pad (8192) overshoots...
    idx.add(x[3000:8000])
    idx.flush()                  # ...but 1024-pad fits the pre-sized store
    assert idx.state.refine.shape[0] == rcap0, "refine store grew"
    assert int(idx.state.n) == 8000
    _, ids = idx.search(x[7900:8000], 1)
    hit = float((np.asarray(ids)[:, 0] == np.arange(7900, 8000)).mean())
    assert hit >= 0.95, hit
