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
