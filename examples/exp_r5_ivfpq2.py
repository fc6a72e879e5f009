"""Round-5 IVF-PQ 1M recall-wall diagnosis: probe coverage vs scan losses.

exp_r5_ivfpq.py measured recall saturating at 0.9917 from np8 through np64
(slack 4 vs 8 identical; exact probes identical to approx_min_k) — so the
wall is neither slot drops nor probe selection. This script separates the
remaining candidates exactly:

  coverage(p) = fraction of true top-10 neighbors whose ASSIGNED cluster is
      among the query's top-p clusters by exact centroid distance, computed
      host-side from the built index's b_ids (id -> cluster inverse map).
      If coverage(p) ~= recall(p), search is lossless past probing and the
      wall is the build-time ASSIGNMENT (bf16 default-precision matmul in
      ivf._assign — CLAUDE.md: bf16 scoring destroys recall on clustered
      data) or genuine cluster-boundary geometry.

Then A/B: rebuild with ivf._assign forced to HIGHEST precision (monkeypatch;
the build imports it by name at call time) and re-measure coverage + recall.

Run: python examples/exp_r5_ivfpq2.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def id_to_cluster(state) -> np.ndarray:
    """Invert b_ids [C, cap] -> cluster id per external id [n]."""
    ids = np.asarray(state.b_ids)
    c, cap = ids.shape
    dec = np.where(ids <= -2, -2 - ids, ids)
    out = np.full(int(state.n), -1, np.int32)
    rows = np.repeat(np.arange(c, dtype=np.int32), cap)
    flat = dec.reshape(-1)
    ok = flat >= 0
    out[flat[ok]] = rows[ok]
    return out


def coverage(probes: np.ndarray, owner: np.ndarray, gt: np.ndarray,
             p: int) -> float:
    """Mean fraction of gt neighbors whose owner cluster is in probes[:, :p]."""
    hit = (owner[gt][:, :, None] == probes[:, None, :p]).any(axis=2)
    return float(hit.mean())


def main():
    import jax
    from zvdb_tpu.utils.cache import setup_compile_cache
    setup_compile_cache("tpu")
    import jax.numpy as jnp

    from exp_r4_batch1 import batched_ids, corpus_1m, gt_1m, recall_vs, \
        timed_qps
    from zvdb_tpu import IVFPQConfig, IVFPQIndex
    from zvdb_tpu.index import ivf as ivf_mod

    t0 = time.perf_counter()
    jnp.zeros(()).block_until_ready()
    log(f"device init {time.perf_counter() - t0:.1f}s "
        f"backend={jax.default_backend()}")
    k = 10
    x1, q1, fp = corpus_1m()
    gt1 = gt_1m(x1, q1, fp)
    xd1 = jax.device_put(jnp.asarray(x1))
    jax.block_until_ready(xd1)

    base = IVFPQConfig(dim=128, n_sub=16, refine="int16")

    def probe_ranks(cent: np.ndarray, pmax: int = 64) -> np.ndarray:
        """Exact f64 host-side top-pmax clusters per query."""
        cn = (cent.astype(np.float64) ** 2).sum(1)
        out = np.empty((q1.shape[0], pmax), np.int32)
        for lo in range(0, q1.shape[0], 1024):
            qb = q1[lo:lo + 1024].astype(np.float64)
            d = cn[None, :] - 2.0 * qb @ cent.astype(np.float64).T
            out[lo:lo + 1024] = np.argsort(d, axis=1)[:, :pmax]
        return out

    for tag, patch in (("bf16-assign", False), ("f32-assign", True)):
        if patch:
            orig = ivf_mod._assign

            def _assign_hi(x, xn, cent, cn, tile=16384):
                import functools

                from zvdb_tpu.ops import distance as D

                @functools.partial(jax.jit, static_argnames=("tile",))
                def go(x, cent, cn, tile):
                    n = x.shape[0]
                    pad = -(-n // tile) * tile - n
                    xt = jnp.pad(x, ((0, pad), (0, 0))).reshape(
                        -1, tile, x.shape[1])

                    def body(_, xt_i):
                        d = cn[None, :] - 2.0 * jnp.dot(
                            xt_i, cent.T,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
                        return None, jnp.argmin(d, axis=-1).astype(jnp.int32)

                    _, a = jax.lax.scan(body, None, xt)
                    return a.reshape(-1)[:n]

                return go(x, cent, cn, tile)

            ivf_mod._assign = _assign_hi
        try:
            idx = IVFPQIndex(base)
            tb = time.perf_counter()
            idx.build(xd1)
            jax.block_until_ready(idx.state.codes_blocks)
            log(f"{tag} build {time.perf_counter() - tb:.1f}s "
                f"C={idx.state.centroids.shape[0]}")
            owner = id_to_cluster(idx.state)
            probes = probe_ranks(np.asarray(idx.state.centroids))
            for p in (8, 16, 32, 64):
                log(f"{tag} coverage(p={p}) = "
                    f"{coverage(probes, owner, gt1, p):.4f}")
            for np_, rr in ((16, 12), (16, 32)):
                fn = lambda qq: idx.search(qq, k, nprobe=np_, rerank=rr)
                ids = batched_ids(fn, q1)
                r = recall_vs(ids, gt1, k)
                qps = timed_qps(fn, q1)
                log(f"RESULT ivfpq2-1m {tag} np{np_} rr{rr}: "
                    f"recall={r:.4f} qps={qps:,.0f}")
            del idx
        finally:
            if patch:
                ivf_mod._assign = orig
    log("DONE")


if __name__ == "__main__":
    main()
