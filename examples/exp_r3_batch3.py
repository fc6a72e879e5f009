"""Round-3 TPU experiment batch #3.

  1. block-kNN pass after the diagonal-mask fix (einsum_only/approx/binfold)
  2. cagra 100k warm build, host + device-resident, after all round-3 fixes
  3. 1M cagra recall+QPS sweep with CORRECT ground truth (batch #2's recalls
     used a stale /tmp gt cache whose q1 came from a different rng state) —
     anchors x search_degree x ef x max_iters
  4. flat 1M pallas bf16-scan + rerank: l_bins 256/512/1024 recall + QPS
  5. IVF build cost: kmeans_iters x kmeans_sample -> build time + recall

Replicates bench.py's exact rng sequence so recalls are bench-comparable.
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("ZVDB_BUILD_TRACE", "1")

import jax
import jax.numpy as jnp
import numpy as np

from zvdb_tpu.utils.cache import setup_compile_cache
setup_compile_cache("tpu")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timed_qps(search_fn, staged, reps=3):
    best = 0.0
    nq = sum(s.shape[0] for s in staged)
    for _ in range(2):
        outs = []
        t0 = time.perf_counter()
        for _ in range(reps):
            for qb in staged:
                outs.append(search_fn(qb))
        jax.block_until_ready(outs)
        best = max(best, reps * nq / (time.perf_counter() - t0))
    return best


def main():
    from zvdb_tpu import (
        CagraConfig, CagraIndex, FlatConfig, FlatIndex, IVFConfig, IVFIndex,
    )
    from zvdb_tpu.bench.harness import recall_at_k
    from zvdb_tpu.io.datasets import load_dataset, synthetic_clustered

    n, d, nq, k = 100_000, 128, 10_000, 10
    x, q_, _, metric = load_dataset("sift1m", max_rows=n)
    x = np.ascontiguousarray(x[:n], np.float32)
    # EXACT bench.py rng sequence (bench.py:90-92 then :253-254)
    rng = np.random.default_rng(9)
    q = (x[rng.integers(0, n, nq)]
         + 0.05 * rng.standard_normal((nq, d))).astype(np.float32)

    t0 = time.time()
    _ = float((jnp.ones((8, 128)) @ jnp.ones((128, 8))).sum())
    log(f"device init {time.time()-t0:.1f}s")

    # 100k gt (bench cache is rng-compatible by construction)
    gt_cache = f"/tmp/zvdb_gt_clustered_{n}_{d}_{nq}_{k}.npz"
    if os.path.exists(gt_cache):
        gt = np.load(gt_cache)["gt"]
    else:
        oracle = FlatIndex(FlatConfig(dim=d, precision="highest"), capacity=n)
        oracle.add(x)
        gt = np.concatenate([
            np.asarray(oracle.search(q[lo:lo + 2048], k)[1])
            for lo in range(0, nq, 2048)])
        np.savez(gt_cache, gt=gt)
        del oracle
    log("gt100k ready")

    # ---- 1. block-kNN after mask fix ------------------------------------
    import functools
    import math

    from zvdb_tpu.index.knn_graph import (
        _assign_spill, _block_knn_scatter, _kmeans_device, _pack_blocks,
    )
    from zvdb_tpu.ops import distance as D

    xj = jnp.asarray(x)
    xn = D.sq_norms(xj)
    with jax.default_matmul_precision("high"):
        cent = _kmeans_device(xj, 195, 3, jax.random.PRNGKey(0))
        assign, _ = _assign_spill(xj, xn, cent, D.sq_norms(cent), 2, "l2")
    assign_np = np.asarray(assign)
    bcap = max(8, int(math.ceil(1.6 * 2 * n / 195 / 8.0)) * 8)
    block_pts, block_occ, _ = _pack_blocks(assign_np, 195, bcap)
    kc = 16
    cc = max(1, (1 << 25) // max(bcap * bcap, 1))
    c_blocks = block_pts.shape[0]

    def run_blocks(sel):
        cand_s = jnp.full((n + 1, 4, kc), jnp.inf, jnp.float32)
        cand_i = jnp.full((n + 1, 4, kc), -1, jnp.int32)
        t0 = time.perf_counter()
        with jax.default_matmul_precision("high"):
            for lo in range(0, c_blocks, cc):
                hi = min(lo + cc, c_blocks)
                bp = np.full((cc, bcap), -1, np.int32)
                bo = np.zeros((cc, bcap), np.int32)
                bp[: hi - lo] = block_pts[lo:hi]
                bo[: hi - lo] = block_occ[lo:hi]
                cand_s, cand_i = _block_knn_scatter(
                    xj, xn, jnp.asarray(bp), jnp.asarray(bo),
                    jnp.asarray(0, jnp.int32), cand_s, cand_i, kc, "l2",
                    sel=sel)
        jax.block_until_ready(cand_s)
        return time.perf_counter() - t0

    for sel in ("approx", "binfold"):
        run_blocks(sel)
        emit(exp="block_sel_maskfix", mode=sel,
             s=round(min(run_blocks(sel), run_blocks(sel)), 4))

    # ---- 2. cagra 100k builds (all round-3 fixes) -----------------------
    cfg = CagraConfig(dim=d, degree=32, metric=metric)
    warm = CagraIndex(cfg)
    warm.build(x)
    jax.block_until_ready(warm.state)
    del warm
    best = float("inf")
    for _ in range(3):
        idx = CagraIndex(cfg)
        t0 = time.perf_counter()
        idx.build(x)
        jax.block_until_ready(idx.state)
        best = min(best, time.perf_counter() - t0)
    ids = np.concatenate([np.asarray(idx.search(q[lo:lo + 5000], k,
                                                ef_search=12)[1])
                          for lo in range(0, nq, 5000)])
    emit(exp="cagra_100k_host", s=round(best, 3), pps=round(n / best, 1),
         recall=round(recall_at_k(ids, gt, k), 4))
    xd = jax.device_put(x)
    jax.block_until_ready(xd)
    best = float("inf")
    for _ in range(3):
        idx = CagraIndex(cfg)
        t0 = time.perf_counter()
        idx.build(xd)
        jax.block_until_ready(idx.state)
        best = min(best, time.perf_counter() - t0)
    emit(exp="cagra_100k_device", s=round(best, 3), pps=round(n / best, 1))
    del idx, xd

    # ---- 5. IVF build cost sweep (before the big 1M allocs) -------------
    for iters, sample in ((12, 131072), (6, 131072), (6, 65536), (4, 65536)):
        icfg = IVFConfig(dim=d, n_clusters=1024, nprobe=8, metric=metric,
                         kmeans_iters=iters, kmeans_sample=sample)
        warm = IVFIndex(icfg)
        warm.build(x)
        jax.block_until_ready(warm.state)
        del warm
        best = float("inf")
        for _ in range(2):
            ivf = IVFIndex(icfg)
            t0 = time.perf_counter()
            ivf.build(x)
            jax.block_until_ready(ivf.state)
            best = min(best, time.perf_counter() - t0)
        ids = np.concatenate([
            np.asarray(ivf.search(q[lo:lo + 5000], k, nprobe=2)[1])
            for lo in range(0, nq, 5000)])
        emit(exp="ivf_build_sweep", iters=iters, sample=sample,
             s=round(best, 3), pps=round(n / best, 1),
             recall_np2=round(recall_at_k(ids, gt, k), 4))
        del ivf

    # ---- 3. 1M cagra with correct gt ------------------------------------
    n1 = 1_000_000
    x1 = synthetic_clustered(n1, d, n_clusters=10_000, seed=0)
    q1 = (x1[rng.integers(0, n1, nq)]
          + 0.05 * rng.standard_normal((nq, d))).astype(np.float32)
    # NOTE: bench.py's q1 uses the rng state after its 100k q draw; this
    # script replicated that draw above, so q1 here == bench.py's q1 and the
    # driver's cache file is safe to share.
    gt1_cache = f"/tmp/zvdb_gt1m_{d}_{nq}_{k}.npz"
    oracle = FlatIndex(FlatConfig(dim=d, precision="highest",
                                  tile_n=262144), capacity=n1)
    oracle.add(x1)
    gt1 = np.concatenate([
        np.asarray(oracle.search(q1[lo:lo + 2048], k)[1])
        for lo in range(0, nq, 2048)])
    np.savez(gt1_cache, gt=gt1)   # overwrite any stale cache
    del oracle
    log("gt1m recomputed")

    cfg1 = CagraConfig(dim=d, degree=32, metric=metric)
    idx1 = CagraIndex(cfg1)
    idx1.build(x1)
    jax.block_until_ready(idx1.state)
    staged = [jax.device_put(jnp.asarray(q1[lo:lo + 5000]))
              for lo in range(0, nq, 5000)]
    jax.block_until_ready(staged)
    from zvdb_tpu.index.cagra import _reseed_anchors

    combos = [
        (131072, 12, 24, None),
        (131072, 12, 24, 6),
        (131072, 12, 16, 6),
        (262144, 12, 24, 6),
        (262144, 10, 16, 5),
        (262144, 16, 24, 6),
        (262144, 12, 16, 4),
        (262144, 24, 24, None),
    ]
    cur_a = None
    for (na, ef, sd, mi) in combos:
        if na != cur_a:
            idx1.state = _reseed_anchors(idx1.state, n1,
                                         jax.random.PRNGKey(42), na)
            idx1._packed_table = None
            cur_a = na
        idx1.cfg = dataclasses.replace(cfg1, n_anchors=na, search_degree=sd,
                                       max_iters=mi)
        ids = np.concatenate([
            np.asarray(idx1.search(qb, k, ef_search=ef)[1]) for qb in staged])
        rec = recall_at_k(ids, gt1, k)
        qps = timed_qps(lambda qb: idx1.search(qb, k, ef_search=ef), staged)
        emit(exp="cagra_1m", anchors=na, ef=ef, sd=sd, max_iters=mi,
             recall=round(rec, 4), qps=round(qps, 1))
    del idx1

    # ---- 4. flat 1M pallas rerank: l_bins sweep -------------------------
    staged2 = [jax.device_put(jnp.asarray(q1[lo:lo + 2048]))
               for lo in range(0, nq, 2048)]
    jax.block_until_ready(staged2)
    for scan, lbins in (("xla", 0), ("pallas", 256), ("pallas", 512),
                        ("pallas", 1024)):
        fl = FlatIndex(
            FlatConfig(dim=d, metric=metric, rerank=4, recall_target=0.97,
                       tile_n=500_000, scan=scan, l_bins=lbins or 256,
                       pallas_chunk=4096, pallas_bq=512),
            capacity=n1)
        fl.add(x1)
        jax.block_until_ready(fl.state)
        ids = np.concatenate([
            np.asarray(fl.search(qb, k, approx=True)[1]) for qb in staged2])
        rec = recall_at_k(ids, gt1, k)
        qps = timed_qps(lambda qb: fl.search(qb, k, approx=True), staged2)
        emit(exp="flat_1m_rerank", scan=scan, l_bins=lbins,
             recall=round(rec, 4), qps=round(qps, 1))
        del fl


if __name__ == "__main__":
    main()
