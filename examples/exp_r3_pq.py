"""Round-3 TPU measurement: PQFlatIndex (index/pqflat.py, ops/pq.py).

  A. 1M x 128d clustered: device-resident build pps, then QPS/recall across
     the config axes — rerank depth, scan precision (the bf16 question),
     n_sub (memory vs recall), scan tile, and raw-codes recall (the
     quantization ceiling with no refine pass).
  B. DEEP-10M x 96d: the memory headline. Full-scan PQ at 10M with int8
     refine is (n_sub + D + 8) B/vector ~= 1.2 GB vs the IVF int8 index's
     7.7 GB; measure build + QPS/recall there.

gt caches are fingerprinted _v2 style with SELF-CONTAINED rng streams
(CLAUDE.md stale-cache rule — never share a shape-keyed cache across
scripts with different rng draw sequences).
"""
import dataclasses
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from zvdb_tpu.utils.cache import setup_compile_cache
setup_compile_cache("tpu")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def fingerprint(x: np.ndarray) -> float:
    return float(np.asarray(x[:: max(1, x.shape[0] // 4096)], np.float64).sum())


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


def pq_bytes_per_vec(cfg) -> int:
    refine_b = {"none": 0, "int8": cfg.dim + 4, "bfloat16": 2 * cfg.dim,
                "float32": 4 * cfg.dim}[cfg.refine]
    return cfg.n_sub + 4 + refine_b  # codes + norms + refine(+scales)


def share_state(idx, cfg2):
    """Same trained state under a different search-time config (tile_n /
    rerank / precision are search statics read from cfg)."""
    from zvdb_tpu import PQFlatIndex

    j = PQFlatIndex(cfg2, capacity=0)
    j.state = idx.state
    j.capacity = idx.capacity
    j._trained = idx._trained
    return j


def main():
    from zvdb_tpu import FlatConfig, FlatIndex, PQConfig, PQFlatIndex
    from zvdb_tpu.bench.harness import recall_at_k
    from zvdb_tpu.io.datasets import load_dataset, synthetic_clustered

    nq, k = 10_000, 10
    t0 = time.time()
    _ = float((jnp.ones((8, 128)) @ jnp.ones((128, 8))).sum())
    log(f"device init {time.time()-t0:.1f}s")

    # ---- A. 1M x 128d clustered ------------------------------------------
    try:
        n1, d = 1_000_000, 128
        x1 = synthetic_clustered(n1, d, n_clusters=10_000, seed=0)
        rq = np.random.default_rng(4242)   # self-contained stream
        q1 = (x1[rq.integers(0, n1, nq)]
              + 0.05 * rq.standard_normal((nq, d))).astype(np.float32)
        fp = fingerprint(x1) + float(np.float64(q1[:64].sum()))
        gt_cache = f"/tmp/zvdb_gt_pq1m_v2_{n1}_{d}_{nq}_{k}.npz"
        gt1 = None
        if os.path.exists(gt_cache):
            z = np.load(gt_cache)
            if abs(float(z["fp"]) - fp) < 1e-3 * max(abs(fp), 1.0):
                gt1 = z["gt"]
        x1d = jax.device_put(x1)
        jax.block_until_ready(x1d)
        del x1
        gc.collect()
        if gt1 is None:
            oracle = FlatIndex(FlatConfig(dim=d, precision="highest",
                                          tile_n=262144), capacity=n1)
            oracle.add(x1d)
            jax.block_until_ready(oracle.state)
            gt1 = np.concatenate([
                np.asarray(oracle.search(q1[lo:lo + 2048], k)[1])
                for lo in range(0, nq, 2048)])
            np.savez(gt_cache, gt=gt1, fp=np.float64(fp))
            del oracle
            gc.collect()
        log("1M gt ready")

        staged = [jax.device_put(jnp.asarray(q1[lo:lo + 5000]))
                  for lo in range(0, nq, 5000)]
        jax.block_until_ready(staged)

        built = {}
        for n_sub in (16, 32):
            cfg = PQConfig(dim=d, n_sub=n_sub, refine="int8", rerank=4)
            warm = PQFlatIndex(cfg)
            warm.build(x1d)
            jax.block_until_ready(warm.state)
            del warm
            bt = float("inf")
            for _ in range(2):
                idx = PQFlatIndex(cfg)
                t0 = time.perf_counter()
                idx.build(x1d)
                jax.block_until_ready(idx.state)
                bt = min(bt, time.perf_counter() - t0)
            built[n_sub] = idx
            emit(exp="pq1m_build", n_sub=n_sub, s=round(bt, 2),
                 pps=round(n1 / bt, 1), bytes_per_vec=pq_bytes_per_vec(cfg))

        variants = [
            dict(n_sub=16, rerank=4, precision="high"),
            dict(n_sub=16, rerank=8, precision="high"),
            dict(n_sub=16, rerank=4, precision="default"),
            dict(n_sub=16, rerank=4, precision="high", tile_n=32768),
            dict(n_sub=32, rerank=4, precision="high"),
        ]
        for v in variants:
            idx = built[v["n_sub"]]
            cfg2 = dataclasses.replace(idx.cfg, **{kk: vv for kk, vv in
                                                   v.items() if kk != "n_sub"})
            j = share_state(idx, cfg2)
            ids = np.concatenate([np.asarray(j.search(qb, k)[1])
                                  for qb in staged])
            rec = recall_at_k(ids, gt1, k)
            qps = timed_qps(lambda qb: j.search(qb, k), staged)
            emit(exp="pq1m_search", **v, recall=round(rec, 4),
                 qps=round(qps, 1))

        # raw-codes recall ceiling (pass 1 only, no refine)
        from zvdb_tpu.index import pqflat as PF
        idx = built[16]
        ids = np.concatenate([
            np.asarray(PF._pq_search(idx.state, qb, k, "l2", idx.cfg.tile_n,
                                     True, 0.95, "high", "none", 1)[1])
            for qb in staged])
        emit(exp="pq1m_raw_codes", n_sub=16,
             recall=round(recall_at_k(ids, gt1, k), 4))

        # OPQ (learned rotation, ops/pq.py:train_opq): raw-codes recall at
        # identical memory vs the plain-PQ ceiling above, plus the refined
        # path for parity + rotation-cost-in-QPS.
        for refine, rr in (("none", 1), ("int8", 4)):
            cfgo = PQConfig(dim=d, n_sub=16, refine=refine, rerank=rr,
                            opq=True)
            t0 = time.perf_counter()
            oidx = PQFlatIndex(cfgo)
            oidx.build(x1d)
            jax.block_until_ready(oidx.state)
            bt = time.perf_counter() - t0
            ids = np.concatenate([np.asarray(oidx.search(qb, k)[1])
                                  for qb in staged])
            rec = recall_at_k(ids, gt1, k)
            qps = timed_qps(lambda qb: oidx.search(qb, k), staged)
            emit(exp="pq1m_opq", refine=refine, rerank=rr, s=round(bt, 2),
                 pps=round(n1 / bt, 1), recall=round(rec, 4),
                 qps=round(qps, 1))
            del oidx
            gc.collect()
        del built, x1d
        gc.collect()
    except Exception as e:
        emit(exp="pq1m", error=repr(e)[:300])

    # ---- B. DEEP-10M x 96d -------------------------------------------------
    try:
        n10, d10 = 10_000_000, 96
        x_cache = f"/tmp/zvdb_deep10m_{n10}_{d10}.npy"
        if os.path.exists(x_cache):
            x10 = np.load(x_cache)
        else:
            x10, _, _, _ = load_dataset("deep10m", max_rows=n10)
            np.save(x_cache, x10)
        rq = np.random.default_rng(777)    # batch11's exact stream
        q10 = (x10[rq.integers(0, n10, nq)]
               + 0.05 * rq.standard_normal((nq, d10))).astype(np.float32)
        fp = fingerprint(x10) + float(np.float64(q10[:64].sum()))
        gt10_cache = f"/tmp/zvdb_gt_deep10m_v2_{n10}_{d10}_{nq}_{k}.npz"
        gt10 = None
        if os.path.exists(gt10_cache):
            z = np.load(gt10_cache)
            if abs(float(z["fp"]) - fp) < 1e-3 * max(abs(fp), 1.0):
                gt10 = z["gt"]
        if gt10 is None:
            oracle = FlatIndex(FlatConfig(dim=d10, precision="highest",
                                          tile_n=262144), capacity=n10)
            for lo in range(0, n10, 1_000_000):
                oracle.add(x10[lo:lo + 1_000_000])
            jax.block_until_ready(oracle.state)
            gt10 = np.concatenate([
                np.asarray(oracle.search(q10[lo:lo + 1024], k)[1])
                for lo in range(0, nq, 1024)])
            np.savez(gt10_cache, gt=gt10, fp=np.float64(fp))
            del oracle
            gc.collect()
            time.sleep(2)
        log("deep10m gt ready")

        x10d = jax.device_put(x10)
        jax.block_until_ready(x10d)
        del x10
        gc.collect()
        cfg10 = PQConfig(dim=d10, n_sub=16, refine="int8", rerank=4,
                         tile_n=32768)
        pq = PQFlatIndex(cfg10)
        t0 = time.perf_counter()
        pq.build(x10d)
        jax.block_until_ready(pq.state)
        dt = time.perf_counter() - t0
        emit(exp="pq10m_build", n_sub=16, s=round(dt, 1),
             pps=round(n10 / dt, 1), bytes_per_vec=pq_bytes_per_vec(cfg10),
             index_gb=round(pq_bytes_per_vec(cfg10) * n10 / 2**30, 2))
        del x10d
        gc.collect()
        staged = [jax.device_put(jnp.asarray(q10[lo:lo + 2048]))
                  for lo in range(0, nq, 2048)]
        jax.block_until_ready(staged)
        for prec in ("high", "default"):
            j = share_state(pq, dataclasses.replace(cfg10, precision=prec))
            ids = np.concatenate([np.asarray(j.search(qb, k)[1])
                                  for qb in staged])
            rec = recall_at_k(ids, gt10, k)
            qps = timed_qps(lambda qb: j.search(qb, k), staged, reps=2)
            emit(exp="pq10m_search", precision=prec, recall=round(rec, 4),
                 qps=round(qps, 1))
    except Exception as e:
        emit(exp="pq10m", error=repr(e)[:300])


if __name__ == "__main__":
    main()
