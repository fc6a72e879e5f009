"""Round-5 IVF-PQ on TPU: first hardware numbers for the grouped ADC engine.

VERDICT r4 item 3 re-opened IVF-PQ with kernel-era economics: the flat PQ
scan is linear in N (409 us/query at 30M = 2.3k QPS, below the reference
CPU's 2,678 QPS headline, /root/reference/benchmarks/benchmark.md:107-113).
index/ivfpq.py scans only probed cluster blocks via the grouped fused ADC
kernel (ops/pallas_pq.py:pq_grouped_scan_bins) — this script is the first
TPU measurement of that path.

Protocol (same corpus + GT as exp_r4_batch1/pq9 so every number is directly
comparable with the flat-PQ 1M frontier: ns16 rr12 int16 = 0.9984 @ 135k):
  stage 0: 100k x 128d smoke — kernel compiles on real Mosaic, recall sane.
  stage 1: 1M x 128d — build, then sweep nprobe x rerank (+ group_slack
           probe) for the recall/QPS frontier vs the flat PQ winner.

Run: python examples/exp_r5_ivfpq.py [--stage 0|1|-1]
"""
import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=-1)
    args = ap.parse_args()

    import jax
    from zvdb_tpu.utils.cache import setup_compile_cache
    setup_compile_cache("tpu")
    import jax.numpy as jnp

    from exp_r4_batch1 import (batched_ids, corpus_1m, gt_1m, recall_vs,
                               timed_qps)
    from zvdb_tpu import IVFPQConfig, IVFPQIndex

    t0 = time.perf_counter()
    jnp.zeros(()).block_until_ready()
    log(f"device init {time.perf_counter() - t0:.1f}s "
        f"backend={jax.default_backend()}")
    k = 10

    if args.stage in (-1, 0):
        # ---- stage 0: 100k smoke (Mosaic compile + recall sanity) ---------
        from zvdb_tpu.io.datasets import synthetic_clustered
        n0, d = 100_000, 128
        x0 = synthetic_clustered(n0, d, n_clusters=10_000, seed=0)
        rng = np.random.default_rng(12345)
        q0 = (x0[rng.integers(0, n0, 2048)]
              + 0.05 * rng.standard_normal((2048, d))).astype(np.float32)
        from zvdb_tpu import FlatConfig, FlatIndex
        oracle = FlatIndex(FlatConfig(dim=d, precision="highest"),
                           capacity=n0)
        oracle.add(x0)
        gt0 = np.asarray(oracle.search(q0, k)[1])
        del oracle
        idx = IVFPQIndex(IVFPQConfig(dim=d, n_sub=16, nprobe=16, rerank=12))
        tb = time.perf_counter()
        idx.build(jax.device_put(jnp.asarray(x0)))
        jax.block_until_ready(idx.state.codes_blocks)
        log(f"smoke build {time.perf_counter() - tb:.2f}s "
            f"C={idx.state.centroids.shape[0]} "
            f"cap={idx.state.codes_blocks.shape[2]}")
        ids = np.asarray(idx.search(q0, k)[1])
        r = recall_vs(ids, gt0, k)
        qps = timed_qps(lambda qq: idx.search(qq, k), q0)
        log(f"RESULT ivfpq-100k np16 rr12: recall={r:.4f} qps={qps:,.0f}")
        del idx

    if args.stage in (-1, 1):
        # ---- stage 1: 1M frontier -----------------------------------------
        x1, q1, fp = corpus_1m()
        gt1 = gt_1m(x1, q1, fp)
        xd1 = jax.device_put(jnp.asarray(x1))
        jax.block_until_ready(xd1)

        base = IVFPQConfig(dim=128, n_sub=16, refine="int16")
        idx = IVFPQIndex(base)
        tb = time.perf_counter()
        idx.build(xd1)
        jax.block_until_ready(idx.state.codes_blocks)
        dt = time.perf_counter() - tb
        log(f"1M build {dt:.2f}s ({1_000_000 / dt:,.0f} pts/s dev-resident) "
            f"C={idx.state.centroids.shape[0]} "
            f"cap={idx.state.codes_blocks.shape[2]}")

        runs = [
            ("np8 rr12", dict(nprobe=8, rerank=12)),
            ("np16 rr12", dict(nprobe=16, rerank=12)),
            ("np16 rr16", dict(nprobe=16, rerank=16)),
            ("np32 rr12", dict(nprobe=32, rerank=12)),
            ("np32 rr16", dict(nprobe=32, rerank=16)),
            ("np64 rr16", dict(nprobe=64, rerank=16)),
            ("np32 rr16 slack8", dict(nprobe=32, rerank=16, group_slack=8.0)),
            ("np16 rr12 slack8", dict(nprobe=16, rerank=12, group_slack=8.0)),
        ]
        for tag, kw in runs:
            try:
                idx.cfg = dataclasses.replace(base, **kw)
                fn = lambda qq: idx.search(qq, k)
                ids = batched_ids(fn, q1)
                r = recall_vs(ids, gt1, k)
                qps = timed_qps(fn, q1)
                log(f"RESULT ivfpq-1m {tag}: recall={r:.4f} qps={qps:,.0f}")
            except Exception as e:
                log(f"RESULT ivfpq-1m {tag}: FAILED {e!r}")
    log("DONE")


if __name__ == "__main__":
    main()
