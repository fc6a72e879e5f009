"""Round-3 experiment: where does the 1M device-resident graph build spend
its time? (100k device build is 94k pts/s; 1M is 35k — find the scaling
bottleneck and tuning headroom.)

Measures in ONE process:
  1. warm device-resident cagra 1M build with ZVDB_BUILD_TRACE phase marks
  2. the same with single-pass presets (passes=1 spill=3) for the
     build-throughput/recall tradeoff at scale
  3. recall@10 + QPS at the flagship 1M search config for each variant

Timing discipline: build timing syncs on the state pytree AND pulls a value
(block_until_ready alone is not a reliable fence through this relay for
every program — docs/PERF.md round-3 fused-hop section).
"""
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


def main():
    from zvdb_tpu import CagraConfig, CagraIndex, FlatConfig, FlatIndex
    from zvdb_tpu.bench.harness import recall_at_k
    from zvdb_tpu.io.datasets import synthetic_clustered

    n, d, nq, k = 1_000_000, 128, 10_000, 10
    x = synthetic_clustered(n, d, n_clusters=10_000, seed=0)
    rng = np.random.default_rng(9)
    q = (x[rng.integers(0, n, nq)]
         + 0.05 * rng.standard_normal((nq, d))).astype(np.float32)

    t0 = time.time()
    _ = float((jnp.ones((8, 128)) @ jnp.ones((128, 8))).sum())
    log(f"device init {time.time()-t0:.1f}s")

    gt_cache = f"/tmp/zvdb_gt1m_{d}_{nq}_{k}.npz"
    if os.path.exists(gt_cache):
        gt = np.load(gt_cache)["gt"]
    else:
        oracle = FlatIndex(
            FlatConfig(dim=d, precision="highest", tile_n=262144), capacity=n)
        oracle.add(x)
        gt = np.concatenate([
            np.asarray(oracle.search(q[lo:lo + 2048], k)[1])
            for lo in range(0, nq, 2048)
        ])
        np.savez(gt_cache, gt=gt)
        del oracle

    xd = jax.device_put(jnp.asarray(x))
    jax.block_until_ready(xd)
    qd = [jax.device_put(jnp.asarray(q[lo:lo + 5000]))
          for lo in range(0, nq, 5000)]
    jax.block_until_ready(qd)

    variants = [
        ("default_p2s2", dict()),
        ("p1s3", dict(passes=1, spill=3)),
        ("p1s2", dict(passes=1, spill=2)),
    ]
    for name, kw in variants:
        cfg = CagraConfig(dim=d, degree=32, metric="l2", n_anchors=262144,
                          search_degree=16, max_iters=4, ef_search=12, **kw)
        idx = CagraIndex(cfg)
        idx.build(xd)                       # warm (compiles)
        jax.block_until_ready(idx.state)
        best = float("inf")
        for _ in range(2):
            idx = CagraIndex(cfg)
            t0 = time.perf_counter()
            idx.build(xd)
            jax.block_until_ready(idx.state)
            _ = float(jnp.asarray(idx.state.nbrs[0, 0], jnp.float32))
            best = min(best, time.perf_counter() - t0)
        ids = np.concatenate([np.asarray(idx.search(qb, k)[1]) for qb in qd])
        rec = recall_at_k(ids, gt, k)
        # QPS at the flagship config (value-pull cross-checked methodology)
        outs = []
        t0 = time.perf_counter()
        for _ in range(3):
            for qb in qd:
                outs.append(idx.search(qb, k))
        jax.block_until_ready(outs)
        qps = 3 * nq / (time.perf_counter() - t0)
        emit(exp=f"build1m_{name}", build_s=round(best, 2),
             pts_per_s=round(n / best), recall=round(float(rec), 4),
             qps=round(qps))
        del idx


if __name__ == "__main__":
    main()
