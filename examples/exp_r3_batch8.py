"""Round-3 TPU batch #8: DEEP-10M re-run after the device-vectorized split,
device argsort, and the bounded batched two-means (pow2 buckets) fixes.

Data + ground truth are cached in /tmp from batch 6/7. Measures:
  1. host-numpy IVF build (upload-inclusive) + nprobe sweep (recall, QPS)
  2. device-resident IVF build (hardware-representative)
"""
import gc
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
    from zvdb_tpu import IVFConfig, IVFIndex
    from zvdb_tpu.bench.harness import recall_at_k

    n10, d10, nq, k = 10_000_000, 96, 10_000, 10
    x_cache = f"/tmp/zvdb_deep10m_{n10}_{d10}.npy"
    gt10_cache = f"/tmp/zvdb_gt_deep10m_{n10}_{d10}_{nq}_{k}.npz"
    if not (os.path.exists(x_cache) and os.path.exists(gt10_cache)):
        emit(exp="deep10m", error="cache missing; run batch6 first")
        return
    x10 = np.load(x_cache)
    gt10 = np.load(gt10_cache)["gt"]
    # replicate batch6's exact rng sequence for q10 (same seed + draw order:
    # rng(9) first consumed integers(0,100000,nq) + normal((nq,128)) for the
    # 100k protocol, THEN the deep10m draws — must match or gt is stale).
    rng = np.random.default_rng(9)
    _ = rng.integers(0, 100_000, nq)
    _ = rng.standard_normal((nq, 128))
    q10 = (x10[rng.integers(0, n10, nq)]
           + 0.05 * rng.standard_normal((nq, d10))).astype(np.float32)
    log("deep10m data + gt ready")

    t0 = time.time()
    _ = float((jnp.ones((8, 128)) @ jnp.ones((128, 8))).sum())
    log(f"device init {time.time()-t0:.1f}s")

    cfg10 = IVFConfig(dim=d10, n_clusters=16384, metric="l2",
                      dtype="int8", rerank=4, kmeans_iters=6,
                      kmeans_sample=131072)
    try:
        ivf = IVFIndex(cfg10)
        t0 = time.perf_counter()
        ivf.build(x10)
        jax.block_until_ready(ivf.state)
        dt = time.perf_counter() - t0
        emit(exp="deep10m_build_host", s=round(dt, 1), pps=round(n10 / dt, 1))
        staged = [jax.device_put(jnp.asarray(q10[lo:lo + 2048]))
                  for lo in range(0, nq, 2048)]
        jax.block_until_ready(staged)
        for npb in (8, 16):
            ids = np.concatenate([
                np.asarray(ivf.search(qb, k, nprobe=npb)[1])
                for qb in staged])
            rec = recall_at_k(ids, gt10, k)
            qps = timed_qps(lambda qb: ivf.search(qb, k, nprobe=npb), staged)
            emit(exp="deep10m_search", nprobe=npb, recall=round(rec, 4),
                 qps=round(qps, 1))
        del ivf
        gc.collect()
    except Exception as e:
        emit(exp="deep10m_host", error=repr(e)[:300])

    try:
        x10d = jax.device_put(x10)
        jax.block_until_ready(x10d)
        del x10
        gc.collect()
        ivf = IVFIndex(cfg10)
        t0 = time.perf_counter()
        ivf.build(x10d)
        jax.block_until_ready(ivf.state)
        dt = time.perf_counter() - t0
        emit(exp="deep10m_build_device", s=round(dt, 1),
             pps=round(n10 / dt, 1))
    except Exception as e:
        emit(exp="deep10m_device", error=repr(e)[:300])


if __name__ == "__main__":
    main()
