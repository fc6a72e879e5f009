"""Round-3 TPU batch #9: graph-build pass/spill/block sweep.

Device-resident 100k x 128d builds (warm, best-of-3) + recall@10 at ef=12/16
for each config; then the winner at 1M. Hypothesis: a single clustering pass
with spill=3 does 0.75x the selection work of two passes with spill=2 and
saves one kmeans+assign+pack round (~0.3 s of the 1.39 s budget), while the
multi-view union quality loss is absorbed by prune+reverse+chain downstream.
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
    from zvdb_tpu import CagraConfig, CagraIndex
    from zvdb_tpu.bench.harness import recall_at_k
    from zvdb_tpu.io.datasets import load_dataset, synthetic_clustered

    n, d, nq, k = 100_000, 128, 10_000, 10
    x, _, _, metric = load_dataset("sift1m", max_rows=n)
    x = np.ascontiguousarray(x[:n], np.float32)
    rng = np.random.default_rng(9)
    q = (x[rng.integers(0, n, nq)]
         + 0.05 * rng.standard_normal((nq, d))).astype(np.float32)
    gt_path = f"/tmp/zvdb_gt_clustered_{n}_{d}_{nq}_{k}.npz"
    gt = np.load(gt_path)["gt"] if os.path.exists(gt_path) else None

    t0 = time.time()
    _ = float((jnp.ones((8, 128)) @ jnp.ones((128, 8))).sum())
    log(f"device init {time.time()-t0:.1f}s")

    xd = jax.device_put(x)
    jax.block_until_ready(xd)
    qd = [jax.device_put(jnp.asarray(q[lo:lo + 5000]))
          for lo in range(0, nq, 5000)]
    jax.block_until_ready(qd)

    configs = [
        dict(passes=2, spill=2, block=1024),   # current default (baseline)
        dict(passes=1, spill=3, block=1024),
        dict(passes=1, spill=3, block=768),
        dict(passes=1, spill=4, block=1024),
        dict(passes=1, spill=2, block=1024),
    ]
    best = None
    for cv in configs:
        try:
            cfg = CagraConfig(dim=d, degree=32, metric=metric,
                              block_topk="pallas", **cv)
            warm = CagraIndex(cfg)
            warm.build(xd)
            jax.block_until_ready(warm.state)
            del warm
            bt = float("inf")
            for _ in range(3):
                idx = CagraIndex(cfg)
                t0 = time.perf_counter()
                idx.build(xd)
                jax.block_until_ready(idx.state)
                bt = min(bt, time.perf_counter() - t0)
            recs = {}
            if gt is not None:
                for ef in (12, 16):
                    ids = np.concatenate([
                        np.asarray(idx.search(qb, k, ef_search=ef)[1])
                        for qb in qd])
                    recs[ef] = round(recall_at_k(ids, gt, k), 4)
            emit(exp="build_sweep", **cv, s=round(bt, 3),
                 pps=round(n / bt, 1), recall=recs)
            if recs.get(12, 0) >= 0.98 and (best is None or bt < best[1]):
                best = (cv, bt)
            del idx
        except Exception as e:
            emit(exp="build_sweep", **cv, error=repr(e)[:200])

    del xd
    if best is None:
        return
    cv = best[0]
    # winner at 1M device-resident
    try:
        n1 = 1_000_000
        x1 = synthetic_clustered(n1, d, n_clusters=10_000, seed=0)
        x1d = jax.device_put(x1)
        jax.block_until_ready(x1d)
        del x1
        cfg1 = CagraConfig(dim=d, degree=32, metric=metric,
                           block_topk="pallas", n_anchors=262144,
                           search_degree=16, max_iters=4, ef_search=12, **cv)
        warm = CagraIndex(cfg1)
        warm.build(x1d)
        jax.block_until_ready(warm.state)
        del warm
        bt = float("inf")
        for _ in range(2):
            idx1 = CagraIndex(cfg1)
            t0 = time.perf_counter()
            idx1.build(x1d)
            jax.block_until_ready(idx1.state)
            bt = min(bt, time.perf_counter() - t0)
        gt1_cache = f"/tmp/zvdb_gt1m_{d}_{nq}_{k}.npz"
        rec = None
        if os.path.exists(gt1_cache):
            gt1 = np.load(gt1_cache)["gt"]
            # 1M queries use bench.py's derivation: x1 corpus points + noise,
            # rng sequence continues after the 100k draws above (stale-gt
            # rule: the cached gt is keyed by shape, the rng order must match)
            x1 = synthetic_clustered(n1, d, n_clusters=10_000, seed=0)
            q1 = (x1[rng.integers(0, n1, nq)]
                  + 0.05 * rng.standard_normal((nq, d))).astype(np.float32)
            del x1
            ids = np.concatenate([
                np.asarray(idx1.search(q1[lo:lo + 5000], k, ef_search=12)[1])
                for lo in range(0, nq, 5000)])
            rec = round(recall_at_k(ids, gt1, k), 4)
        emit(exp="build_1m_winner", **cv, s=round(bt, 2),
             pps=round(n1 / bt, 1), recall=rec)
    except Exception as e:
        emit(exp="build_1m_winner", error=repr(e)[:300])


if __name__ == "__main__":
    main()
