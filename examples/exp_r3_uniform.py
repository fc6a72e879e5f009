"""Round-3: settle the uniform-random regime with data (VERDICT #3).

The reference's entire benchmark is uniform-random vectors
(/root/reference/benchmarks/shared_benchmarks.zig:53-59). Round-2's grid
showed graph recall ~0.55 there with no ef-escalation evidence. This run:

  * builds cagra + hnsw on 100k x 128d uniform data (reference protocol:
    corpus AND queries uniform in [0,1)),
  * escalates ef until recall@10 >= 0.95 or a plateau (delta < 0.005 per
    doubling), recording the full recall-vs-ef curve with QPS,
  * records flat QPS on the same workload for the crossover statement.

One JSON line per point on stdout.
"""
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
        CagraConfig, CagraIndex, FlatConfig, FlatIndex, HNSW, HNSWConfig,
    )
    from zvdb_tpu.bench.harness import recall_at_k

    n, d, nq, k = 100_000, 128, 10_000, 10
    rng = np.random.default_rng(12345)
    x = rng.random((n, d), dtype=np.float32)      # reference randomPoint
    q = rng.random((nq, d), dtype=np.float32)

    t0 = time.time()
    _ = float((jnp.ones((8, 128)) @ jnp.ones((128, 8))).sum())
    log(f"device init {time.time()-t0:.1f}s")

    oracle = FlatIndex(FlatConfig(dim=d, precision="highest"), capacity=n)
    oracle.add(x)
    gt = np.concatenate([
        np.asarray(oracle.search(q[lo:lo + 2048], k)[1])
        for lo in range(0, nq, 2048)])
    del oracle
    log("gt ready")

    staged = [jax.device_put(jnp.asarray(q[lo:lo + 5000]))
              for lo in range(0, nq, 5000)]
    jax.block_until_ready(staged)

    # flat reference point on the same workload
    fl = FlatIndex(FlatConfig(dim=d, precision="high", recall_target=0.97,
                              tile_n=131072), capacity=n)
    fl.add(x)
    ids = np.concatenate([np.asarray(fl.search(qb, k, approx=True)[1])
                          for qb in staged])
    emit(exp="uniform_flat", recall=round(recall_at_k(ids, gt, k), 4),
         qps=round(timed_qps(lambda qb: fl.search(qb, k, approx=True),
                             staged), 1))
    del fl

    # graph engines: ef escalation
    engines = {}
    cg = CagraIndex(CagraConfig(dim=d, degree=32))
    cg.build(x)
    engines["cagra"] = (cg, lambda qb, ef: cg.search(qb, k, ef_search=ef))
    hn = HNSW(HNSWConfig(dim=d, m=16, ef_construction=100, build_batch=8192))
    hn.build(x)
    engines["hnsw"] = (hn, lambda qb, ef: hn.search(qb, k, ef_search=ef))

    for name, (idx, fn) in engines.items():
        prev = -1.0
        for ef in (16, 32, 64, 128, 256, 512):
            ids = np.concatenate([np.asarray(fn(qb, ef)[1]) for qb in staged])
            rec = recall_at_k(ids, gt, k)
            qps = timed_qps(lambda qb: fn(qb, ef), staged,
                            reps=2 if ef >= 128 else 3)
            emit(exp="uniform_graph", engine=name, ef=ef,
                 recall=round(rec, 4), qps=round(qps, 1))
            if rec >= 0.95:
                break
            if rec - prev < 0.005 and ef >= 64:
                emit(exp="uniform_plateau", engine=name, ef=ef,
                     recall=round(rec, 4))
                break
            prev = rec
        del idx


if __name__ == "__main__":
    main()
