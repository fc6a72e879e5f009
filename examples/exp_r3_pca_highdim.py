"""Round-3: PCA-filtered flat search at high dim (pHNSW/AQR pattern).

The reference protocol sweeps dims {128, 512, 768, 1024}; the flat scan's
[B, N] x D matmul scales linearly in D, so high-dim rows pay 6-8x the 128d
cost. FlatConfig(pca_dim=p) scans a projected corpus (D -> p) and reranks
exactly — this measures QPS + recall@10 of baseline vs PCA at 100k x
{512, 1024}d clustered, one chip, device-staged queries.
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


def timed_qps(fn, staged, reps=4):
    best = 0.0
    nq = sum(s.shape[0] for s in staged)
    for _ in range(2):
        outs = []
        t0 = time.perf_counter()
        for _ in range(reps):
            for qb in staged:
                outs.append(fn(qb))
        jax.block_until_ready(outs)
        best = max(best, reps * nq / (time.perf_counter() - t0))
    return best


def main():
    from zvdb_tpu import FlatConfig, FlatIndex
    from zvdb_tpu.bench.harness import recall_at_k
    from zvdb_tpu.io.datasets import synthetic_clustered

    _ = float((jnp.ones((8, 128)) @ jnp.ones((128, 8))).sum())
    n, nq, k = 100_000, 10_000, 10
    for d, p in ((512, 96), (1024, 128)):
        x = synthetic_clustered(n, d, n_clusters=1000, seed=0)
        rq = np.random.default_rng(777)
        q = (x[rq.integers(0, n, nq)]
             + 0.05 * rq.standard_normal((nq, d))).astype(np.float32)
        xd = jax.device_put(jnp.asarray(x))
        jax.block_until_ready(xd)
        oracle = FlatIndex(FlatConfig(dim=d, precision="highest"), capacity=n)
        oracle.add(xd)
        gt = np.concatenate([
            np.asarray(oracle.search(q[lo:lo + 2048], k)[1])
            for lo in range(0, nq, 2048)])
        del oracle
        staged = [jax.device_put(jnp.asarray(q[lo:lo + 2048]))
                  for lo in range(0, nq, 2048)]
        jax.block_until_ready(staged)

        variants = [
            ("base", FlatConfig(dim=d, precision="high")),
            ("base_rr", FlatConfig(dim=d, rerank=4, recall_target=0.97)),
            (f"pca{p}", FlatConfig(dim=d, pca_dim=p, rerank=16)),
            (f"pca{p // 2}", FlatConfig(dim=d, pca_dim=p // 2, rerank=16)),
        ]
        for name, cfg in variants:
            idx = FlatIndex(cfg, capacity=n)
            idx.add(xd)
            fn = lambda qb: idx.search(qb, k, approx=True)
            ids = np.concatenate(
                [np.asarray(fn(s)[1]) for s in staged])
            rec = recall_at_k(ids, gt, k)
            qps = timed_qps(fn, staged)
            print(json.dumps(dict(exp="pca_highdim", d=d, variant=name,
                                  recall=round(rec, 4), qps=round(qps))),
                  flush=True)
            del idx


if __name__ == "__main__":
    main()
