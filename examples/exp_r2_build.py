"""Round-2 experiment 3: graph-build cost knobs at 100k x 128d.

Sweeps (passes, kc_per_view, prune_cap, block_topk, precision, block size)
measuring WARM build time (the reference timing convention excludes one-off
compiles) and search recall at tuned search defaults.

Run on the real chip: python examples/exp_r2_build.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from zvdb_tpu.utils.cache import setup_compile_cache
setup_compile_cache("tpu")


def main():
    print("backend", jax.default_backend(), flush=True)
    _ = float((jnp.ones((8, 128)) @ jnp.ones((128, 8))).sum())

    from zvdb_tpu import CagraConfig, CagraIndex
    from zvdb_tpu.bench.harness import recall_at_k
    from zvdb_tpu.io.datasets import load_dataset

    n, d, nq, k = 100_000, 128, 10_000, 10
    x, _, _, metric = load_dataset("sift1m", max_rows=n)
    rng = np.random.default_rng(9)
    q = (x[rng.integers(0, n, nq)]
         + 0.05 * rng.standard_normal((nq, d))).astype(np.float32)
    gt = np.load(f"/tmp/zvdb_gt_clustered_{n}_{d}_{nq}_{k}.npz")["gt"]
    q5 = q[:5000]

    def trial(name, **kw):
        cfg = CagraConfig(dim=d, degree=32, metric=metric, **kw)
        idx = CagraIndex(cfg)
        idx.build(x)                     # cold (compiles)
        jax.block_until_ready(idx.state)
        idx2 = CagraIndex(cfg)
        t0 = time.perf_counter()
        idx2.build(x)
        jax.block_until_ready(idx2.state)
        dt = time.perf_counter() - t0
        rs = []
        for ef in (16, 24, 32):
            ids = np.asarray(idx2.search(q5, k, ef_search=ef)[1])
            rs.append(recall_at_k(ids, gt[:5000], k))
        print(f"{name:42s} build {n/dt:8,.0f} pts/s ({dt:5.2f}s)  "
              f"recall@ef16/24/32 = {rs[0]:.4f}/{rs[1]:.4f}/{rs[2]:.4f}",
              flush=True)
        return dt

    trial("baseline (p2 exact)")
    trial("approx topk", block_topk="approx")
    trial("prune_cap 64", prune_cap=64)
    trial("kc16", kc_per_view=16)
    trial("passes1", passes=1)
    trial("fast: p1 kc16 cap64 approx", passes=1, kc_per_view=16,
          prune_cap=64, block_topk="approx")
    trial("fast2: p2 kc16 cap64 approx", kc_per_view=16, prune_cap=64,
          block_topk="approx")
    trial("fast3: p1 kc16 cap48 approx blk512", passes=1, kc_per_view=16,
          prune_cap=48, block_topk="approx", block=512)
    trial("fast4: p1 kc16 cap64 approx default-prec", passes=1,
          kc_per_view=16, prune_cap=64, block_topk="approx",
          precision="default")
    trial("fast5: p1 kc24 cap64 approx km3", passes=1, kc_per_view=24,
          prune_cap=64, block_topk="approx", kmeans_iters=3)


if __name__ == "__main__":
    main()
