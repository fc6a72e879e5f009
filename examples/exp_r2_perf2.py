"""Round-2 experiment 2: tuned graph-search defaults end-to-end, Pallas
compiled-kernel validation vs approx_min_k, IVF warm build timing.

Run on the real chip: python examples/exp_r2_perf2.py
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


def timed_qps(search_fn, staged, reps=6):
    outs = [search_fn(qb) for qb in staged]
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    outs = []
    for _ in range(reps):
        for qb in staged:
            outs.append(search_fn(qb))
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    nq = sum(int(qb.shape[0]) for qb in staged)
    return reps * nq / dt


def main():
    print("backend", jax.default_backend(), flush=True)
    _ = float((jnp.ones((8, 128)) @ jnp.ones((128, 8))).sum())

    from zvdb_tpu import (CagraConfig, CagraIndex, FlatConfig, FlatIndex,
                          HNSW, HNSWConfig, IVFConfig, IVFIndex)
    from zvdb_tpu.bench.harness import recall_at_k
    from zvdb_tpu.io.datasets import load_dataset

    n, d, nq, k = 100_000, 128, 10_000, 10
    x, _, _, metric = load_dataset("sift1m", max_rows=n)
    rng = np.random.default_rng(9)
    q = (x[rng.integers(0, n, nq)]
         + 0.05 * rng.standard_normal((nq, d))).astype(np.float32)
    gt = np.load(f"/tmp/zvdb_gt_clustered_{n}_{d}_{nq}_{k}.npz")["gt"]
    staged = [jax.device_put(jnp.asarray(q[lo:lo + 5000]))
              for lo in range(0, nq, 5000)]
    jax.block_until_ready(staged)

    # ---- 1. Pallas kernel: compile + compare vs approx_min_k ---------------
    try:
        flat = FlatIndex(FlatConfig(dim=d, metric=metric, precision="high",
                                    recall_target=0.97, tile_n=131072),
                         capacity=n)
        flat.add(x)
        jax.block_until_ready(flat.state)

        t0 = time.perf_counter()
        pal = FlatIndex(FlatConfig(dim=d, metric=metric, precision="high",
                                   scan="pallas", l_bins=256), capacity=n)
        pal.state = flat.state
        ids = np.asarray(pal.search(q[:5000], k, approx=True)[1])
        print(f"pallas compile+first run {time.perf_counter()-t0:.1f}s",
              flush=True)
        r = recall_at_k(ids, gt[:5000], k)
        qps = timed_qps(lambda qq: pal.search(qq, k, approx=True), staged)
        print(f"pallas L=256: recall={r:.4f} qps={qps:,.0f}", flush=True)
        for L in (128, 512):
            pal2 = FlatIndex(FlatConfig(dim=d, metric=metric, precision="high",
                                        scan="pallas", l_bins=L), capacity=n)
            pal2.state = flat.state
            ids = np.asarray(pal2.search(q[:5000], k, approx=True)[1])
            r2 = recall_at_k(ids, gt[:5000], k)
            qps2 = timed_qps(lambda qq: pal2.search(qq, k, approx=True), staged)
            print(f"pallas L={L}: recall={r2:.4f} qps={qps2:,.0f}", flush=True)
        xqps = timed_qps(lambda qq: flat.search(qq, k, approx=True), staged)
        ids = np.asarray(flat.search(q[:5000], k, approx=True)[1])
        xr = recall_at_k(ids, gt[:5000], k)
        print(f"xla approx_min_k: recall={xr:.4f} qps={xqps:,.0f}", flush=True)
    except Exception as e:
        print(f"PALLAS FAILED: {e!r}", flush=True)

    # ---- 2. CAGRA tuned defaults through the public API --------------------
    cagra = CagraIndex(CagraConfig(dim=d, degree=32, metric=metric))
    t0 = time.perf_counter()
    cagra.build(x)
    jax.block_until_ready(cagra.state)
    print(f"cagra build (cold) {n/(time.perf_counter()-t0):,.0f} pts/s",
          flush=True)
    t0 = time.perf_counter()
    cagra.build(x)
    jax.block_until_ready(cagra.state)
    print(f"cagra build (warm) {n/(time.perf_counter()-t0):,.0f} pts/s",
          flush=True)
    for ef in (16, 24, 32, 48):
        ids = np.asarray(cagra.search(q[:5000], k, ef_search=ef)[1])
        r = recall_at_k(ids, gt[:5000], k)
        qps = timed_qps(lambda qq, e=ef: cagra.search(qq, k, ef_search=e),
                        staged)
        print(f"cagra ef={ef}: recall={r:.4f} qps={qps:,.0f}", flush=True)

    # ---- 3. HNSW with tuned search defaults --------------------------------
    hnsw = HNSW(HNSWConfig(dim=d, m=16, ef_construction=100, metric=metric,
                           build_batch=8192))
    t0 = time.perf_counter()
    hnsw.build(x)
    jax.block_until_ready(hnsw.state)
    print(f"hnsw build (cold) {n/(time.perf_counter()-t0):,.0f} pts/s",
          flush=True)
    t0 = time.perf_counter()
    hnsw.build(x)
    jax.block_until_ready(hnsw.state)
    print(f"hnsw build (warm) {n/(time.perf_counter()-t0):,.0f} pts/s",
          flush=True)
    for ef in (16, 24, 32, 48):
        ids = np.asarray(hnsw.search(q[:5000], k, ef_search=ef)[1])
        r = recall_at_k(ids, gt[:5000], k)
        qps = timed_qps(lambda qq, e=ef: hnsw.search(qq, k, ef_search=e),
                        staged)
        print(f"hnsw ef={ef}: recall={r:.4f} qps={qps:,.0f}", flush=True)

    # ---- 4. IVF warm build --------------------------------------------------
    ivf = IVFIndex(IVFConfig(dim=d, n_clusters=1024, nprobe=2, metric=metric))
    t0 = time.perf_counter()
    ivf.build(x)
    jax.block_until_ready(ivf.state)
    print(f"ivf build (cold) {n/(time.perf_counter()-t0):,.0f} pts/s", flush=True)
    ivf2 = IVFIndex(IVFConfig(dim=d, n_clusters=1024, nprobe=2, metric=metric))
    t0 = time.perf_counter()
    ivf2.build(x)
    jax.block_until_ready(ivf2.state)
    print(f"ivf build (warm) {n/(time.perf_counter()-t0):,.0f} pts/s", flush=True)


if __name__ == "__main__":
    main()
