"""Round-2 final measurements: hard-query protocols, flat two-pass rerank,
graph engine at 1M.

Run on the real chip: python examples/exp_r2_final.py
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


def timed(fn, staged, nq, reps=6):
    outs = [fn(qb) for qb in staged]
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    outs = []
    for _ in range(reps):
        for qb in staged:
            outs.append(fn(qb))
    jax.block_until_ready(outs)
    return reps * nq / (time.perf_counter() - t0)


def main():
    print("backend", jax.default_backend(), flush=True)
    _ = float((jnp.ones((8, 128)) @ jnp.ones((128, 8))).sum())

    from zvdb_tpu import (CagraConfig, CagraIndex, FlatConfig, FlatIndex,
                          IVFConfig, IVFIndex)
    from zvdb_tpu.bench.harness import ground_truth_host, recall_at_k
    from zvdb_tpu.io.datasets import load_dataset, make_queries, synthetic_clustered

    n, d, nq, k = 100_000, 128, 10_000, 10
    x, _, _, metric = load_dataset("sift1m", max_rows=n)

    # ---- engines built once ------------------------------------------------
    flat = FlatIndex(FlatConfig(dim=d, metric=metric, precision="high",
                                recall_target=0.97, tile_n=131072), capacity=n)
    flat.add(x)
    flat_rr = FlatIndex(FlatConfig(dim=d, metric=metric, rerank=4,
                                   recall_target=0.97, tile_n=131072),
                        capacity=n)
    flat_rr.state = flat.state
    ivf = IVFIndex(IVFConfig(dim=d, n_clusters=1024, nprobe=2, metric=metric))
    ivf.build(x)
    cagra = CagraIndex(CagraConfig(dim=d, degree=32, metric=metric))
    cagra.build(x)
    jax.block_until_ready([flat.state, ivf.state, cagra.state])

    # ---- hard-query protocols ---------------------------------------------
    for mode in ("perturb", "mixture", "gaussian"):
        q = make_queries(x, nq, mode=mode, n_clusters=1000, corpus_seed=0)
        cache = f"/tmp/zvdb_gt_{mode}_{n}_{d}_{nq}_{k}.npz"
        if os.path.exists(cache):
            gt = np.load(cache)["gt"]
        else:
            _, gt = ground_truth_host(x, q, k, metric)
            np.savez(cache, gt=gt)
        staged = [jax.device_put(jnp.asarray(q[lo:lo + 5000]))
                  for lo in range(0, nq, 5000)]
        jax.block_until_ready(staged)
        for name, fn in [
            ("flat", lambda qb: flat.search(qb, k, approx=True)),
            ("flat+rerank", lambda qb: flat_rr.search(qb, k, approx=True)),
            ("ivf np2", lambda qb: ivf.search(qb, k, nprobe=2)),
            ("ivf np4", lambda qb: ivf.search(qb, k, nprobe=4)),
            ("cagra ef16", lambda qb: cagra.search(qb, k, ef_search=16)),
            ("cagra ef32", lambda qb: cagra.search(qb, k, ef_search=32)),
        ]:
            ids = np.concatenate([np.asarray(fn(qb)[1]) for qb in staged])
            r = recall_at_k(ids, gt, k)
            qps = timed(fn, staged, nq)
            print(f"{mode:9s} {name:12s} recall={r:.4f} qps={qps:,.0f}",
                  flush=True)

    # ---- graph engine at 1M -----------------------------------------------
    del flat, flat_rr, ivf, cagra
    n1 = 1_000_000
    x1 = synthetic_clustered(n1, d, n_clusters=10_000, seed=0)
    rng = np.random.default_rng(9)
    q1 = (x1[rng.integers(0, n1, nq)]
          + 0.05 * rng.standard_normal((nq, d))).astype(np.float32)
    gt1 = np.load(f"/tmp/zvdb_gt1m_{d}_{nq}_{k}.npz")["gt"] \
        if os.path.exists(f"/tmp/zvdb_gt1m_{d}_{nq}_{k}.npz") else None
    if gt1 is None:
        oracle = FlatIndex(FlatConfig(dim=d, precision="highest",
                                      tile_n=262144), capacity=n1)
        oracle.add(x1)
        gt1 = np.concatenate([
            np.asarray(oracle.search(q1[lo:lo + 2048], k)[1])
            for lo in range(0, nq, 2048)])
        np.savez(f"/tmp/zvdb_gt1m_{d}_{nq}_{k}.npz", gt=gt1)
        del oracle

    cg = CagraIndex(CagraConfig(dim=d, degree=32, metric=metric))
    t0 = time.perf_counter()
    cg.build(x1)
    jax.block_until_ready(cg.state)
    b1 = time.perf_counter() - t0
    print(f"cagra 1M build (cold-ish) {n1/b1:,.0f} pts/s", flush=True)
    staged = [jax.device_put(jnp.asarray(q1[lo:lo + 5000]))
              for lo in range(0, nq, 5000)]
    jax.block_until_ready(staged)
    for ef in (16, 32, 48):
        ids = np.concatenate([
            np.asarray(cg.search(np.asarray(qb), k, ef_search=ef)[1])
            for qb in staged])
        r = recall_at_k(ids, gt1, k)
        qps = timed(lambda qb, e=ef: cg.search(qb, k, ef_search=e), staged, nq)
        print(f"cagra 1M ef={ef}: recall={r:.4f} qps={qps:,.0f}", flush=True)

    # flat+rerank at 1M (the native-rate scan experiment)
    fl = FlatIndex(FlatConfig(dim=d, metric=metric, rerank=4,
                              recall_target=0.97, tile_n=500_000), capacity=n1)
    fl.add(x1)
    jax.block_until_ready(fl.state)
    ids = np.concatenate([
        np.asarray(fl.search(np.asarray(qb), k, approx=True)[1])
        for qb in staged])
    r = recall_at_k(ids, gt1, k)
    qps = timed(lambda qb: fl.search(qb, k, approx=True), staged, nq)
    print(f"flat+rerank 1M: recall={r:.4f} qps={qps:,.0f}", flush=True)


if __name__ == "__main__":
    main()
