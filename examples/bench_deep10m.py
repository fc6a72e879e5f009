"""DEEP-10M benchmark (BASELINE.json config 4): 10M x 96d bulk build + search.

Round-1 result (docs/PERF.md): build 8,721 pts/s, recall@10 0.9918 (nprobe=8),
~6.4k QPS, blocks ~36% full (pre-split capacity). Round-2 targets: O(N)-free
device-centric build, post-split block packing (block_headroom), >=3x QPS.

Ground truth is computed on-device FIRST and the oracle freed before the index
is built (f32 oracle + int8 index together OOM at 10M — CLAUDE.md). The gt
cache carries a corpus fingerprint and the queries derive from a
SELF-CONTAINED rng stream: round 3 burned a TPU hour on recall 0.0 when a
shape-keyed gt cache outlived a regenerated corpus file and a second script
derived queries from a different rng(9) draw order.

Run: python examples/bench_deep10m.py   (takes ~20-40 min; one TPU process!)
"""
import gc
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

    from zvdb_tpu import FlatConfig, FlatIndex, IVFConfig, IVFIndex
    from zvdb_tpu.bench.harness import recall_at_k
    from zvdb_tpu.io.datasets import load_dataset

    n, d, nq, k = 10_000_000, 96, 10_000, 10
    t0 = time.time()
    x_cache = f"/tmp/zvdb_deep10m_{n}_{d}.npy"
    metric = "l2"
    if os.path.exists(x_cache):
        x = np.load(x_cache, mmap_mode=None)
    else:
        x, _, _, metric = load_dataset("deep10m", max_rows=n)
        np.save(x_cache, x)
    rng = np.random.default_rng(777)   # self-contained stream (see docstring)
    q = (x[rng.integers(0, n, nq)]
         + 0.05 * rng.standard_normal((nq, d))).astype(np.float32)
    print(f"data ready in {time.time()-t0:.0f}s", flush=True)

    fp = float(np.asarray(x[:: max(1, n // 4096)], np.float64).sum()) \
        + float(np.float64(q[:64].sum()))
    gt_cache = f"/tmp/zvdb_gt_deep10m_v2_{n}_{d}_{nq}_{k}.npz"
    gt = None
    if os.path.exists(gt_cache):
        z = np.load(gt_cache)
        if abs(float(z["fp"]) - fp) < 1e-3 * max(abs(fp), 1.0):
            gt = z["gt"]
        else:
            print("gt cache fingerprint mismatch -> recomputing", flush=True)
    if gt is None:
        t0 = time.time()
        oracle = FlatIndex(
            FlatConfig(dim=d, precision="highest", tile_n=262144), capacity=n)
        for lo in range(0, n, 1_000_000):
            oracle.add(x[lo:lo + 1_000_000])
        jax.block_until_ready(oracle.state)
        gt = np.concatenate([
            np.asarray(oracle.search(q[lo:lo + 1024], k)[1])
            for lo in range(0, nq, 1024)
        ])
        np.savez(gt_cache, gt=gt, fp=np.float64(fp))
        del oracle
        gc.collect()
        print(f"ground truth in {time.time()-t0:.0f}s", flush=True)

    cfg = IVFConfig(dim=d, n_clusters=16384, metric=metric, dtype="int8",
                    rerank=4, kmeans_iters=6, kmeans_sample=131072)
    # device-resident build: the hardware-representative number (the 3.84 GB
    # host corpus costs 96-390 s through this relay's 40 MB/s upload path;
    # real v5e PCIe moves it in ~1.5 s)
    xd = jax.device_put(x)
    jax.block_until_ready(xd)
    del x
    gc.collect()
    ivf = IVFIndex(cfg)
    t0 = time.perf_counter()
    ivf.build(xd)
    jax.block_until_ready(ivf.state)
    build_s = time.perf_counter() - t0
    print(f"build (device-resident) {build_s:,.0f}s = {n/build_s:,.0f} pts/s",
          flush=True)
    del xd
    gc.collect()
    from zvdb_tpu.utils.stats import index_stats
    try:
        st = index_stats(ivf)
        print("stats:", st, flush=True)
    except Exception as e:
        print("stats failed:", repr(e), flush=True)

    staged = [jax.device_put(jnp.asarray(q[lo:lo + 2048]))
              for lo in range(0, nq, 2048)]
    jax.block_until_ready(staged)
    best = None
    for npb in (2, 4, 8, 16):
        ids = np.concatenate([
            np.asarray(ivf.search(np.asarray(qb), k, nprobe=npb)[1])
            for qb in staged
        ])
        r = recall_at_k(ids, gt, k)
        outs = [ivf.search(qb, k, nprobe=npb) for qb in staged]
        jax.block_until_ready(outs)
        t0 = time.perf_counter()
        outs = []
        for _ in range(3):
            for qb in staged:
                outs.append(ivf.search(qb, k, nprobe=npb))
        jax.block_until_ready(outs)
        qps = 3 * nq / (time.perf_counter() - t0)
        print(f"nprobe={npb}: recall={r:.4f} qps={qps:,.0f}", flush=True)
        if best is None and r >= 0.95:
            best = (npb, r, qps)
    print("HEADLINE:", best, flush=True)


if __name__ == "__main__":
    main()
