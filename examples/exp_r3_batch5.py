"""Round-3 TPU batch #5: Pallas block-scorer on hardware + DEEP-10M trace.

  1. compile + time ops/pallas_block.block_bins at build shapes vs the XLA
     approx path; full block-kNN pass comparison
  2. cagra 100k device-resident + host builds with block_topk='pallas'
  3. cagra 1M device-resident build with block_topk='pallas'
  4. DEEP-10M IVF build with ZVDB_BUILD_TRACE (where do the minutes go?)
"""
import json
import math
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
    from zvdb_tpu import CagraConfig, CagraIndex, IVFConfig, IVFIndex
    from zvdb_tpu.bench.harness import recall_at_k
    from zvdb_tpu.io.datasets import load_dataset, synthetic_clustered

    n, d, nq, k = 100_000, 128, 10_000, 10
    x, _, _, metric = load_dataset("sift1m", max_rows=n)
    x = np.ascontiguousarray(x[:n], np.float32)
    rng = np.random.default_rng(9)
    q = (x[rng.integers(0, n, nq)]
         + 0.05 * rng.standard_normal((nq, d))).astype(np.float32)
    gt = np.load(f"/tmp/zvdb_gt_clustered_{n}_{d}_{nq}_{k}.npz")["gt"] \
        if os.path.exists(f"/tmp/zvdb_gt_clustered_{n}_{d}_{nq}_{k}.npz") \
        else None

    t0 = time.time()
    _ = float((jnp.ones((8, 128)) @ jnp.ones((128, 8))).sum())
    log(f"device init {time.time()-t0:.1f}s")

    # ---- 1. kernel vs XLA at build shapes -------------------------------
    from zvdb_tpu.index.knn_graph import (
        _assign_spill, _block_knn_scatter, _kmeans_device, _pack_blocks,
    )
    from zvdb_tpu.ops import distance as D

    xj = jnp.asarray(x)
    xn = D.sq_norms(xj)
    with jax.default_matmul_precision("high"):
        cent = _kmeans_device(xj, 195, 3, jax.random.PRNGKey(0))
        assign, _ = _assign_spill(xj, xn, cent, D.sq_norms(cent), 2, "l2")
    assign_np = np.asarray(assign)
    bcap = max(8, int(math.ceil(1.6 * 2 * n / 195 / 8.0)) * 8)
    block_pts, block_occ, _ = _pack_blocks(assign_np, 195, bcap)
    kc = 16
    cc = max(1, (1 << 25) // max(bcap * bcap, 1))
    c_blocks = block_pts.shape[0]

    def run_blocks(sel):
        cand_s = jnp.full((n + 1, 4, kc), jnp.inf, jnp.float32)
        cand_i = jnp.full((n + 1, 4, kc), -1, jnp.int32)
        t0 = time.perf_counter()
        with jax.default_matmul_precision("high"):
            for lo in range(0, c_blocks, cc):
                hi = min(lo + cc, c_blocks)
                bp = np.full((cc, bcap), -1, np.int32)
                bo = np.zeros((cc, bcap), np.int32)
                bp[: hi - lo] = block_pts[lo:hi]
                bo[: hi - lo] = block_occ[lo:hi]
                cand_s, cand_i = _block_knn_scatter(
                    xj, xn, jnp.asarray(bp), jnp.asarray(bo),
                    jnp.asarray(0, jnp.int32), cand_s, cand_i, kc, "l2",
                    sel=sel)
        jax.block_until_ready(cand_s)
        return time.perf_counter() - t0

    for sel in ("pallas", "approx"):
        try:
            run_blocks(sel)
            emit(exp="block_pass", mode=sel,
                 s=round(min(run_blocks(sel), run_blocks(sel)), 4))
        except Exception as e:
            emit(exp="block_pass", mode=sel, error=repr(e)[:200])

    # ---- 2. cagra 100k with pallas block scorer --------------------------
    for bt in ("pallas",):
        try:
            cfg = CagraConfig(dim=d, degree=32, metric=metric, block_topk=bt)
            warm = CagraIndex(cfg)
            warm.build(x)
            jax.block_until_ready(warm.state)
            del warm
            best = float("inf")
            for _ in range(3):
                idx = CagraIndex(cfg)
                t0 = time.perf_counter()
                idx.build(x)
                jax.block_until_ready(idx.state)
                best = min(best, time.perf_counter() - t0)
            rec = None
            if gt is not None:
                ids = np.concatenate([
                    np.asarray(idx.search(q[lo:lo + 5000], k, ef_search=12)[1])
                    for lo in range(0, nq, 5000)])
                rec = round(recall_at_k(ids, gt, k), 4)
            emit(exp="cagra_100k_host", block_topk=bt, s=round(best, 3),
                 pps=round(n / best, 1), recall=rec)
            xd = jax.device_put(x)
            jax.block_until_ready(xd)
            best = float("inf")
            for _ in range(3):
                idx = CagraIndex(cfg)
                t0 = time.perf_counter()
                idx.build(xd)
                jax.block_until_ready(idx.state)
                best = min(best, time.perf_counter() - t0)
            emit(exp="cagra_100k_device", block_topk=bt, s=round(best, 3),
                 pps=round(n / best, 1))
            del idx, xd
        except Exception as e:
            emit(exp="cagra_100k", block_topk=bt, error=repr(e)[:200])

    # ---- 3. cagra 1M device-resident with pallas block scorer -----------
    try:
        n1 = 1_000_000
        x1 = synthetic_clustered(n1, d, n_clusters=10_000, seed=0)
        x1d = jax.device_put(x1)
        jax.block_until_ready(x1d)
        cfg1 = CagraConfig(dim=d, degree=32, metric=metric,
                           block_topk="pallas")
        warm = CagraIndex(cfg1)
        warm.build(x1d)            # compiles at 1M shapes
        jax.block_until_ready(warm.state)
        del warm
        idx1 = CagraIndex(cfg1)
        t0 = time.perf_counter()
        idx1.build(x1d)
        jax.block_until_ready(idx1.state)
        dt = time.perf_counter() - t0
        emit(exp="cagra_1m_build_device", block_topk="pallas",
             s=round(dt, 2), pps=round(n1 / dt, 1))
        del idx1, x1d, x1
    except Exception as e:
        emit(exp="cagra_1m_build_device", error=repr(e)[:200])

    # ---- 4. DEEP-10M IVF build trace ------------------------------------
    try:
        n10, d10 = 10_000_000, 96
        x10 = synthetic_clustered(n10, d10, n_clusters=50_000, seed=1)
        cfg10 = IVFConfig(dim=d10, n_clusters=16384, metric="l2",
                          dtype="int8", rerank=4, nprobe=16,
                          kmeans_iters=6, kmeans_sample=131072)
        ivf = IVFIndex(cfg10)
        t0 = time.perf_counter()
        ivf.build(x10)
        jax.block_until_ready(ivf.state)
        dt = time.perf_counter() - t0
        emit(exp="deep10m_build_cold", s=round(dt, 1),
             pps=round(n10 / dt, 1))
        del ivf
        ivf = IVFIndex(cfg10)
        t0 = time.perf_counter()
        ivf.build(x10)
        jax.block_until_ready(ivf.state)
        dt = time.perf_counter() - t0
        emit(exp="deep10m_build_warm", s=round(dt, 1),
             pps=round(n10 / dt, 1))
    except Exception as e:
        emit(exp="deep10m", error=repr(e)[:300])


if __name__ == "__main__":
    main()
