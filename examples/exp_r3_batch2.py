"""Round-3 TPU experiment batch #2.

  1. block-kNN selection microbench at build shapes (einsum-only / approx /
     binfold / exact) — where does the 0.33 s/pass go?
  2. warm 100k cagra build with block_topk=binfold: build_pps + self-hit
  3. device-resident 100k build (corpus already on device — no relay upload)
  4. IVF build phase trace at the bench config (C=1024, 12 Lloyd iters)
  5. 1M cagra: build (host + device-resident) and a search sweep
     (anchors x ef x search_degree) with recall against the flat oracle
  6. flat @ 1M: pallas bf16-scan + exact rerank vs the XLA two-pass

One JSON line per result on stdout.
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
        CagraConfig, CagraIndex, FlatConfig, FlatIndex, IVFConfig, IVFIndex,
    )
    from zvdb_tpu.bench.harness import recall_at_k
    from zvdb_tpu.io.datasets import load_dataset, synthetic_clustered

    n, d = 100_000, 128
    x, _, _, metric = load_dataset("sift1m", max_rows=n)
    x = np.ascontiguousarray(x[:n], np.float32)
    t0 = time.time()
    _ = float((jnp.ones((8, 128)) @ jnp.ones((128, 8))).sum())
    log(f"device init {time.time()-t0:.1f}s")

    # ---- 1. block-kNN selection microbench ------------------------------
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

    # einsum-only baseline: same gather+score, selection replaced by a
    # single min-reduce (sets the floor the selection variants add to)
    import functools

    @functools.partial(jax.jit, donate_argnums=())
    def score_only(x_, xn_, bp):
        safe = jnp.maximum(bp, 0)
        v = jnp.take(x_, safe, axis=0)
        vn = jnp.take(xn_, safe, axis=0)
        dots = jnp.einsum("cbd,ced->cbe", v, v,
                          preferred_element_type=jnp.float32)
        s = vn[:, None, :] - 2.0 * dots
        return jnp.min(s, axis=-1)

    def run_score_only():
        t0 = time.perf_counter()
        outs = []
        with jax.default_matmul_precision("high"):
            for lo in range(0, c_blocks, cc):
                hi = min(lo + cc, c_blocks)
                bp = np.full((cc, bcap), -1, np.int32)
                bp[: hi - lo] = block_pts[lo:hi]
                outs.append(score_only(xj, xn, jnp.asarray(bp)))
        jax.block_until_ready(outs)
        return time.perf_counter() - t0

    run_score_only()
    emit(exp="block_sel", mode="einsum_only",
         s=round(min(run_score_only(), run_score_only()), 4))

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
                    sel=sel,
                )
        jax.block_until_ready(cand_s)
        return time.perf_counter() - t0

    for sel in ("approx", "binfold", "exact"):
        run_blocks(sel)
        emit(exp="block_sel", mode=sel,
             s=round(min(run_blocks(sel), run_blocks(sel)), 4))

    # ---- 2+3. cagra build: binfold + device-resident --------------------
    for bt in ("approx", "binfold"):
        cfg = CagraConfig(dim=d, degree=32, metric=metric, block_topk=bt)
        warm = CagraIndex(cfg)
        warm.build(x)
        jax.block_until_ready(warm.state)
        del warm
        best = float("inf")
        for _ in range(2):
            idx = CagraIndex(cfg)
            t0 = time.perf_counter()
            idx.build(x)
            jax.block_until_ready(idx.state)
            best = min(best, time.perf_counter() - t0)
        ids = np.asarray(idx.search(x[:2048], 1, ef_search=12)[1])
        emit(exp="cagra_build", mode=bt, s=round(best, 3),
             pps=round(n / best, 1),
             self_hit=round(float((ids[:, 0] == np.arange(2048)).mean()), 4))
        # device-resident: corpus already on device, no relay upload
        best = float("inf")
        for _ in range(2):
            idx = CagraIndex(cfg)
            xd = jax.device_put(x)
            jax.block_until_ready(xd)
            t0 = time.perf_counter()
            idx.build(xd)
            jax.block_until_ready(idx.state)
            best = min(best, time.perf_counter() - t0)
        emit(exp="cagra_build_device", mode=bt, s=round(best, 3),
             pps=round(n / best, 1))
        del idx

    # ---- 4. IVF build trace ---------------------------------------------
    ivf_cfg = IVFConfig(dim=d, n_clusters=1024, nprobe=8, metric=metric)
    warm = IVFIndex(ivf_cfg)
    warm.build(x)
    jax.block_until_ready(warm.state)
    del warm
    best = float("inf")
    for _ in range(2):
        ivf = IVFIndex(ivf_cfg)
        t0 = time.perf_counter()
        ivf.build(x)
        jax.block_until_ready(ivf.state)
        best = min(best, time.perf_counter() - t0)
    emit(exp="ivf_build", s=round(best, 3), pps=round(n / best, 1))
    del ivf

    # ---- 5. 1M cagra ----------------------------------------------------
    n1 = 1_000_000
    x1 = synthetic_clustered(n1, d, n_clusters=10_000, seed=0)
    rng = np.random.default_rng(9)
    nq, k = 10_000, 10
    q1 = (x1[rng.integers(0, n1, nq)]
          + 0.05 * rng.standard_normal((nq, d))).astype(np.float32)
    gt_cache = f"/tmp/zvdb_gt1m_{d}_{nq}_{k}.npz"
    if os.path.exists(gt_cache):
        gt1 = np.load(gt_cache)["gt"]
    else:
        oracle = FlatIndex(FlatConfig(dim=d, precision="highest",
                                      tile_n=262144), capacity=n1)
        oracle.add(x1)
        gt1 = np.concatenate([
            np.asarray(oracle.search(q1[lo:lo + 2048], k)[1])
            for lo in range(0, nq, 2048)
        ])
        np.savez(gt_cache, gt=gt1)
        del oracle
    log("gt1 ready")

    cfg1 = CagraConfig(dim=d, degree=32, metric=metric, block_topk="binfold")
    idx1 = CagraIndex(cfg1)
    t0 = time.perf_counter()
    idx1.build(x1)
    jax.block_until_ready(idx1.state)
    emit(exp="cagra_1m_build", s=round(time.perf_counter() - t0, 2),
         pps=round(n1 / (time.perf_counter() - t0), 1))
    # warm rebuild from device-resident corpus
    x1d = jax.device_put(x1)
    jax.block_until_ready(x1d)
    idx1b = CagraIndex(cfg1)
    t0 = time.perf_counter()
    idx1b.build(x1d)
    jax.block_until_ready(idx1b.state)
    emit(exp="cagra_1m_build_device", s=round(time.perf_counter() - t0, 2),
         pps=round(n1 / (time.perf_counter() - t0), 1))
    del idx1b, x1d

    staged = [jax.device_put(jnp.asarray(q1[lo:lo + 5000]))
              for lo in range(0, nq, 5000)]
    jax.block_until_ready(staged)
    # sweep: (n_anchors, n_seeds, ef, search_degree, expand)
    combos = [
        (0, 16, 12, 24, 4),          # round-2 default (A=32768 auto)
        (131072, 16, 12, 24, 4),     # 4x anchors
        (131072, 24, 12, 24, 4),
        (131072, 16, 16, 24, 4),
        (262144, 16, 12, 24, 4),     # 8x anchors
        (131072, 16, 12, 16, 4),
        (131072, 16, 10, 24, 8),
    ]
    import dataclasses

    for (na, ns, ef, sd, exp_) in combos:
        cfg_s = dataclasses.replace(cfg1, n_anchors=na, n_seeds=ns,
                                    search_degree=sd, expand=exp_)
        idx1.cfg = cfg_s
        if na:
            # re-pick anchors at the new size
            from zvdb_tpu.index.cagra import _reseed_anchors
            idx1.state = _reseed_anchors(idx1.state, n1,
                                         jax.random.PRNGKey(42), na)
            idx1._packed_table = None
        ids = np.concatenate([
            np.asarray(idx1.search(qb, k, ef_search=ef)[1]) for qb in staged
        ])
        rec = recall_at_k(ids, gt1, k)
        qps = timed_qps(lambda qb: idx1.search(qb, k, ef_search=ef), staged)
        emit(exp="cagra_1m_search", anchors=na or 32768, seeds=ns, ef=ef,
             sd=sd, expand=exp_, recall=round(rec, 4), qps=round(qps, 1))
    del idx1

    # ---- 6. flat 1M: pallas rerank vs xla rerank ------------------------
    for scan in ("xla", "pallas"):
        fl = FlatIndex(
            FlatConfig(dim=d, metric=metric, rerank=4, recall_target=0.97,
                       tile_n=500_000, scan=scan, l_bins=256,
                       pallas_chunk=4096, pallas_bq=512),
            capacity=n1,
        )
        fl.add(x1)
        jax.block_until_ready(fl.state)
        staged2 = [jax.device_put(jnp.asarray(q1[lo:lo + 2048]))
                   for lo in range(0, nq, 2048)]
        jax.block_until_ready(staged2)
        ids = np.concatenate([
            np.asarray(fl.search(qb, k, approx=True)[1]) for qb in staged2
        ])
        rec = recall_at_k(ids, gt1, k)
        qps = timed_qps(lambda qb: fl.search(qb, k, approx=True), staged2)
        emit(exp="flat_1m_rerank", scan=scan, recall=round(rec, 4),
             qps=round(qps, 1))
        del fl


if __name__ == "__main__":
    main()
