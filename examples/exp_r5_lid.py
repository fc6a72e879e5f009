"""Round-5 LID-matched hard protocol: engines on a SIFT-like local geometry.

VERDICT r4 item 7: four rounds of numbers are synthetic isotropic mixtures,
and the env is air-gapped (no SIFT1M download — the blocker is documented in
docs/PERF.md). The risk named by the judge: "synthetic 10k-cluster corpora
may flatter anchor seeding". The retirement plan: make the stand-in's LOCAL
geometry measurable and match it to published SIFT1M — real descriptor sets
have Levina-Bickel MLE local-intrinsic-dimensionality ~9-12 (Amsaleg et al.,
KDD'15, table 2: SIFT 9.3-12.3) while our isotropic clusters read 36-47 on
the same estimator (io/datasets.py:estimate_lid).

synthetic_lowlid places each cluster's points on its own random
subdim-dimensional subspace: subdim=12 at 1000 pts/cluster measures MLE LID
9.8-12.1 (k=100/k=20) — inside the SIFT1M band. This script runs the
shipping engine configs on that corpus at 1M x 128d with same-manifold
queries (genuinely hard: answers are manifold neighbors, not perturbation
self-hits) and exact device GT.

Run: python examples/exp_r5_lid.py [--n 1000000] [--nq 10000]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from exp_r4_batch1 import batched_ids, timed_qps  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def recall_vs(ids, gt, k):
    return float(np.mean([
        len(set(a.tolist()) & set(b.tolist())) / k for a, b in zip(ids, gt)
    ]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--nq", type=int, default=10_000)
    ap.add_argument("--subdim", type=int, default=12)
    ap.add_argument("--skip-lid", action="store_true",
                    help="skip the ~2 min CPU LID estimate (already measured)")
    args = ap.parse_args()

    from zvdb_tpu.io.datasets import (estimate_lid, lowlid_queries,
                                      synthetic_lowlid)

    d, k, n_clusters = 128, 10, 1000
    t0 = time.perf_counter()
    x = synthetic_lowlid(args.n, d, subdim=args.subdim,
                         n_clusters=n_clusters, seed=0)
    q = lowlid_queries(args.nq, d, subdim=args.subdim,
                       n_clusters=n_clusters, seed=0)
    log(f"corpus gen {time.perf_counter() - t0:.0f}s")
    if not args.skip_lid:
        t0 = time.perf_counter()
        lid = estimate_lid(x, k=100, n_sample=2000)
        log(f"MEASURED corpus LID (MLE k=100): {lid:.1f} "
            f"(SIFT1M published band: ~9-12) [{time.perf_counter() - t0:.0f}s]")

    import jax
    from zvdb_tpu.utils.cache import setup_compile_cache
    setup_compile_cache("tpu")
    import jax.numpy as jnp

    from zvdb_tpu import (CagraConfig, CagraIndex, FlatConfig, FlatIndex,
                          IVFConfig, IVFIndex)

    t0 = time.perf_counter()
    jnp.zeros(()).block_until_ready()
    log(f"device init {time.perf_counter() - t0:.1f}s "
        f"backend={jax.default_backend()}")

    xd = jax.device_put(jnp.asarray(x))
    qd = jax.device_put(jnp.asarray(q))
    jax.block_until_ready([xd, qd])

    # exact GT on device (self-contained, fingerprint-keyed cache — the
    # stale-GT rule from CLAUDE.md round-3)
    fp = float(np.sum(x[::65537, 7]))
    cache = f"/tmp/zvdb_gt_r5lid_{args.n}_{d}_{args.nq}_{k}_sd{args.subdim}.npz"
    gt = None
    if os.path.exists(cache):
        z = np.load(cache)
        if abs(float(z["fp"]) - fp) < 1e-3:
            gt = z["gt"]
            log("gt cache hit")
    if gt is None:
        t0 = time.perf_counter()
        oracle = FlatIndex(FlatConfig(dim=d, precision="highest",
                                      tile_n=262144), capacity=args.n)
        oracle.add(xd)
        gt = np.concatenate([
            np.asarray(oracle.search(qd[lo:lo + 2048], k)[1])
            for lo in range(0, args.nq, 2048)])
        del oracle
        np.savez(cache, gt=gt, fp=np.float64(fp))
        log(f"gt computed {time.perf_counter() - t0:.0f}s")

    # ---- flat (the shipping 1M config: approx two-pass + exact rerank) ----
    fl = FlatIndex(FlatConfig(dim=d, rerank=4, recall_target=0.97,
                              tile_n=500_000), capacity=args.n)
    t0 = time.perf_counter()
    fl.add(xd)
    jax.block_until_ready(fl.state.vectors)
    log(f"flat build {time.perf_counter() - t0:.1f}s")
    fn = lambda qb: fl.search(qb, k, approx=True)
    r = recall_vs(batched_ids(fn, qd), gt, k)
    qps = timed_qps(fn, qd)
    log(f"RESULT lid-1m flat: recall={r:.4f} qps={qps:,.0f}")
    del fl

    # ---- ivf (shipping config at 1M scale) --------------------------------
    ivf = IVFIndex(IVFConfig(dim=d, n_clusters=4096, nprobe=8,
                             kmeans_iters=4, kmeans_sample=131072))
    t0 = time.perf_counter()
    ivf.build(xd)
    jax.block_until_ready(ivf.state.blocks)
    log(f"ivf build {time.perf_counter() - t0:.1f}s")
    for np_ in (2, 8, 16):
        fn = lambda qb, np_=np_: ivf.search(qb, k, nprobe=np_)
        r = recall_vs(batched_ids(fn, qd), gt, k)
        qps = timed_qps(fn, qd)
        log(f"RESULT lid-1m ivf np{np_}: recall={r:.4f} qps={qps:,.0f}")
    del ivf

    # ---- cagra (the shipping 1M frontier config) ---------------------------
    cg = CagraIndex(CagraConfig(dim=d, degree=32, n_anchors=262144,
                                search_degree=24, max_iters=4, ef_search=12))
    t0 = time.perf_counter()
    cg.build(xd)
    jax.block_until_ready(cg.state.nbrs)
    log(f"cagra build {time.perf_counter() - t0:.1f}s")
    for ef, sd, mi in ((12, 24, 4), (16, 24, 6), (32, 32, 8)):
        fn = (lambda qb, ef=ef, sd=sd, mi=mi:
              cg.search(qb, k, ef_search=ef, search_degree=sd, max_iters=mi))
        r = recall_vs(batched_ids(fn, qd), gt, k)
        qps = timed_qps(fn, qd)
        log(f"RESULT lid-1m cagra ef{ef} sd{sd} mi{mi}: "
            f"recall={r:.4f} qps={qps:,.0f}")
    log("DONE")


if __name__ == "__main__":
    main()
