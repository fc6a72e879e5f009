"""Round-4 working batch 1 (VERDICT r3 items 1, 3, 4, 5 on hardware).

Stages (each prints RESULT lines; --stage N runs one):
  0. HNSW packed-layout A/B at 100k x 128d (item 3 done-bar: >=64k QPS
     @ >=0.998, 2x the round-3 32k).
  1. PQ per_bin=2 sweep at 1M x 128d (item 1 done-bar: >=0.95 @ >=150k,
     or the measured ceiling): per_bin {1,2} x L {512,1024} x rr {8,16}.
  2. CAGRA 1M frontier (item 5 done-bar: >=0.99 @ >=100k): anchors
     {262144, 524288} x (ef, sd, mi) interpolation between the round-3
     132k@0.982 and 75.7k@0.996 points.
  3. Filtered search + deletes at scale (item 4): recall/QPS vs filter
     selectivity {1%, 10%, 50%} and delete fraction {10%, 50%} for
     flat/cagra/ivf at 100k, + cagra/flat at 1M under a 1% filter.

Self-contained RNG streams; GT caches carry a corpus fingerprint (_v2
pattern — round-3 stale-cache lessons). Queries staged on-device before
timing. One TPU process; run stages together to amortize device init.

Run: python examples/exp_r4_batch1.py [--stage N]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def recall_vs(ids, gt, k):
    return float(np.mean([
        len(set(a.tolist()) & set(b.tolist())) / k for a, b in zip(ids, gt)
    ]))


def timed_qps(search_fn, q, batch=2048, reps=6, rounds=2):
    import jax
    import jax.numpy as jnp

    staged = [jax.device_put(jnp.asarray(q[lo:lo + batch]))
              for lo in range(0, q.shape[0], batch)]
    jax.block_until_ready(staged)
    best = 0.0
    for _ in range(rounds):
        outs = []
        t0 = time.perf_counter()
        for _ in range(reps):
            for qb in staged:
                outs.append(search_fn(qb))
        jax.block_until_ready(outs)
        best = max(best, reps * q.shape[0] / (time.perf_counter() - t0))
    return best


def batched_ids(search_fn, q, batch=2048):
    return np.concatenate([
        np.asarray(search_fn(q[lo:lo + batch])[1])
        for lo in range(0, q.shape[0], batch)])


def corpus_1m():
    from zvdb_tpu.io.datasets import synthetic_clustered
    n1, d, nq, k = 1_000_000, 128, 10_000, 10
    x1 = synthetic_clustered(n1, d, n_clusters=10_000, seed=0)
    fp = float(np.sum(x1[::65537, 7]))
    rng = np.random.default_rng(12345)      # SAME stream as exp_r4_pq.py
    q1 = (x1[rng.integers(0, n1, nq)]
          + 0.05 * rng.standard_normal((nq, d))).astype(np.float32)
    return x1, q1, fp


def gt_1m(x1, q1, fp):
    import jax
    import jax.numpy as jnp
    from zvdb_tpu import FlatConfig, FlatIndex

    n1, d = x1.shape
    nq, k = q1.shape[0], 10
    cache = f"/tmp/zvdb_gt_r4pq_{n1}_{d}_{nq}_{k}_v2.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        if abs(float(z["fp"]) - fp) < 1e-3:
            log("1m gt cache hit")
            return z["gt"]
    t0 = time.perf_counter()
    oracle = FlatIndex(FlatConfig(dim=d, precision="highest",
                                  tile_n=262144), capacity=n1)
    oracle.add(x1)
    gt = np.concatenate([
        np.asarray(oracle.search(q1[lo:lo + 2048], 10)[1])
        for lo in range(0, nq, 2048)])
    del oracle
    np.savez(cache, gt=gt, fp=np.float64(fp))
    log(f"1m gt computed in {time.perf_counter() - t0:.1f}s")
    return gt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=-1)
    args = ap.parse_args()

    import jax
    from zvdb_tpu.utils.cache import setup_compile_cache
    setup_compile_cache("tpu")
    import jax.numpy as jnp

    from zvdb_tpu import (CagraConfig, CagraIndex, FlatConfig, FlatIndex,
                          HNSW, HNSWConfig, IVFConfig, IVFIndex, PQConfig,
                          PQFlatIndex)
    from zvdb_tpu.io.datasets import synthetic_clustered

    t0 = time.perf_counter()
    jnp.zeros(()).block_until_ready()
    log(f"device init {time.perf_counter() - t0:.1f}s "
        f"backend={jax.default_backend()}")

    d, k, nq = 128, 10, 10_000
    n0 = 100_000
    x0 = synthetic_clustered(n0, d, n_clusters=1000, seed=1)
    rng = np.random.default_rng(777)
    q0 = (x0[rng.integers(0, n0, nq)]
          + 0.05 * rng.standard_normal((nq, d))).astype(np.float32)

    def gt_100k(allowed_mask=None, tag="base"):
        oracle = FlatIndex(FlatConfig(dim=d, precision="highest"),
                           capacity=n0)
        oracle.add(x0)
        out = np.concatenate([
            np.asarray(oracle.search(
                q0[lo:lo + 2048], k,
                allowed=allowed_mask)[1])
            for lo in range(0, nq, 2048)])
        del oracle
        return out

    # ---------------- stage 0: HNSW packed A/B -----------------------------
    if args.stage in (-1, 0):
        from zvdb_tpu.index import hnsw as H

        gt0 = gt_100k()
        idx = HNSW(HNSWConfig(dim=d))
        xd = jax.device_put(x0)
        t0 = time.perf_counter()
        idx.build(xd)
        jax.block_until_ready(idx.state.vectors)
        log(f"hnsw build {n0 / (time.perf_counter() - t0):,.0f} pts/s")
        sc = idx.search_cfg
        for ef, sd in ((12, 24), (16, 24), (16, None), (24, 24), (32, 24)):
            ids = batched_ids(lambda qq: idx.search(qq, k, ef_search=ef,
                                                    search_degree=sd), q0)
            r = recall_vs(ids, gt0, k)
            qps = timed_qps(lambda qq: idx.search(qq, k, ef_search=ef,
                                                  search_degree=sd), q0)
            log(f"RESULT hnsw-packed ef{ef} sd{sd}: recall={r:.4f} "
                f"qps={qps:,.0f}")
        # baseline A/B: same state, scorer WITHOUT the packed table
        st = idx.state

        def unpacked(qq, ef=16, sd=24):
            return H.search_state(
                st, qq, k, "l2", ef, expand=sc.expand, max_iters=None,
                max_upper_iters=sc.max_upper_iters,
                levels_cap=idx.levels_cap, precision=idx.cfg.precision,
                search_degree=sd, dedupe_candidates=sc.dedupe_candidates,
                seed_anchors=sc.seed_anchors, dead=None, packed_table=None,
            )[:2]

        ids = batched_ids(lambda qq: unpacked(qq), q0)
        r = recall_vs(ids, gt0, k)
        qps = timed_qps(lambda qq: unpacked(qq), q0)
        log(f"RESULT hnsw-UNPACKED ef16 sd24: recall={r:.4f} qps={qps:,.0f}")

    # big corpus for stages 1-3
    if args.stage in (-1, 1, 2) or args.stage == 3:
        x1, q1, fp = corpus_1m()
        gt1 = gt_1m(x1, q1, fp)
        xd1 = jax.device_put(x1)
        jax.block_until_ready(xd1)

    # ---------------- stage 1: PQ per_bin sweep at 1M ----------------------
    if args.stage in (-1, 1):
        def run_pq(tag, cfg, batch=2048):
            try:
                best_b = float("inf")
                pqi = None
                for _ in range(2):
                    if pqi is not None:
                        del pqi
                    pqi = PQFlatIndex(cfg)
                    t0 = time.perf_counter()
                    pqi.build(xd1)
                    jax.block_until_ready(pqi.state.codes)
                    best_b = min(best_b, time.perf_counter() - t0)
                ids = batched_ids(lambda qq: pqi.search(qq, k), q1, batch)
                r = recall_vs(ids, gt1, k)
                qps = timed_qps(lambda qq: pqi.search(qq, k), q1, batch)
                log(f"RESULT pq {tag}: recall={r:.4f} qps={qps:,.0f} "
                    f"build={len(x1) / best_b:,.0f} pts/s")
                del pqi
            except Exception as e:
                log(f"RESULT pq {tag}: FAILED {e!r}")

        base = dict(dim=d, n_codes=16, scan="pallas", refine="int8",
                    n_sub=32)
        for pb in (2,):
            for L in (512, 1024):
                for rr in (8, 16):
                    run_pq(f"ns32 pb{pb} L{L} rr{rr}",
                           PQConfig(per_bin=pb, l_bins=L, rerank=rr, **base))
        # pool-ceiling diagnostic: no refine, pb2 L1024
        run_pq("ns32 pb2 L1024 rr0 norefine",
               PQConfig(dim=d, n_codes=16, scan="pallas", refine="none",
                        n_sub=32, per_bin=2, l_bins=1024))
        # pb1 control at the workhorse point
        run_pq("ns32 pb1 L1024 rr16",
               PQConfig(per_bin=1, l_bins=1024, rerank=16, **base))

    # ---------------- stage 2: CAGRA 1M frontier ---------------------------
    if args.stage in (-1, 2):
        for anchors in (262144, 524288):
            cfg = CagraConfig(dim=d, n_anchors=anchors)
            idx = CagraIndex(cfg)
            t0 = time.perf_counter()
            idx.build(xd1)
            jax.block_until_ready(idx.state.vectors)
            log(f"cagra build anchors={anchors}: "
                f"{len(x1) / (time.perf_counter() - t0):,.0f} pts/s")
            for ef, sd, mi in ((12, 16, 4), (12, 24, 4), (16, 16, 5),
                               (16, 24, 5), (16, 24, 6), (24, 24, 6)):
                f = lambda qq: idx.search(qq, k, ef_search=ef,
                                          search_degree=sd, max_iters=mi)
                ids = batched_ids(f, q1)
                r = recall_vs(ids, gt1, k)
                qps = timed_qps(f, q1)
                log(f"RESULT cagra-1m a{anchors} ef{ef} sd{sd} mi{mi}: "
                    f"recall={r:.4f} qps={qps:,.0f}")
            del idx

    # ---------------- stage 3: filters + deletes at scale ------------------
    if args.stage in (-1, 3):
        mask_rng = np.random.default_rng(31337)

        def build_engines(scale):
            out = {}
            if scale == "100k":
                xs, n = x0, n0
                f = FlatIndex(FlatConfig(dim=d), capacity=n)
                f.add(jax.device_put(xs))
                c = CagraIndex(CagraConfig(dim=d))
                c.build(jax.device_put(xs))
                v = IVFIndex(IVFConfig(dim=d))
                v.build(jax.device_put(xs))
                out = {"flat": f, "cagra": c, "ivf": v}
            else:
                f = FlatIndex(FlatConfig(dim=d), capacity=len(x1))
                f.add(xd1)
                c = CagraIndex(CagraConfig(dim=d, n_anchors=262144))
                c.build(xd1)
                out = {"flat": f, "cagra": c}
            return out

        # --- filters at 100k ---
        eng = build_engines("100k")
        for sel in (0.01, 0.10, 0.50):
            mask = mask_rng.random(n0) < sel
            gtf = gt_100k(allowed_mask=mask, tag=f"sel{sel}")
            for name, idx in eng.items():
                kw = {}
                if name == "cagra":
                    # design note cagra.py:748: raise ef for selective filters
                    kw = {"ef_search": max(32, int(12 / max(sel, 0.01)))} \
                        if sel <= 0.10 else {}
                f = lambda qq: idx.search(qq, k, allowed=mask, **kw)
                ids = batched_ids(f, q0)
                r = recall_vs(ids, gtf, k)
                qps = timed_qps(f, q0)
                log(f"RESULT filter-100k {name} sel={sel}: recall={r:.4f} "
                    f"qps={qps:,.0f} {kw}")
        del eng

        # --- deletes at 100k ---
        for frac in (0.10, 0.50):
            dead = mask_rng.choice(n0, int(frac * n0), replace=False)
            alive = np.ones(n0, bool)
            alive[dead] = False
            eng = build_engines("100k")
            gtd = gt_100k(allowed_mask=alive, tag=f"del{frac}")
            for name, idx in eng.items():
                idx.remove(dead)
                f = lambda qq: idx.search(qq, k)
                ids = batched_ids(f, q0)
                r = recall_vs(ids, gtd, k)
                qps = timed_qps(f, q0)
                log(f"RESULT delete-100k {name} frac={frac}: recall={r:.4f} "
                    f"qps={qps:,.0f}")
            del eng

        # --- 1M spot checks: 1% filter + 50% delete on cagra + flat -------
        sel = 0.01
        mask1 = mask_rng.random(len(x1)) < sel
        oracle = FlatIndex(FlatConfig(dim=d, precision="highest",
                                      tile_n=262144), capacity=len(x1))
        oracle.add(xd1)
        gtf1 = np.concatenate([
            np.asarray(oracle.search(q1[lo:lo + 2048], k,
                                     allowed=mask1)[1])
            for lo in range(0, nq, 2048)])
        del oracle
        f = FlatIndex(FlatConfig(dim=d), capacity=len(x1))
        f.add(xd1)
        c = CagraIndex(CagraConfig(dim=d, n_anchors=262144))
        c.build(xd1)
        for name, idx, kw in (("flat", f, {}),
                              ("cagra", c, {"ef_search": 256}),
                              ("cagra", c, {"ef_search": 1024})):
            fn = lambda qq: idx.search(qq, k, allowed=mask1, **kw)
            ids = batched_ids(fn, q1)
            r = recall_vs(ids, gtf1, k)
            qps = timed_qps(fn, q1)
            log(f"RESULT filter-1m {name} sel=0.01 {kw}: recall={r:.4f} "
                f"qps={qps:,.0f}")
    log("DONE")


if __name__ == "__main__":
    main()
