"""Round-3: 1M graph search frontier — anchor-table size x hop budget.

CLAUDE.md: "Anchor count is the dominant recall-at-speed lever (seed matmul
is MXU-cheap)". Current north-star points at 1M (clustered, one chip):
132.3k QPS @ 0.9821 (A=262144, sd=16, mi=4, ef=12) and 75.7k @ 0.9958
(ef=16/sd=24/mi=6). Question: does A=524288 buy ~0.99 recall while staying
>=100k QPS (seed matmul grows 2x but hops stay cheap/short)?

Two device-resident builds (A=262144, A=524288), then a small search sweep
on each. GT is fingerprint-keyed (_v2 pattern — the shape-keyed gt caches
burned two prior experiments) with a SELF-CONTAINED rng stream for queries.
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


def fingerprint(x: np.ndarray) -> float:
    return float(np.asarray(x[:: max(1, x.shape[0] // 4096)], np.float64).sum())


def timed_qps(search_fn, staged, reps=3):
    import jax
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
    from zvdb_tpu import CagraConfig, CagraIndex, FlatConfig, FlatIndex
    from zvdb_tpu.bench.harness import recall_at_k
    from zvdb_tpu.io.datasets import synthetic_clustered

    n, d, nq, k = 1_000_000, 128, 10_000, 10
    x = synthetic_clustered(n, d, n_clusters=10_000, seed=0)
    rq = np.random.default_rng(4242)          # self-contained query stream
    q = (x[rq.integers(0, n, nq)]
         + 0.05 * rq.standard_normal((nq, d))).astype(np.float32)

    _ = float((jnp.ones((8, 128)) @ jnp.ones((128, 8))).sum())   # warm device

    fp = fingerprint(x) + float(np.float64(q[:64].sum()))
    gt_cache = f"/tmp/zvdb_gt_anch1m_v2_{n}_{d}_{nq}_{k}.npz"
    gt = None
    if os.path.exists(gt_cache):
        z = np.load(gt_cache)
        if abs(float(z["fp"]) - fp) < 1e-3 * max(abs(fp), 1.0):
            gt = z["gt"]
    xd = jax.device_put(jnp.asarray(x))
    jax.block_until_ready(xd)
    if gt is None:
        oracle = FlatIndex(FlatConfig(dim=d, precision="highest",
                                      tile_n=262144), capacity=n)
        oracle.add(xd)
        jax.block_until_ready(oracle.state)
        gt = np.concatenate([
            np.asarray(oracle.search(q[lo:lo + 2048], k)[1])
            for lo in range(0, nq, 2048)])
        np.savez(gt_cache, gt=gt, fp=np.float64(fp))
        del oracle
    log("gt ready")

    staged = [jax.device_put(jnp.asarray(q[lo:lo + 5000]))
              for lo in range(0, nq, 5000)]
    jax.block_until_ready(staged)

    # (anchors, [(ef, sd, mi), ...]) — each distinct tuple is one remote
    # compile; keep the grid tight.
    plans = [
        (262144, [(12, 16, 4), (16, 16, 5)]),
        (524288, [(12, 16, 3), (12, 16, 4), (16, 16, 4), (16, 24, 5)]),
    ]
    for A, sweeps in plans:
        cfg = CagraConfig(dim=d, degree=32, metric="l2", n_anchors=A)
        idx = CagraIndex(cfg)
        t0 = time.perf_counter()
        idx.build(xd)
        jax.block_until_ready(idx.state)
        bs = time.perf_counter() - t0
        log(f"A={A} build {bs:.1f}s (cold-ish)")
        for ef, sd, mi in sweeps:
            def fn(qb, ef=ef, sd=sd, mi=mi):
                return idx.search(qb, k, ef_search=ef, search_degree=sd,
                                  max_iters=mi)
            ids = np.concatenate([np.asarray(fn(s)[1]) for s in staged])
            rec = recall_at_k(ids, gt, k)
            qps = timed_qps(fn, staged)
            print(json.dumps(dict(exp="anch1m", anchors=A, ef=ef, sd=sd,
                                  mi=mi, recall=round(rec, 4),
                                  qps=round(qps))), flush=True)
        del idx


if __name__ == "__main__":
    main()
