"""Round-5 filtered-search crossover: masked scan vs beam/probe by selectivity.

VERDICT r4 item 6: the round-4 policy (exact masked scan as the default
filtered path) is measured at 100k and 1M where the scan wins at every
selectivity <= 50% — but it is O(N*D) per query, and the policy conceded
"near-all-pass filters on very large corpora" to the beam/probe path with no
number saying where that regime starts. This script prices the full grid:

  selectivity {1%, 10%, 50%, 90%, 99%} x {scan, beam/probe}
  on  cagra @ 1M x 128d   (the graph engine: beam path)
  and ivf   @ 10M x 96d   (the probe engine: probe path, float blocks)

Recall for the beam/probe modes is measured against the masked scan's own
output — the scan is exact by construction (flat.masked_exact_search), so
its ids ARE the filtered ground truth.

The measured crossover constants feed utils/filter_policy.py and the
filter_mode="auto" default (engines route per-call on mask selectivity x N).

Run: python examples/exp_r5_filter.py [--skip-10m] [--cagra-10m]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


SELS = (0.01, 0.10, 0.50, 0.90, 0.99)


def make_mask(n: int, sel: float, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.random(n) < sel


def recall_vs(ids: np.ndarray, gt: np.ndarray, k: int) -> float:
    return float(np.mean([
        len(set(a.tolist()) & set(b.tolist())) / k
        for a, b in zip(ids, gt)
    ]))


def run_grid(name, idx, q, k, n, alt_mode, alt_kwargs, batch=2048):
    """Time scan vs alt (beam/probe) at each selectivity; recall vs scan."""
    import jax
    import jax.numpy as jnp

    staged = [jax.device_put(jnp.asarray(q[lo:lo + batch]))
              for lo in range(0, q.shape[0], batch)]
    jax.block_until_ready(staged)

    def timed(fn, reps=2):
        best = 0.0
        for _ in range(2):
            outs = []
            t0 = time.perf_counter()
            for _ in range(reps):
                for qb in staged:
                    outs.append(fn(qb))
            jax.block_until_ready(outs)
            best = max(best, reps * q.shape[0] / (time.perf_counter() - t0))
        return best

    for sel in SELS:
        mask = make_mask(n, sel, seed=int(sel * 1000) + 17)
        md = jax.device_put(jnp.asarray(mask))
        jax.block_until_ready(md)
        # exact filtered GT = the scan mode's own output
        gt_ids = np.concatenate([
            np.asarray(idx.search(qb, k, allowed=md, filter_mode="scan")[1])
            for qb in staged])
        qps_scan = timed(
            lambda qb: idx.search(qb, k, allowed=md, filter_mode="scan"))
        alt_ids = np.concatenate([
            np.asarray(idx.search(qb, k, allowed=md, filter_mode=alt_mode,
                                  **alt_kwargs)[1])
            for qb in staged])
        r_alt = recall_vs(alt_ids, gt_ids, k)
        qps_alt = timed(
            lambda qb: idx.search(qb, k, allowed=md, filter_mode=alt_mode,
                                  **alt_kwargs))
        log(f"RESULT filter {name} sel={sel:.2f}: "
            f"scan qps={qps_scan:,.0f} (exact) | "
            f"{alt_mode} qps={qps_alt:,.0f} recall={r_alt:.4f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-10m", action="store_true")
    ap.add_argument("--cagra-10m", action="store_true",
                    help="also build cagra at 10M (adds ~5 min)")
    ap.add_argument("--nq", type=int, default=4096)
    args = ap.parse_args()

    import jax

    from zvdb_tpu.utils.cache import setup_compile_cache
    setup_compile_cache("tpu")
    import jax.numpy as jnp

    from exp_r4_batch1 import corpus_1m
    from zvdb_tpu import CagraConfig, CagraIndex, IVFConfig, IVFIndex

    t0 = time.perf_counter()
    jnp.zeros(()).block_until_ready()
    log(f"device init {time.perf_counter() - t0:.1f}s "
        f"backend={jax.default_backend()}")
    k = 10

    # ---- cagra @ 1M x 128d (beam alt path) --------------------------------
    x1, q1, _fp = corpus_1m()
    q1 = q1[:args.nq]
    xd = jax.device_put(jnp.asarray(x1))
    jax.block_until_ready(xd)
    cg = CagraIndex(CagraConfig(dim=128, degree=32, n_anchors=262144,
                                search_degree=24, max_iters=4, ef_search=12))
    t0 = time.perf_counter()
    cg.build(xd)
    jax.block_until_ready(cg.state)
    log(f"cagra 1M build {time.perf_counter() - t0:.1f}s")
    run_grid("cagra-1m", cg, q1, k, x1.shape[0], "beam",
             dict(ef_search=64))
    del cg, xd

    if args.skip_10m:
        log("DONE")
        return

    # ---- ivf @ 10M x 96d float blocks (probe alt path) --------------------
    # DEEP-like mixture, one device-resident build (float blocks = 3.84 GB
    # on-chip — the exp_r3_batch11 DEEP-10M protocol, float instead of int8
    # so both filter modes scan the same store).
    import gc

    N10, D10 = 10_000_000, 96
    cents = (np.random.default_rng(4242)
             .standard_normal((32768, D10)).astype(np.float32) * 2.0)
    rng10 = np.random.default_rng(9000)
    a10 = rng10.integers(0, 32768, N10)
    x10 = (cents[a10]
           + 0.25 * rng10.standard_normal((N10, D10)).astype(np.float32))
    qrng = np.random.default_rng(555)
    q10 = (x10[qrng.integers(0, N10, args.nq)]
           + 0.12 * qrng.standard_normal((args.nq, D10))).astype(np.float32)
    x10d = jax.device_put(jnp.asarray(x10))
    jax.block_until_ready(x10d)
    del x10, a10
    gc.collect()

    ivf = IVFIndex(IVFConfig(dim=D10, n_clusters=8192, nprobe=16,
                             kmeans_iters=4, kmeans_sample=131072))
    t0 = time.perf_counter()
    ivf.build(x10d)
    jax.block_until_ready(ivf.state.blocks)
    log(f"ivf 10M build {time.perf_counter() - t0:.1f}s")
    run_grid("ivf-10m", ivf, q10, k, N10, "probe", dict(nprobe=64))
    del ivf

    if args.cagra_10m:
        cg10 = CagraIndex(CagraConfig(
            dim=D10, degree=32, n_anchors=262144,
            search_degree=24, max_iters=4, ef_search=12))
        t0 = time.perf_counter()
        cg10.build(x10d)
        jax.block_until_ready(cg10.state)
        log(f"cagra 10M build {time.perf_counter() - t0:.1f}s")
        run_grid("cagra-10m", cg10, q10, k, N10, "beam",
                 dict(ef_search=64))
        del cg10
    del x10d
    log("DONE")


if __name__ == "__main__":
    main()
