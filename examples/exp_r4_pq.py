"""Round-4 PQ hardware sweep (VERDICT r3 item 1).

Stages (each prints immediately so a Mosaic failure surfaces fast):
  0. tiny Mosaic parity: pallas ADC kernel vs exact XLA PQ scan at 20k.
  1. 1M x 128d sweep: n_sub {16, 32} x rerank {4, 8, 16, 32} x l_bins
     {256, 512} x opq — recall@10 + QPS (device-staged queries) + build.
Produces the PERF.md "PQ on hardware" table. Self-contained GT cache with
corpus fingerprint (round-3 stale-cache lesson: never share rng streams
across scripts).

Run: python examples/exp_r4_pq.py [--stage N]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def recall_at_k(ids, gt, k):
    return float(np.mean([
        len(set(a.tolist()) & set(b.tolist())) / k for a, b in zip(ids, gt)
    ]))


def timed_qps(search_fn, q, batch, reps=6):
    import jax
    import jax.numpy as jnp

    staged = [jax.device_put(jnp.asarray(q[lo:lo + batch]))
              for lo in range(0, q.shape[0], batch)]
    jax.block_until_ready(staged)
    best = 0.0
    for _ in range(2):
        outs = []
        t0 = time.perf_counter()
        for _ in range(reps):
            for qb in staged:
                outs.append(search_fn(qb))
        jax.block_until_ready(outs)
        best = max(best, reps * q.shape[0] / (time.perf_counter() - t0))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=-1, help="-1 = all")
    args = ap.parse_args()

    import jax
    from zvdb_tpu.utils.cache import setup_compile_cache
    setup_compile_cache("tpu")
    import jax.numpy as jnp

    from zvdb_tpu import FlatConfig, FlatIndex, PQConfig, PQFlatIndex
    from zvdb_tpu.io.datasets import synthetic_clustered

    t0 = time.perf_counter()
    jnp.zeros(()).block_until_ready()
    log(f"device init {time.perf_counter() - t0:.1f}s "
        f"backend={jax.default_backend()}")

    d, k, nq = 128, 10, 10_000

    # ---------------- stage 0: Mosaic parity ------------------------------
    if args.stage in (-1, 0):
        from zvdb_tpu.index.pqflat import _pq_scan
        from zvdb_tpu.ops import pq as PQ
        from zvdb_tpu.ops.pallas_pq import pq_scan_topk

        n0 = 20_000
        x0 = synthetic_clustered(n0, d, n_clusters=256, seed=3)
        rng = np.random.default_rng(7)
        q0 = (x0[rng.integers(0, n0, 256)]
              + 0.05 * rng.standard_normal((256, d))).astype(np.float32)
        idx = PQFlatIndex(PQConfig(dim=d, n_sub=32, n_codes=16,
                                   refine="none"))
        idx.build(x0)
        st = idx.state
        lut = PQ.adc_lut(jnp.asarray(q0), st.codebooks)
        t0 = time.perf_counter()
        ks, ki = pq_scan_topk(lut, st.codes, st.norms, k, l_bins=256,
                              chunk=1024, precision="default")
        ks = np.asarray(ks)
        log(f"stage0 kernel compile+run {time.perf_counter() - t0:.1f}s")
        xs, xi = map(np.asarray, _pq_scan(
            st, jnp.asarray(q0), k, "l2", 100000, False, 0.95, "highest",
            packed=True))
        tol = 1e-2 + 1e-3 * np.abs(xs[:, -1:])
        rec = float(np.mean(ks <= xs[:, -1:] + tol))
        log(f"stage0 score-threshold selection recall vs exact scan: "
            f"{rec:.4f} (bound ~0.965 at L=256)")
        assert rec > 0.9, "KERNEL BROKEN ON TPU"
        log("stage0 OK — Mosaic lowering + layout verified on hardware")

    if args.stage not in (-1, 1):
        return

    # ---------------- stage 1: 1M sweep -----------------------------------
    n1 = 1_000_000
    x1 = synthetic_clustered(n1, d, n_clusters=10_000, seed=0)
    fp = float(np.sum(x1[::65537, 7]))       # corpus fingerprint
    rng = np.random.default_rng(12345)       # SELF-CONTAINED query stream
    q1 = (x1[rng.integers(0, n1, nq)]
          + 0.05 * rng.standard_normal((nq, d))).astype(np.float32)
    cache = f"/tmp/zvdb_gt_r4pq_{n1}_{d}_{nq}_{k}_v2.npz"
    gt1 = None
    if os.path.exists(cache):
        z = np.load(cache)
        if abs(float(z["fp"]) - fp) < 1e-3:
            gt1 = z["gt"]
            log("gt cache hit")
    if gt1 is None:
        t0 = time.perf_counter()
        oracle = FlatIndex(FlatConfig(dim=d, precision="highest",
                                      tile_n=262144), capacity=n1)
        oracle.add(x1)
        gt1 = np.concatenate([
            np.asarray(oracle.search(q1[lo:lo + 2048], k)[1])
            for lo in range(0, nq, 2048)])
        del oracle
        np.savez(cache, gt=gt1, fp=np.float64(fp))
        log(f"gt computed in {time.perf_counter() - t0:.1f}s")

    xd1 = jax.device_put(x1)
    jax.block_until_ready(xd1)

    def run(tag, cfg, batch=2048):
        try:
            warm = PQFlatIndex(cfg)
            warm.build(xd1)
            jax.block_until_ready(warm.state)
            del warm
            best_b = float("inf")
            for _ in range(2):
                pqi = PQFlatIndex(cfg)
                t0 = time.perf_counter()
                pqi.build(xd1)
                jax.block_until_ready(pqi.state)
                best_b = min(best_b, time.perf_counter() - t0)
            ids = np.concatenate([
                np.asarray(pqi.search(q1[lo:lo + batch], k)[1])
                for lo in range(0, nq, batch)])
            r = recall_at_k(ids, gt1, k)
            qps = timed_qps(lambda qq: pqi.search(qq, k), q1, batch)
            log(f"RESULT {tag}: recall={r:.4f} qps={qps:,.0f} "
                f"build={n1 / best_b:,.0f} pts/s "
                f"bytes/vec={cfg.bytes_per_vector}")
            del pqi
            return r, qps
        except Exception as e:
            log(f"RESULT {tag}: FAILED {e!r}")
            return None, None

    base = dict(dim=d, n_codes=16, scan="pallas", refine="int8")

    # axis 1: rerank at n_sub=32, l_bins=512
    for rr in (4, 8, 16, 32):
        run(f"ns32 rr{rr} L512", PQConfig(n_sub=32, rerank=rr, l_bins=512,
                                          **base))
    # axis 2: l_bins at the promising rerank
    run("ns32 rr16 L256", PQConfig(n_sub=32, rerank=16, l_bins=256, **base))
    # axis 3: n_sub=16 (8 B/vec codes)
    for rr in (16, 32):
        run(f"ns16 rr{rr} L512", PQConfig(n_sub=16, rerank=rr, l_bins=512,
                                          **base))
    # axis 4: OPQ at the workhorse point
    run("ns32 rr16 L512 OPQ", PQConfig(n_sub=32, rerank=16, l_bins=512,
                                       opq=True, **base))
    # axis 5: scan precision high (2-pass LUT)
    run("ns32 rr16 L512 prec-high", PQConfig(n_sub=32, rerank=16, l_bins=512,
                                             scan_precision="high", **base))
    # axis 6: raw codes, no refine (pool-free ceiling + pure-scan speed)
    run("ns32 rr0 L512 norefine", PQConfig(dim=d, n_sub=32, n_codes=16,
                                           scan="pallas", refine="none",
                                           l_bins=512))
    # axis 7: larger query tile (pipeline efficiency)
    run("ns32 rr16 L512 bq1024", PQConfig(n_sub=32, rerank=16, l_bins=512,
                                          pallas_bq=1024, **base))
    # reference: the 8-bit XLA config that produced the bad BENCH_r03 row
    run("ns16 C256 XLA rr4 (r3 config)", PQConfig(dim=d, n_sub=16, rerank=4,
                                                  refine="int8"))
    log("DONE")


if __name__ == "__main__":
    main()
