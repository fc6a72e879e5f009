"""Round-4 large-scale single-chip PQ: REAL >=30M build+search on the TPU
(VERDICT r3 item 2 — replace the 100M arithmetic with a hardware row).

Protocol (one pass over the corpus — upload is the 40 MB/s wall):
  * corpus: DEEP-like 96d Gaussian mixture, 32k shared centers, generated
    host-side chunk by chunk from per-chunk SELF-CONTAINED rng streams
    (fingerprinted; the round-3 stale-cache lessons).
  * per 2M-row chunk: ONE device_put serves both (a) PQFlatIndex.add
    (codebooks train on chunk 0) and (b) the exact GT oracle — a throwaway
    FlatIndex(precision="highest") over the resident chunk scores the query
    batch, and per-chunk top-k merge on host gives exact global GT.
  * HBM discipline: state ingest donates its buffers (pqflat._ingest
    donate_argnums), chunks are freed after use; at 30M x 96d the index is
    codes 0.72 GB (ns48) + int8 refine 3.0 GB.
  * search: staged device queries, rerank sweep, value-synced timing.

Run: python examples/exp_r4_scale.py [--n 30000000] [--chunk 2000000]
         [--n-sub 48] [--refine int8]
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


N_CENTERS = 32768
D = 96


def centers():
    return (np.random.default_rng(4242)
            .standard_normal((N_CENTERS, D)).astype(np.float32) * 2.0)


def make_chunk(cents, i, rows):
    """Chunk i of the corpus: SELF-CONTAINED stream rng(9000+i)."""
    rng = np.random.default_rng(9000 + i)
    a = rng.integers(0, N_CENTERS, rows)
    return (cents[a]
            + 0.25 * rng.standard_normal((rows, D)).astype(np.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=30_000_000)
    ap.add_argument("--chunk", type=int, default=2_000_000)
    ap.add_argument("--n-sub", type=int, default=48)
    ap.add_argument("--refine", default="int8")
    ap.add_argument("--nq", type=int, default=2048)
    ap.add_argument("--rrs", default="8,16,32",
                    help="comma-separated rerank depths to sweep; the 30M "
                         "recall ceiling is ADC-bound so deep rr (128-256) "
                         "is the lever — the refine gather is ~1% of the "
                         "scan cost at this scale")
    args = ap.parse_args()
    assert args.n % args.chunk == 0

    import jax
    from zvdb_tpu.utils.cache import setup_compile_cache
    setup_compile_cache("tpu")
    import jax.numpy as jnp

    from zvdb_tpu import FlatConfig, FlatIndex, PQConfig, PQFlatIndex

    t0 = time.perf_counter()
    jnp.zeros(()).block_until_ready()
    log(f"device init {time.perf_counter() - t0:.1f}s "
        f"backend={jax.default_backend()}")

    cents = centers()
    k = 10
    # queries: perturbed points of chunk 0 (self-contained q stream)
    qrng = np.random.default_rng(555)
    c0 = make_chunk(cents, 0, args.chunk)
    q = (c0[qrng.integers(0, args.chunk, args.nq)]
         + 0.12 * qrng.standard_normal((args.nq, D))).astype(np.float32)
    qd = jax.device_put(jnp.asarray(q))
    jax.block_until_ready(qd)

    cfg = PQConfig(dim=D, n_sub=args.n_sub, n_codes=16, scan="pallas",
                   refine=args.refine, rerank=16, l_bins=1024, per_bin=2,
                   train_sample=131072)
    log(f"config: {cfg.bytes_per_vector} B/vec -> "
        f"{cfg.bytes_per_vector * args.n / 2**30:.2f} GB index at n={args.n:,}")
    idx = PQFlatIndex(cfg, capacity=args.n)

    gs = np.full((args.nq, k), np.inf, np.float32)
    gi = np.full((args.nq, k), -1, np.int64)
    n_chunks = args.n // args.chunk
    t_gen = t_up = t_add = t_gt = 0.0
    t_total0 = time.perf_counter()
    for i in range(n_chunks):
        t0 = time.perf_counter()
        xc = c0 if i == 0 else make_chunk(cents, i, args.chunk)
        t_gen += time.perf_counter() - t0
        t0 = time.perf_counter()
        xd = jax.device_put(jnp.asarray(xc))
        jax.block_until_ready(xd)
        t_up += time.perf_counter() - t0
        del xc
        t0 = time.perf_counter()
        idx.add(xd)
        jax.block_until_ready(idx.state.codes)
        t_add += time.perf_counter() - t0
        # exact oracle over the resident chunk -> merge into global GT
        t0 = time.perf_counter()
        oracle = FlatIndex(FlatConfig(dim=D, precision="highest",
                                      tile_n=250_000), capacity=args.chunk)
        oracle.add(xd)
        s_c, i_c = (np.asarray(v) for v in oracle.search(qd, k))
        del oracle, xd
        i_c = i_c.astype(np.int64) + i * args.chunk
        alls = np.concatenate([gs, s_c], axis=1)
        alli = np.concatenate([gi, i_c], axis=1)
        pos = np.argsort(alls, axis=1, kind="stable")[:, :k]
        gs = np.take_along_axis(alls, pos, axis=1)
        gi = np.take_along_axis(alli, pos, axis=1)
        t_gt += time.perf_counter() - t0
        log(f"chunk {i + 1}/{n_chunks}: gen {t_gen:.0f}s up {t_up:.0f}s "
            f"add {t_add:.0f}s gt {t_gt:.0f}s")
    t_wall = time.perf_counter() - t_total0
    log(f"BUILD n={args.n:,}: wall {t_wall:.0f}s "
        f"({args.n / t_wall:,.0f} pts/s incl. GT pass; "
        f"upload-only {args.n / max(t_up, 1e-9):,.0f}; "
        f"ingest-only {args.n / max(t_add, 1e-9):,.0f} pts/s)")

    # ---- search: recall + QPS at a few rerank depths ----------------------
    staged = [qd]

    def timed_qps(fn, reps=4):
        best = 0.0
        for _ in range(2):
            outs = []
            t0 = time.perf_counter()
            for _ in range(reps):
                for qb in staged:
                    outs.append(fn(qb))
            jax.block_until_ready(outs)
            best = max(best, reps * args.nq / (time.perf_counter() - t0))
        return best

    gt = gi
    for rr in tuple(int(s) for s in args.rrs.split(",")):
        try:
            fn = lambda qq, rr=rr: idx.search(qq, k, rerank=rr)
            ids = np.asarray(fn(qd)[1])
            r = recall_vs(ids, gt, k)
            qps = timed_qps(fn)
            log(f"RESULT pq-scale n={args.n:,} ns{args.n_sub} rr{rr}: "
                f"recall={r:.4f} qps={qps:,.0f}")
        except Exception as e:
            # one bad compile must not discard a 40-minute build
            log(f"RESULT pq-scale rr{rr}: FAILED {e!r}")
    log("DONE")


if __name__ == "__main__":
    main()
