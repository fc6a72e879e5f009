"""Round-4 capstone: 100M x 96d PQ build + search on ONE v5e chip.

VERDICT r3 item 2 said "run a real >=30M (target 100M) single-chip PQ
build+search". 30M is measured (exp_r4_scale.py, 0.9999 @ 2.3k with the
int16 refine store). 100M forces the max-compression tier: int16 refine
would be 21.2 GB; int8 refine fits — codes 24 + norm 4 + rows 96 +
scale 4 = 128 B/row -> 12.8 GB against the chip's 15.75 GB HBM. The
int8 rescore caps recall ~0.93-0.95 (the measured refine-precision
wall) — that ceiling is the documented cost of fitting 100M on a chip;
the sharded engine (ShardedPQFlat) is the int16-at-100M answer.

HBM discipline (the parts that differ from the 30M protocol):
  * chunk=1M (not 2M): the per-chunk f32 staging + exact-GT oracle +
    [nq, tile] score temps ride on top of the 12.8 GB state.
  * GT oracle tile_n=131072 and nq=1024: bounds the oracle scan temp to
    ~0.5 GB.
  * search B=1024 staged + seg_rows=4M (25 segment pools): bounds the
    bin-pool outputs + pooled sort temps to ~1.2 GB. The default 1M
    segmentation at 100M would make a [B, 204800] pool (x2 arrays, plus
    sort copies) — several GB of temps.

Run: python examples/exp_r4_100m.py [--n 100000000]
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
    rng = np.random.default_rng(9000 + i)
    a = rng.integers(0, N_CENTERS, rows)
    return (cents[a]
            + 0.25 * rng.standard_normal((rows, D)).astype(np.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000_000)
    ap.add_argument("--chunk", type=int, default=1_000_000)
    ap.add_argument("--n-sub", type=int, default=48)
    ap.add_argument("--nq", type=int, default=1024)
    ap.add_argument("--seg-rows", type=int, default=4 * 1024 * 1024)
    ap.add_argument("--rrs", default="64,128,256")
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
    qrng = np.random.default_rng(555)
    c0 = make_chunk(cents, 0, args.chunk)
    q = (c0[qrng.integers(0, args.chunk, args.nq)]
         + 0.12 * qrng.standard_normal((args.nq, D))).astype(np.float32)
    qd = jax.device_put(jnp.asarray(q))
    jax.block_until_ready(qd)

    cfg = PQConfig(dim=D, n_sub=args.n_sub, n_codes=16, scan="pallas",
                   scan_precision="int8", refine="int8", rerank=16,
                   l_bins=1024, per_bin=2, seg_rows=args.seg_rows,
                   train_sample=131072)
    log(f"config: {cfg.bytes_per_vector} B/vec -> "
        f"{cfg.bytes_per_vector * args.n / 2**30:.2f} GB index at "
        f"n={args.n:,}")
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
        t0 = time.perf_counter()
        oracle = FlatIndex(FlatConfig(dim=D, precision="highest",
                                      tile_n=131072), capacity=args.chunk)
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
        if (i + 1) % 5 == 0 or i == n_chunks - 1:
            log(f"chunk {i + 1}/{n_chunks}: gen {t_gen:.0f}s up {t_up:.0f}s "
                f"add {t_add:.0f}s gt {t_gt:.0f}s")
    t_wall = time.perf_counter() - t_total0
    log(f"BUILD n={args.n:,}: wall {t_wall:.0f}s "
        f"({args.n / t_wall:,.0f} pts/s incl. GT pass; "
        f"upload-only {args.n / max(t_up, 1e-9):,.0f}; "
        f"ingest-only {args.n / max(t_add, 1e-9):,.0f} pts/s)")

    def timed_qps(fn, reps=2):
        best = 0.0
        for _ in range(2):
            outs = []
            t0 = time.perf_counter()
            for _ in range(reps):
                outs.append(fn(qd))
            jax.block_until_ready(outs)
            best = max(best, reps * args.nq / (time.perf_counter() - t0))
        return best

    for rr in tuple(int(s) for s in args.rrs.split(",")):
        try:
            fn = lambda qq, rr=rr: idx.search(qq, k, rerank=rr)
            ids = np.asarray(fn(qd)[1])
            r = recall_vs(ids, gi, k)
            qps = timed_qps(fn)
            log(f"RESULT pq-100m n={args.n:,} ns{args.n_sub} rr{rr}: "
                f"recall={r:.4f} qps={qps:,.0f}")
        except Exception as e:
            log(f"RESULT pq-100m rr{rr}: FAILED {type(e).__name__}: "
                f"{str(e)[:300]}")
    log("DONE")


if __name__ == "__main__":
    main()
