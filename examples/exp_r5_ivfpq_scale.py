"""Round-5 IVF-PQ at 30M on one chip: make the scale tier sublinear.

VERDICT r4 item 3's done-bar: >=3x QPS over the flat PQ scan's 2,283 QPS at
30M at <=1pt recall (target >=10k @ >=0.99). Same corpus protocol as
exp_r4_scale.py (DEEP-like 96d mixture, self-contained per-chunk rng
streams, exact chunked GT oracle) so the rows are directly comparable with
the round-4 flat-PQ 30M measurements (rr128 int16 = 0.9999 @ 2,283).

IVFPQConfig(expected_rows=N) pre-sizes cluster blocks + refine store from
chunk 0, so add() chunks append O(batch) with no overflow repacks; the
k-means/codebook geometry trains on the first chunk (stationary mixture).

Run: python examples/exp_r5_ivfpq_scale.py [--n 30000000] [--chunk 2000000]
         [--n-sub 48] [--refine int16]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from exp_r4_scale import N_CENTERS, D, centers, make_chunk, recall_vs  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=30_000_000)
    ap.add_argument("--chunk", type=int, default=2_000_000)
    ap.add_argument("--n-sub", type=int, default=48)
    ap.add_argument("--refine", default="int16")
    ap.add_argument("--l-bins", type=int, default=256,
                    help="per-cluster bin-pool width lever: the measured 1M "
                         "recall wall was the per-cluster bin fold "
                         "(exp_r5_ivfpq4 — lb128 0.9912, lb256 0.9993)")
    ap.add_argument("--nq", type=int, default=2048)
    ap.add_argument("--sweep", default="16:16,16:32,32:16,32:32,64:32",
                    help="comma-separated nprobe:rerank points")
    args = ap.parse_args()
    assert args.n % args.chunk == 0

    import jax
    from zvdb_tpu.utils.cache import setup_compile_cache
    setup_compile_cache("tpu")
    import jax.numpy as jnp

    from zvdb_tpu import FlatConfig, FlatIndex, IVFPQConfig, IVFPQIndex

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

    cfg = IVFPQConfig(dim=D, n_sub=args.n_sub, refine=args.refine,
                      nprobe=32, rerank=32, train_sample=131072,
                      l_bins=args.l_bins, chunk=max(512, args.l_bins),
                      expected_rows=args.n)
    log(f"config: {cfg.bytes_per_vector} B/vec -> "
        f"{cfg.bytes_per_vector * args.n / 2**30:.2f} GB at n={args.n:,}")
    idx = IVFPQIndex(cfg)

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
        if i == 0:
            idx.build(xd)
        else:
            idx.add(xd)
            idx.flush()
        jax.block_until_ready(idx.state.codes_blocks)
        t_add += time.perf_counter() - t0
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
    st = idx.state
    log(f"BUILD n={args.n:,}: wall {t_wall:.0f}s "
        f"({args.n / t_wall:,.0f} pts/s incl. GT pass; "
        f"ingest-only {args.n / max(t_add, 1e-9):,.0f} pts/s) "
        f"C={st.centroids.shape[0]} cap={st.codes_blocks.shape[2]}")

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
    for pt in args.sweep.split(","):
        np_, rr = (int(v) for v in pt.split(":"))
        try:
            fn = lambda qq, np_=np_, rr=rr: idx.search(qq, k, nprobe=np_,
                                                       rerank=rr)
            ids = np.asarray(fn(qd)[1])
            r = recall_vs(ids, gt, k)
            qps = timed_qps(fn)
            log(f"RESULT ivfpq-scale n={args.n:,} ns{args.n_sub} "
                f"np{np_} rr{rr}: recall={r:.4f} qps={qps:,.0f}")
        except Exception as e:
            log(f"RESULT ivfpq-scale np{np_} rr{rr}: FAILED {e!r}")
    log("DONE")


if __name__ == "__main__":
    main()
