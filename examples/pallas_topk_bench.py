"""Compiled-on-TPU validation + microbench of the Pallas bin-fold scan
(ops/pallas_topk.py) against the XLA approx_min_k flat path.

Sweeps (l_bins, chunk, bq_tile, precision) at 100k and 1M corpus scale. The
kernel's edge over XLA grows with N: the XLA scan materializes [B, tile]
score blocks to HBM between matmul and selection, while the kernel keeps
scores in VMEM.

Run on the real chip: python examples/pallas_topk_bench.py [--n 1000000]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from zvdb_tpu.utils.cache import setup_compile_cache
setup_compile_cache("tpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--nq", type=int, default=10_000)
    args = ap.parse_args()

    print("backend", jax.default_backend(), flush=True)
    _ = float((jnp.ones((8, 128)) @ jnp.ones((128, 8))).sum())

    from zvdb_tpu import FlatConfig, FlatIndex
    from zvdb_tpu.bench.harness import recall_at_k
    from zvdb_tpu.io.datasets import synthetic_clustered
    from zvdb_tpu.ops import distance as D
    from zvdb_tpu.ops.pallas_topk import flat_scan_topk

    n, d, nq, k = args.n, 128, args.nq, 10
    x = synthetic_clustered(n, d, n_clusters=max(100, n // 100), seed=0)
    rng = np.random.default_rng(9)
    q = (x[rng.integers(0, n, nq)]
         + 0.05 * rng.standard_normal((nq, d))).astype(np.float32)

    flat = FlatIndex(FlatConfig(dim=d, precision="high", recall_target=0.97,
                                tile_n=min(500_000, n)), capacity=n)
    flat.add(x)
    jax.block_until_ready(flat.state)
    gs, gt = [], None
    for lo in range(0, nq, 2048):
        gs.append(np.asarray(flat.search(q[lo:lo + 2048], k)[1]))
    gt = np.concatenate(gs)

    staged = [jax.device_put(jnp.asarray(q[lo:lo + 5000]))
              for lo in range(0, nq, 5000)]
    jax.block_until_ready(staged)

    def timed(fn, reps=6):
        outs = [fn(qb) for qb in staged]
        jax.block_until_ready(outs)
        t0 = time.perf_counter()
        outs = []
        for _ in range(reps):
            for qb in staged:
                outs.append(fn(qb))
        jax.block_until_ready(outs)
        return reps * nq / (time.perf_counter() - t0)

    st = flat.state
    for L, chunk, bq, prec in [
        (256, 2048, 512, "high"), (512, 2048, 512, "high"),
        (1024, 4096, 256, "high"), (1024, 8192, 256, "high"),
        (512, 4096, 512, "high"), (1024, 4096, 256, "default"),
    ]:
        try:
            def run(qb, L=L, chunk=chunk, bq=bq, prec=prec):
                qs = D.preprocess_queries(qb, "l2")
                return flat_scan_topk(qs, st.vectors, st.norms, k, l_bins=L,
                                      bq_tile=bq, chunk=chunk, precision=prec)
            ids = np.concatenate([np.asarray(run(qb)[1]) for qb in staged])
            r = recall_at_k(ids, gt, k)
            qps = timed(run)
            print(f"pallas L={L} chunk={chunk} bq={bq} {prec}: "
                  f"recall={r:.4f} qps={qps:,.0f}", flush=True)
        except Exception as e:
            print(f"pallas L={L} chunk={chunk} bq={bq} {prec}: FAILED {e!r}",
                  flush=True)

    qps = timed(lambda qb: flat.search(qb, k, approx=True))
    ids = np.concatenate(
        [np.asarray(flat.search(qb, k, approx=True)[1]) for qb in staged])
    print(f"xla approx_min_k: recall={recall_at_k(ids, gt, k):.4f} "
          f"qps={qps:,.0f}", flush=True)


if __name__ == "__main__":
    main()
