"""Round-4 PQ 1M follow-up: is the 0.9594 ceiling really the BIN POOL?

The 30M A/B (exp_r4_scale.py, PERF.md "Round-4 single-chip scale") showed
segment pools are recall-neutral when rerank depth is far below pool
capacity — eviction only bites when a true neighbor loses a bin fight to
per_bin ADC-better rows. At 1M with the global pool (pb2, L=1024) each bin
sees ~977 rows; seg_rows=262144 cuts that to ~256 rows/bin and widens the
pool to 8192 slots (4 segments x pb2 x 1024). If 0.9594 @ rr16 is
pool-bound, segmenting should lift recall at the same rerank depth; if it
is ADC-selection-bound, only deeper rr over the wider pool will.

Sweep (1M x 128d clustered, ns32 4-bit, int8 scan + int8 refine):
  seg_rows {0, 262144, 131072} x rr {16, 32, 64}   (+ QPS at each point)

Run: python examples/exp_r4_pq4.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    from zvdb_tpu.utils.cache import setup_compile_cache
    setup_compile_cache("tpu")
    import jax.numpy as jnp

    from exp_r4_batch1 import corpus_1m, gt_1m, recall_vs, timed_qps, \
        batched_ids
    from zvdb_tpu import PQConfig, PQFlatIndex

    t0 = time.perf_counter()
    jnp.zeros(()).block_until_ready()
    log(f"device init {time.perf_counter() - t0:.1f}s "
        f"backend={jax.default_backend()}")

    k = 10
    x1, q1, fp = corpus_1m()
    gt1 = gt_1m(x1, q1, fp)
    xd1 = jax.device_put(x1)
    jax.block_until_ready(xd1)

    import dataclasses

    base = PQConfig(dim=128, n_codes=16, scan="pallas", refine="int8",
                    n_sub=32, per_bin=2, l_bins=1024,
                    scan_precision="int8", rerank=16)
    idx = PQFlatIndex(base)
    idx.build(xd1)
    jax.block_until_ready(idx.state.codes)

    for seg in (0, 262144, 131072):
        cfg = dataclasses.replace(base, seg_rows=seg)
        idx.cfg = cfg
        for rr in (16, 32, 64):
            try:
                fn = lambda qq, rr=rr: idx.search(qq, k, rerank=rr)
                ids = batched_ids(fn, q1)
                r = recall_vs(ids, gt1, k)
                qps = timed_qps(fn, q1)
                log(f"RESULT pq4 seg{seg} rr{rr}: "
                    f"recall={r:.4f} qps={qps:,.0f}")
            except Exception as e:
                log(f"RESULT pq4 seg{seg} rr{rr}: FAILED {e!r}")
    log("DONE")


if __name__ == "__main__":
    main()
