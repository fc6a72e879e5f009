"""Round-4 PQ 1M, stage 2 of the ns16 frontier: the SHALLOW rerank knee.

exp_r4_pq9.py measured ns16 at rr16/32/64 (0.9987 @ 124.8k at rr16 —
deeper rerank only pays gather cost). This stage walks rerank DOWN from
16 to find the pool-depth cliff: the refine gather is ~30% of query time
at rr16 (2048 queries x 160 rows x ~14 ns/row), so every step of rr
shaved is real QPS — until the k*rr pool no longer contains the true
neighbors and recall falls off the cliff.

Measured (PERF.md "n_sub=16 + shallow rerank is the measured 1M
frontier"): rr12 = 0.9984 @ 135.0k (the shipping point), rr8 = 0.8944 @
150.4k (the cliff), rr6 = 0.7463 @ 159.2k. The knee sits between rr8
and rr12 because the 4-bit ADC rank at ns16 places true top-10 rows
almost always within the top ~120 surrogate scores but NOT reliably
within the top 80 on 10k-cluster data.

Run: python examples/exp_r4_pq9b.py
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
    import dataclasses

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

    base = PQConfig(dim=128, n_sub=16, n_codes=16, scan="pallas",
                    refine="int16", per_bin=2, l_bins=1024,
                    scan_precision="int8", rerank=16, seg_rows=0,
                    pallas_chunk=1024, pallas_bq=512)
    idx = PQFlatIndex(base)
    tb = time.perf_counter()
    idx.build(xd1)
    jax.block_until_ready(idx.state.codes)
    log(f"ns16 build {time.perf_counter() - tb:.2f}s")

    # walk the pool depth down from the pq9 baseline; same tiling throughout
    for rr in (16, 12, 10, 8, 6):
        try:
            idx.cfg = dataclasses.replace(base, rerank=rr)
            fn = lambda qq: idx.search(qq, k)
            ids = batched_ids(fn, q1)
            r = recall_vs(ids, gt1, k)
            qps = timed_qps(fn, q1)
            log(f"RESULT pq9b ns16 rr{rr}: recall={r:.4f} qps={qps:,.0f}")
        except Exception as e:
            log(f"RESULT pq9b ns16 rr{rr}: FAILED {type(e).__name__}: "
                f"{str(e)[:160]}")
    log("DONE")


if __name__ == "__main__":
    main()
