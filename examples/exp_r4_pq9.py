"""Round-4 PQ 1M: n_sub=16 — halve the ADC matmul width, let the exact
int16 rerank repair the coarser scan ranking.

The 4-bit ns32 scan does 2*N*512 FLOPs/query — 4x the flat scan's width
(128), which is why PQ reads 115k QPS where flat reads 208k despite
32x less corpus traffic. ns16 (dsub=8, 8 B/row packed codes) halves the
LUT matmul AND the one-hot VPU build; the scan rank only has to land
true neighbors in the top k*rr pool for the int16 rescore to fix the
order. Question: how much rerank depth does the coarser code cost, and
what's the net QPS at matched recall?

Sweep (1M x 128d clustered, int16 refine, int8 LUT, pb2, global pool):
  ns16: rr16/32/64 at (c1024 bq512 L1024) and the pq8 winner tiling
        (c512 bq1024 L512), plus bq1024 L1024 c512 (VMEM probe: ns16
        halves rep/dots so the 16 MB scratch may now fit).
  ns32 reference re-read: rr16 (0.9990 @ 115k in pq7/pq8).

Run: python examples/exp_r4_pq9.py
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
                    scan_precision="int8", rerank=16, seg_rows=0)
    idx = PQFlatIndex(base)
    tb = time.perf_counter()
    idx.build(xd1)
    jax.block_until_ready(idx.state.codes)
    log(f"ns16 build {time.perf_counter() - tb:.2f}s")

    runs = [
        ("rr16 c1024 bq512 L1024", dict()),
        ("rr32 c1024 bq512 L1024", dict(rerank=32)),
        ("rr64 c1024 bq512 L1024", dict(rerank=64)),
        ("rr32 c512 bq1024 L512", dict(rerank=32, pallas_chunk=512,
                                       pallas_bq=1024, l_bins=512)),
        ("rr32 c512 bq1024 L1024", dict(rerank=32, pallas_chunk=512,
                                        pallas_bq=1024)),
        ("rr64 c512 bq1024 L1024", dict(rerank=64, pallas_chunk=512,
                                        pallas_bq=1024)),
    ]
    for tag, kw in runs:
        try:
            idx.cfg = dataclasses.replace(base, **kw)
            fn = lambda qq: idx.search(qq, k)
            ids = batched_ids(fn, q1)
            r = recall_vs(ids, gt1, k)
            qps = timed_qps(fn, q1)
            log(f"RESULT pq9 ns16 {tag}: recall={r:.4f} qps={qps:,.0f}")
        except Exception as e:
            log(f"RESULT pq9 ns16 {tag}: FAILED {type(e).__name__}: "
                f"{str(e)[:160]}")
    log("DONE")


if __name__ == "__main__":
    main()
