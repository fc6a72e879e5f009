"""Round-4 PQ 1M: QPS headroom after the LUT-quantize hoist.

The int8 ADC path used to re-quantize the [bq, S*16] query LUT on every
grid step and build the one-hot in bf16 first; both are now hoisted
(ops/pallas_pq.py). This sweep re-measures the shipping winner and probes
kernel tiling for more QPS at the same recall:
  * shipped: ns32 int8 L1024 pb2 rr16 int16-refine (reference: pre-hoist
    115.0k @ 0.9990)
  * chunk 2048 / 4096 (fewer grid steps, fatter matmul)
  * l_bins=512 pb2 (half the fold state; rr16 pool 5120 slots still >>
    k*rr=160)
  * bq=1024 at chunk 512 (the old 16.03 MB VMEM rejection — the one-hot
    is now int8, half the bytes)

Run: python examples/exp_r4_pq8.py
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

    base = PQConfig(dim=128, n_sub=32, n_codes=16, scan="pallas",
                    refine="int16", per_bin=2, l_bins=1024,
                    scan_precision="int8", rerank=16, seg_rows=0)
    idx = PQFlatIndex(base)
    tb = time.perf_counter()
    idx.build(xd1)
    jax.block_until_ready(idx.state.codes)
    log(f"build {time.perf_counter() - tb:.2f}s")

    runs = [
        ("shipped c1024 bq512 L1024", dict()),
        ("c2048 bq512 L1024", dict(pallas_chunk=2048)),
        ("c4096 bq512 L1024", dict(pallas_chunk=4096)),
        ("c2048 bq512 L512", dict(pallas_chunk=2048, l_bins=512)),
        ("c1024 bq512 L512", dict(l_bins=512)),
        ("c512 bq1024 L512", dict(pallas_chunk=512, pallas_bq=1024,
                                  l_bins=512)),
        ("c1024 bq1024 L512", dict(pallas_bq=1024, l_bins=512)),
        ("c1024 bq1024 L1024", dict(pallas_bq=1024)),
        ("c1024 bq512 L2048 pb1", dict(l_bins=2048, per_bin=1)),
        ("c2048 bq1024 L512", dict(pallas_chunk=2048, pallas_bq=1024,
                                   l_bins=512)),
    ]
    for tag, kw in runs:
        try:
            idx.cfg = dataclasses.replace(base, **kw)
            fn = lambda qq: idx.search(qq, k)
            ids = batched_ids(fn, q1)
            r = recall_vs(ids, gt1, k)
            qps = timed_qps(fn, q1)
            log(f"RESULT pq8 {tag}: recall={r:.4f} qps={qps:,.0f}")
        except Exception as e:
            log(f"RESULT pq8 {tag}: FAILED {type(e).__name__}: "
                f"{str(e)[:200]}")
    log("DONE")


if __name__ == "__main__":
    main()
