"""Round-4 PQ speed axis at 1M (after exp_r4_batch1 settled recall):
pb2 L1024 rr16 = 0.9594 @ 90.7k; the VERDICT QPS bar is 150k, so sweep the
kernel throughput knobs at the recall point:
  * scan_precision: default (bf16) vs int8 (2x MXU rate on v5e)
  * pallas_chunk {1024, 2048} x pallas_bq {512, 1024} (grid/pipeline
    efficiency vs VMEM pressure — Mosaic rejects what doesn't fit)
  * rr32 recall probe (is 0.96 the pool or the 4-bit quantizer?)
  * rr8 at int8 (the speed-leaning frontier point)
  * norefine int8 (pure-scan ceiling)

Run: python examples/exp_r4_pq2.py
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

    base = dict(dim=128, n_codes=16, scan="pallas", refine="int8",
                n_sub=32, per_bin=2, l_bins=1024)
    idx = PQFlatIndex(PQConfig(rerank=16, **base))
    idx.build(xd1)
    jax.block_until_ready(idx.state.codes)

    import dataclasses

    def run(tag, cfg, rr=None):
        try:
            idx.cfg = cfg            # same state, new scan program
            fn = (lambda qq: idx.search(qq, k)) if rr is None else \
                (lambda qq: idx.search(qq, k, rerank=rr))
            ids = batched_ids(fn, q1)
            r = recall_vs(ids, gt1, k)
            qps = timed_qps(fn, q1)
            log(f"RESULT pq2 {tag}: recall={r:.4f} qps={qps:,.0f}")
        except Exception as e:
            log(f"RESULT pq2 {tag}: FAILED {e!r}")

    c0 = PQConfig(rerank=16, **base)
    for prec in ("default", "int8"):
        for chunk in (1024, 2048):
            for bq in (512, 1024):
                run(f"rr16 {prec} ch{chunk} bq{bq}",
                    dataclasses.replace(c0, scan_precision=prec,
                                        pallas_chunk=chunk, pallas_bq=bq))
    # recall probes on the best-guess speed config
    fast = dataclasses.replace(c0, scan_precision="int8")
    run("rr32 int8", fast, rr=32)
    run("rr8 int8", fast, rr=8)
    run("rr64 int8 (pool ceiling)", fast, rr=64)
    # norefine pure-scan ceilings
    nr = PQConfig(dim=128, n_codes=16, scan="pallas", refine="none",
                  n_sub=32, per_bin=2, l_bins=1024)
    idx2 = PQFlatIndex(nr)
    idx2.build(xd1)
    jax.block_until_ready(idx2.state.codes)
    for prec in ("default", "int8"):
        cfgn = dataclasses.replace(nr, scan_precision=prec)
        idx2.cfg = cfgn
        fn = lambda qq: idx2.search(qq, k)
        ids = batched_ids(fn, q1)
        r = recall_vs(ids, gt1, k)
        qps = timed_qps(fn, q1)
        log(f"RESULT pq2 norefine {prec}: recall={r:.4f} qps={qps:,.0f}")
    log("DONE")


if __name__ == "__main__":
    main()
