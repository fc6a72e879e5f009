"""Round-4 PQ 1M: what ACTUALLY lifts the 0.96 plateau — subspace count.

exp_r4_pq4.py measured the plateau is not the bin pool (seg granularity
recall-neutral, rr-depth-neutral at every granularity): it is the
quantizer/ADC ranking itself. The remaining levers are code bytes/row:
  * n_sub=64 (2 dims/sub -> 1... wait 128d/64 = 2 dims/sub; 32 B/row
    packed) — 2x ADC information, 2x scan FLOPs (sc=1024).
  * scan_precision="high" at ns32 (hi/lo LUT split — tests whether bf16
    LUT rounding contributes at all vs the 4-bit code error).

Sweep (1M x 128d clustered, int8 refine, pb2 L1024 global pool):
  ns64 int8 rr16 (bq 512 then 256 on VMEM rejection), ns64 rr32,
  ns32 high rr16 (reference point ns32 int8 = 0.9594 @ 104k).

Run: python examples/exp_r4_pq5.py
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

    def sweep(ns, runs):
        base = PQConfig(dim=128, n_sub=ns, n_codes=16, scan="pallas",
                        refine="int8", per_bin=2, l_bins=1024,
                        scan_precision="int8", rerank=16, seg_rows=0)
        idx = PQFlatIndex(base)
        tb = time.perf_counter()
        idx.build(xd1)
        jax.block_until_ready(idx.state.codes)
        log(f"ns{ns} build {time.perf_counter() - tb:.2f}s")
        for tag, cfgkw, rr in runs:
            try:
                idx.cfg = dataclasses.replace(base, **cfgkw)
                fn = lambda qq, rr=rr: idx.search(qq, k, rerank=rr)
                ids = batched_ids(fn, q1)
                r = recall_vs(ids, gt1, k)
                qps = timed_qps(fn, q1)
                log(f"RESULT pq5 ns{ns} {tag}: recall={r:.4f} qps={qps:,.0f}")
            except Exception as e:
                log(f"RESULT pq5 ns{ns} {tag}: FAILED {e!r}")

    sweep(64, [
        ("int8 rr16 bq512", dict(), 16),
        ("int8 rr16 bq256", dict(pallas_bq=256), 16),
        ("int8 rr32 bq256", dict(pallas_bq=256), 32),
    ])
    sweep(32, [
        ("high rr16", dict(scan_precision="high"), 16),
    ])
    log("DONE")


if __name__ == "__main__":
    main()
