"""Round-4 PQ segmented pool at 1M: does a wider (per-segment) bin pool buy
recall at the winner's speed point?

exp_r4_pq2 settled the speed axis (int8 LUT matmul, ch1024 bq512 -> 0.9594 @
104k) and showed 0.9594 is the BIN-POOL ceiling (rr64 == rr16). seg_rows
(the 30M fix) also widens the pool at 1M: seg_rows=262144 -> 4 segments ->
8192 candidates (256 rows/bin) for one extra sort pass. Sweep seg_rows x
rerank at the winner config; if recall rises materially at ~equal QPS, the
bench pq_1m config should ship it.

Run: python examples/exp_r4_pq3.py
"""
import dataclasses
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

    base = PQConfig(dim=128, n_sub=32, n_codes=16, scan="pallas",
                    scan_precision="int8", refine="int8", rerank=16,
                    l_bins=1024, per_bin=2)
    idx = PQFlatIndex(base)
    idx.build(xd1)
    jax.block_until_ready(idx.state.codes)

    def run(tag, cfg, rr=None):
        try:
            idx.cfg = cfg
            fn = (lambda qq: idx.search(qq, k)) if rr is None else \
                (lambda qq: idx.search(qq, k, rerank=rr))
            ids = batched_ids(fn, q1)
            r = recall_vs(ids, gt1, k)
            qps = timed_qps(fn, q1)
            log(f"RESULT pq3 {tag}: recall={r:.4f} qps={qps:,.0f}")
        except Exception as e:
            log(f"RESULT pq3 {tag}: FAILED {e!r}")

    for seg in (0, 262144, 131072):
        cfg = dataclasses.replace(base, seg_rows=seg)
        run(f"seg{seg} rr16", cfg)
    # deeper rerank into the wider pool (does the pool now out-run rr16?)
    cfg = dataclasses.replace(base, seg_rows=131072)
    run("seg131072 rr32", cfg, rr=32)
    run("seg131072 rr8", cfg, rr=8)
    log("DONE")


if __name__ == "__main__":
    main()
