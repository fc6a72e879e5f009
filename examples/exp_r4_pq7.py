"""Round-4 PQ 1M: int16 refine store — f32-grade rescore at bf16 memory.

exp_r4_pq6 measured the refine store dtype IS the recall ceiling at 1M
(int8 0.9594, bf16 0.9876, f32 0.9991 — same scan). int16 per-vector
symmetric quantization carries ~2^-15 relative error (vs bf16's 2^-8
mantissa step), so it should read ~f32 recall at 2 bytes/dim + 4.

Sweep (1M x 128d clustered, ns32 int8-LUT pallas scan, pb2 L1024,
global pool): refine=int16 at rr16/rr32, vs the pq6 reference points.

Run: python examples/exp_r4_pq7.py
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

    cfg = PQConfig(dim=128, n_sub=32, n_codes=16, scan="pallas",
                   refine="int16", per_bin=2, l_bins=1024,
                   scan_precision="int8", rerank=16, seg_rows=0)
    idx = PQFlatIndex(cfg)
    tb = time.perf_counter()
    idx.build(xd1)
    jax.block_until_ready(idx.state.codes)
    log(f"refine=int16 build {time.perf_counter() - tb:.2f}s")
    for rr in (16, 32):
        try:
            fn = lambda qq, rr=rr: idx.search(qq, k, rerank=rr)
            ids = batched_ids(fn, q1)
            r = recall_vs(ids, gt1, k)
            qps = timed_qps(fn, q1)
            log(f"RESULT pq7 refine=int16 rr{rr}: "
                f"recall={r:.4f} qps={qps:,.0f}")
        except Exception as e:
            log(f"RESULT pq7 refine=int16 rr{rr}: FAILED {e!r}")
    log("DONE")


if __name__ == "__main__":
    main()
