"""Round-4 PQ 1M: the 0.9594 wall follows the ENGINE, not the scan.

exp_r4_pq4/pq5 measured recall pinned at 0.9594 (4 decimals!) across
rerank depth, bin granularity, n_sub 32->64, and LUT precision — so the
binding stage must be downstream of the scan: the int8 REFINE rerank.
int8 rows carry ~0.2-0.4% relative error; on clustered data the rank-10
vs rank-11 squared-L2 gap is often smaller, so the exact-rescore flips
near-ties (the flat engine reranks against f32 rows and reads 0.9989 on
this same corpus).

Test: same scan config (ns32, int8 LUT, pb2 L1024 global pool, rr16),
refine dtype {int8 (reference point), bfloat16, float32}.
Memory: int8 152 B/row, bf16 276 B/row, f32 532 B/row (vs flat 512).

Run: python examples/exp_r4_pq6.py
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

    for refine in ("int8", "bfloat16", "float32"):
        cfg = PQConfig(dim=128, n_sub=32, n_codes=16, scan="pallas",
                       refine=refine, per_bin=2, l_bins=1024,
                       scan_precision="int8", rerank=16, seg_rows=0)
        idx = PQFlatIndex(cfg)
        tb = time.perf_counter()
        idx.build(xd1)
        jax.block_until_ready(idx.state.codes)
        log(f"refine={refine} build {time.perf_counter() - tb:.2f}s")
        for rr in (16, 32):
            try:
                fn = lambda qq, rr=rr: idx.search(qq, k, rerank=rr)
                ids = batched_ids(fn, q1)
                r = recall_vs(ids, gt1, k)
                qps = timed_qps(fn, q1)
                log(f"RESULT pq6 refine={refine} rr{rr}: "
                    f"recall={r:.4f} qps={qps:,.0f}")
            except Exception as e:
                log(f"RESULT pq6 refine={refine} rr{rr}: FAILED {e!r}")
        del idx
    log("DONE")


if __name__ == "__main__":
    main()
