"""Round-5 IVF-PQ 1M wall, part 4: the bin-pool width is the wall.

Parts 2-3 eliminated probing (coverage(p=16) = 0.9999 exact), assignment
precision (f32 identical), probe-scoring precision (HIGHEST identical) and
rerank depth (rr256 == rr32 == 0.9915 — the POOL is missing the neighbors).
What remains is the per-cluster bin fold: l_bins=128 x per_bin=2 keeps 256
ADC-ranked rows per (query, cluster), and the competition inside a cluster
is exactly the rows CLOSEST to the query — 4-bit ADC noise misranks near
ties, so true neighbors lose their bin slots to same-cluster near rows.
(The flat kernel's bins mix the whole corpus: competitors are far, which is
why it holds 0.9984 with ~4x more rows per bin.)

l_bins is search-time-only (the fold happens in the kernel, the packed
blocks are independent of it) — sweep it on ONE build via config clone.

Run: python examples/exp_r5_ivfpq4.py
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

    from exp_r4_batch1 import batched_ids, corpus_1m, gt_1m, recall_vs, \
        timed_qps
    from zvdb_tpu import IVFPQConfig, IVFPQIndex

    t0 = time.perf_counter()
    jnp.zeros(()).block_until_ready()
    log(f"device init {time.perf_counter() - t0:.1f}s "
        f"backend={jax.default_backend()}")
    k = 10
    x1, q1, fp = corpus_1m()
    gt1 = gt_1m(x1, q1, fp)
    xd1 = jax.device_put(jnp.asarray(x1))
    jax.block_until_ready(xd1)

    base = IVFPQConfig(dim=128, n_sub=16, refine="int16")
    idx = IVFPQIndex(base)
    tb = time.perf_counter()
    idx.build(xd1)
    jax.block_until_ready(idx.state.codes_blocks)
    log(f"build {time.perf_counter() - tb:.1f}s "
        f"C={idx.state.centroids.shape[0]}")

    for lb, np_, rr in ((128, 16, 12), (256, 16, 12), (512, 16, 12),
                        (512, 16, 32), (1024, 16, 12), (512, 32, 12),
                        (256, 8, 12)):
        idx.cfg = dataclasses.replace(base, l_bins=lb,
                                      chunk=max(base.chunk, lb))
        fn = lambda qq: idx.search(qq, k, nprobe=np_, rerank=rr)
        ids = batched_ids(fn, q1)
        r = recall_vs(ids, gt1, k)
        qps = timed_qps(fn, q1)
        log(f"RESULT ivfpq4-1m lb{lb} np{np_} rr{rr}: "
            f"recall={r:.4f} qps={qps:,.0f}")
    log("DONE")


if __name__ == "__main__":
    main()
