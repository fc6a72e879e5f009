"""Round-5 IVF-PQ 1M wall, part 3: probe-scoring precision + pool ceiling.

exp_r5_ivfpq2 measured coverage(p=16) = 0.9999 under EXACT f64 host probe
ranking while recall walls at 0.9912 — and bf16 vs f32 build ASSIGNMENT
moved nothing. The remaining suspect ranked first: the SEARCH-time probe
matmul `D.pairwise_scores(qp, centroids, ...)` runs at TPU-default bf16
(ivfpq.py:269 passes no precision — the same class of bug as CLAUDE.md's
"bf16 destroys recall on clustered data"; coverage was computed with exact
host math, so it never saw the bf16 ranking the engine actually uses).

A/B here: patch D.pairwise_scores to force HIGHEST when no explicit
precision is passed, rebuild nothing (same index), re-measure. Also
measures the pool ceiling (rr256: recall at exact-rescore depth ~ P(true
neighbor reached the candidate pool at all)) under both precisions.

Run: python examples/exp_r5_ivfpq3.py
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

    from exp_r4_batch1 import batched_ids, corpus_1m, gt_1m, recall_vs, \
        timed_qps
    from zvdb_tpu import IVFPQConfig, IVFPQIndex
    from zvdb_tpu.ops import distance as D

    t0 = time.perf_counter()
    jnp.zeros(()).block_until_ready()
    log(f"device init {time.perf_counter() - t0:.1f}s "
        f"backend={jax.default_backend()}")
    k = 10
    x1, q1, fp = corpus_1m()
    gt1 = gt_1m(x1, q1, fp)
    xd1 = jax.device_put(jnp.asarray(x1))
    jax.block_until_ready(xd1)

    idx = IVFPQIndex(IVFPQConfig(dim=128, n_sub=16, refine="int16"))
    tb = time.perf_counter()
    idx.build(xd1)
    jax.block_until_ready(idx.state.codes_blocks)
    log(f"build {time.perf_counter() - tb:.1f}s "
        f"C={idx.state.centroids.shape[0]}")

    orig = D.pairwise_scores

    def hi_pairwise(q, x, xn, metric, precision=None, x_scales=None):
        if precision is None:
            precision = jax.lax.Precision.HIGHEST
        return orig(q, x, xn, metric, precision=precision, x_scales=x_scales)

    for tag, patch in (("bf16-probe", False), ("hi-probe", True)):
        D.pairwise_scores = hi_pairwise if patch else orig
        # the module-level jitted search caches on (shapes, statics) — the
        # patched scorer is only seen on a fresh trace
        jax.clear_caches()
        try:
            for np_, rr in ((16, 12), (16, 32), (16, 256), (32, 12)):
                fn = lambda qq: idx.search(qq, k, nprobe=np_, rerank=rr)
                ids = batched_ids(fn, q1)
                r = recall_vs(ids, gt1, k)
                qps = timed_qps(fn, q1)
                log(f"RESULT ivfpq3-1m {tag} np{np_} rr{rr}: "
                    f"recall={r:.4f} qps={qps:,.0f}")
        finally:
            D.pairwise_scores = orig
    log("DONE")


if __name__ == "__main__":
    main()
