"""Round-3 TPU experiment batch #1: graph-build phase budget (VERDICT #1).

Measures, in ONE process (device init ~100-150 s is paid once):
  1. relay upload bandwidth: single-stream vs chunked-concurrent device_put
  2. warm cagra graph build at 100k x 128d with ZVDB_BUILD_TRACE phases
     (includes the new one-shot bulk reverse pass)
  3. old chunked reverse vs bulk reverse, timed head-to-head
  4. block-kNN scoring variants: exact top-k vs approx, f32x3 vs bf16 matmul
  5. self-hit sanity of the built graph

Prints one JSON line per experiment on stdout.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("ZVDB_BUILD_TRACE", "1")

import jax
import jax.numpy as jnp
import numpy as np

from zvdb_tpu.utils.cache import setup_compile_cache
setup_compile_cache("tpu")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    from zvdb_tpu import CagraConfig, CagraIndex
    from zvdb_tpu.io.datasets import load_dataset

    n, d = 100_000, 128
    x, _, _, metric = load_dataset("sift1m", max_rows=n)
    x = np.ascontiguousarray(x[:n], np.float32)

    t0 = time.time()
    _ = float((jnp.ones((8, 128)) @ jnp.ones((128, 8))).sum())
    log(f"device init {time.time()-t0:.1f}s")

    # ---- 1. upload bandwidth --------------------------------------------
    mb = x.nbytes / 1e6
    for label, chunks in (("single", 1), ("c2", 2), ("c4", 4), ("c8", 8),
                          ("c16", 16)):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            if chunks == 1:
                dev = jnp.asarray(x)
                jax.block_until_ready(dev)
            else:
                per = -(-n // chunks)
                parts = [jax.device_put(x[i * per:(i + 1) * per])
                         for i in range(chunks)]
                jax.block_until_ready(parts)
            best = min(best, time.perf_counter() - t0)
            if chunks == 1:
                del dev
            else:
                del parts
        emit(exp="upload", mode=label, mb=round(mb, 1), s=round(best, 3),
             mbps=round(mb / best, 1))

    # ---- 2+5. warm traced build + self-hit ------------------------------
    cfg = CagraConfig(dim=d, degree=32, metric=metric)
    warm = CagraIndex(cfg)
    warm.build(x)          # compiles
    jax.block_until_ready(warm.state)
    del warm
    best = float("inf")
    for _ in range(2):
        idx = CagraIndex(cfg)
        t0 = time.perf_counter()
        idx.build(x)
        jax.block_until_ready(idx.state)
        best = min(best, time.perf_counter() - t0)
    emit(exp="cagra_build_warm", s=round(best, 3), pps=round(n / best, 1))
    ids = np.asarray(idx.search(x[:2048], 1, ef_search=12)[1])
    emit(exp="self_hit", ef=12, hit=round(float(
        (ids[:, 0] == np.arange(2048)).mean()), 4))

    # ---- 3. reverse pass head-to-head -----------------------------------
    import functools

    from zvdb_tpu.index.build import _reverse_pass, _reverse_pass_bulk_jit

    st = idx.state
    nbrs0, dists0 = st.nbrs, st.dists
    deg = cfg.degree

    def run_bulk():
        nb = jnp.array(nbrs0)      # copies (bulk donates)
        dd = jnp.array(dists0)
        t0 = time.perf_counter()
        nb, dd = _reverse_pass_bulk_jit(nb, dd, n_rows=n, degree=deg)
        jax.block_until_ready(nb)
        return time.perf_counter() - t0

    rev_fn = jax.jit(functools.partial(_reverse_pass, degree=deg))

    def run_chunked():
        nb, dd = nbrs0, dists0
        t0 = time.perf_counter()
        rc = min(131072, n)
        for lo in range(0, n, rc):
            lo = min(lo, n - rc)
            rows = jnp.arange(lo, lo + rc, dtype=jnp.int32)
            fwd = jax.lax.dynamic_slice(nb, (lo, 0), (rc, deg))
            fwd_d = jax.lax.dynamic_slice(dd, (lo, 0), (rc, deg))
            nb, dd = rev_fn(nb, dd, rows, fwd, fwd_d)
        jax.block_until_ready(nb)
        return time.perf_counter() - t0

    for name, fn in (("bulk", run_bulk), ("chunked", run_chunked)):
        fn()  # compile
        emit(exp="reverse", mode=name, s=round(min(fn(), fn()), 4))

    # ---- 4. block-kNN variants ------------------------------------------
    from zvdb_tpu.index.knn_graph import (
        _assign_spill, _block_knn_scatter, _kmeans_device, _pack_blocks,
    )
    from zvdb_tpu.ops import distance as D

    xj = jnp.asarray(x)
    xn = D.sq_norms(xj)
    with jax.default_matmul_precision("high"):
        cent = _kmeans_device(xj, 195, 3, jax.random.PRNGKey(0))
        assign, _s0 = _assign_spill(xj, xn, cent, D.sq_norms(cent), 2, "l2")
    assign_np = np.asarray(assign)
    import math
    bcap = max(8, int(math.ceil(1.6 * 2 * n / 195 / 8.0)) * 8)
    block_pts, block_occ, _ = _pack_blocks(assign_np, 195, bcap)
    kc = 16
    cc = max(1, (1 << 25) // max(bcap * bcap, 1))
    c_blocks = block_pts.shape[0]

    def run_blocks(approx, precision):
        o_total = 4
        cand_s = jnp.full((n + 1, o_total, kc), jnp.inf, jnp.float32)
        cand_i = jnp.full((n + 1, o_total, kc), -1, jnp.int32)
        t0 = time.perf_counter()
        with jax.default_matmul_precision(precision):
            for lo in range(0, c_blocks, cc):
                hi = min(lo + cc, c_blocks)
                bp = np.full((cc, bcap), -1, np.int32)
                bo = np.zeros((cc, bcap), np.int32)
                bp[: hi - lo] = block_pts[lo:hi]
                bo[: hi - lo] = block_occ[lo:hi]
                cand_s, cand_i = _block_knn_scatter(
                    xj, xn, jnp.asarray(bp), jnp.asarray(bo),
                    jnp.asarray(0, jnp.int32), cand_s, cand_i, kc, "l2",
                    sel="approx" if approx else "exact",
                )
        jax.block_until_ready(cand_s)
        return time.perf_counter() - t0

    for label, ap, prec in (("approx_high", True, "high"),
                            ("exact_high", False, "high"),
                            ("approx_bf16", True, "default")):
        run_blocks(ap, prec)  # compile
        emit(exp="block_knn_pass", mode=label,
             s=round(min(run_blocks(ap, prec), run_blocks(ap, prec)), 4))


if __name__ == "__main__":
    main()
