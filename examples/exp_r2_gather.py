"""Round-2 experiment: gather-width scaling + CAGRA search knob sensitivity.

Validates the fat-row design premise: XLA row-gather cost is row-count-bound
and (nearly) width-independent, so packing a node's whole neighborhood
(deg x (vec|norm|id)) into ONE row should cut hop cost ~deg/expand-fold.

Run on the real chip (one TPU process at a time!): python examples/exp_r2_gather.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from zvdb_tpu.utils.cache import setup_compile_cache
setup_compile_cache("tpu")


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / reps


def main():
    print("backend", jax.default_backend(), flush=True)
    _ = float((jnp.ones((8, 128)) @ jnp.ones((128, 8))).sum())

    # ---- 1. gather width scaling -----------------------------------------
    n = 100_000
    n_rows = 5000 * 128          # one hop's worth at B=5000, E*deg=128
    key = jax.random.PRNGKey(0)
    rows = jax.random.randint(key, (n_rows,), 0, n, jnp.int32)

    @jax.jit
    def gather_sum(tab, r):
        return jnp.take(tab, r, axis=0).sum(axis=-1)

    for lanes in (32, 128, 130, 256, 520, 1040, 2080, 4160):
        tab = jnp.ones((n, lanes), jnp.float32)
        dt = timeit(gather_sum, tab, rows, reps=10)
        print(f"gather width={lanes*4:6d}B rows={n_rows}  "
              f"{dt*1e3:7.2f} ms  {dt/n_rows*1e9:6.2f} ns/row  "
              f"{n_rows*lanes*4/dt/1e9:7.1f} GB/s", flush=True)

    # fewer, fatter rows at constant bytes: the design point
    for e_rows, lanes in ((5000 * 128, 130), (5000 * 4, 4160)):
        tab = jnp.ones((n, lanes), jnp.float32)
        r = rows[:e_rows]
        dt = timeit(gather_sum, tab, r, reps=10)
        print(f"constant-bytes rows={e_rows:7d} width={lanes*4:6d}B  "
              f"{dt*1e3:7.2f} ms  {e_rows*lanes*4/dt/1e9:7.1f} GB/s", flush=True)

    # ---- 2. CAGRA search sensitivity -------------------------------------
    from zvdb_tpu import CagraConfig, CagraIndex
    from zvdb_tpu.bench.harness import recall_at_k
    from zvdb_tpu.io.datasets import load_dataset

    nq, k, d = 10_000, 10, 128
    x, _, _, metric = load_dataset("sift1m", max_rows=n)
    rng = np.random.default_rng(9)
    q = (x[rng.integers(0, n, nq)]
         + 0.05 * rng.standard_normal((nq, d))).astype(np.float32)
    gt = np.load(f"/tmp/zvdb_gt_clustered_{n}_{d}_{nq}_{k}.npz")["gt"]

    idx = CagraIndex(CagraConfig(dim=d, degree=32, metric=metric))
    t0 = time.perf_counter()
    idx.build(x)
    jax.block_until_ready(idx.state)
    print(f"build {n/(time.perf_counter()-t0):,.0f} pts/s (cold)", flush=True)

    qd = jnp.asarray(q[:5000])
    jax.block_until_ready(qd)
    import zvdb_tpu.index.cagra as C

    import dataclasses as dc

    def run(qb, ef, n_seeds, expand, max_iters, fat, dedupe=True):
        idx.cfg = dc.replace(idx.cfg, fat_rows="on" if fat else "off")
        arrs = idx._search_arrays()
        s, i = C.cagra_search(arrs, qb, k, metric, ef, n_seeds, expand,
                              max_iters, idx.cfg.precision, idx.cfg.packed,
                              fat, dedupe)
        return i

    # marginal per-hop cost ladder (what does one iteration cost?)
    for mi in (0, 1, 2, 4, 8, 12):
        ids = run(qd, 32, 16, 4, mi, False)
        jax.block_until_ready(ids)
        dt = timeit(run, qd, 32, 16, 4, mi, False, reps=6)
        r = recall_at_k(np.asarray(ids), gt[:5000], k)
        print(f"LADDER iters={mi:2d}  recall={r:.4f}  {dt*1e3:7.1f} ms "
              f"({5000/dt:,.0f} qps)", flush=True)

    for fat in (False, True):
        for ef, ns, e, mi, dd in [
            (32, 16, 4, 12, True), (32, 16, 4, 12, False),
            (32, 16, 4, 8, True), (32, 16, 8, 6, True), (32, 16, 8, 4, True),
            (24, 16, 4, 8, True), (16, 16, 4, 6, True), (32, 32, 4, 8, True),
            (64, 32, 16, 5, True), (32, 32, 16, 3, True),
            (32, 32, 16, 3, False),
        ]:
            ids = run(qd, ef, ns, e, mi, fat, dd)
            jax.block_until_ready(ids)
            dt = timeit(run, qd, ef, ns, e, mi, fat, dd, reps=6)
            r = recall_at_k(np.asarray(ids), gt[:5000], k)
            print(f"fat={int(fat)} ef={ef:3d} seeds={ns:2d} expand={e:2d} "
                  f"iters={mi} dedupe={int(dd)}  recall={r:.4f}  "
                  f"{5000/dt:,.0f} qps", flush=True)

    # batch-size sensitivity at the best-looking config
    for bs in (1024, 2048, 5000, 10000):
        qb = jnp.asarray(q[:bs])
        jax.block_until_ready(qb)
        ids = run(qb, 32, 16, 4, 8, False)
        jax.block_until_ready(ids)
        dt = timeit(run, qb, 32, 16, 4, 8, False, reps=6)
        print(f"BATCH {bs:6d}  {bs/dt:,.0f} qps", flush=True)


if __name__ == "__main__":
    main()
