"""Round-3: re-run the reference dims x k grid with the FIXED harness.

Round-2's grid fed host numpy per batch and measured the relay transfer
(87x within-row spread on the flat rows — VERDICT weak #2); the harness now
stages query batches on device with async amortized passes. One process
runs all engines (device init is ~2-10 min through the relay).

Protocol = the reference's: uniform-random corpus AND queries,
dims {128,512,768,1024} x k {10,25,50,100}, 100k points, 10k queries,
fresh index per combination, build excluded from search timing
(/root/reference/benchmarks/single_threaded_benchmarks.zig:28-33).
Results append to docs/grid_r3.jsonl.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from zvdb_tpu.utils.cache import setup_compile_cache
setup_compile_cache("tpu")


def main():
    from zvdb_tpu.bench import sweep

    t0 = time.time()
    _ = float((jnp.ones((8, 128)) @ jnp.ones((128, 8))).sum())
    print(f"device init {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "grid_r3.jsonl")
    for engine in ("flat", "cagra", "hnsw", "ivf"):
        t0 = time.time()
        try:
            sweep.main([
                "--engine", engine, "--points", "100000",
                "--queries", "10000", "--dims", "128,512,768,1024",
                "--ks", "10,25,50,100", "--recall", "--out", out,
            ])
        except Exception as e:
            print(f"{engine} failed: {e!r}", file=sys.stderr, flush=True)
        print(f"{engine} grid in {time.time()-t0:.0f}s",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
