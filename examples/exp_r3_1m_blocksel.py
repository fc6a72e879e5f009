"""Round-3: block-kNN selection A/B at 1M (the phase data says block-kNN is
78% of the device-resident 1M graph build: 11.3 s/pass with the default
"approx" selection at 100k-tuned shapes).

Variants, all device-resident, warm, best-of-2, default p2s2 geometry:
  - block_topk approx (default)     - block_topk pallas (fused bin-fold)
  - block_topk exact                - block=512 (smaller score tensors)
Sanity: self-hit@1 on 2000 corpus points (no external gt — the shape-keyed
gt cache burned this experiment's predecessor; self-hit needs none).
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


def main():
    from zvdb_tpu import CagraConfig, CagraIndex
    from zvdb_tpu.io.datasets import synthetic_clustered

    n, d = 1_000_000, 128
    x = synthetic_clustered(n, d, n_clusters=10_000, seed=0)
    _ = float((jnp.ones((8, 128)) @ jnp.ones((128, 8))).sum())
    xd = jax.device_put(jnp.asarray(x))
    jax.block_until_ready(xd)
    probe = jax.device_put(jnp.asarray(x[:2000]))
    jax.block_until_ready(probe)

    variants = [
        ("approx", dict(block_topk="approx")),
        ("pallas", dict(block_topk="pallas")),
        ("binfold", dict(block_topk="binfold")),
        ("exact", dict(block_topk="exact")),
        ("approx_b512", dict(block_topk="approx", block=512)),
        ("pallas_b512", dict(block_topk="pallas", block=512)),
    ]
    for name, kw in variants:
        cfg = CagraConfig(dim=d, degree=32, metric="l2", n_anchors=262144,
                          search_degree=16, max_iters=4, ef_search=12, **kw)
        try:
            idx = CagraIndex(cfg)
            idx.build(xd)                     # warm (compiles)
            jax.block_until_ready(idx.state)
            best = float("inf")
            for _ in range(2):
                idx = CagraIndex(cfg)
                t0 = time.perf_counter()
                idx.build(xd)
                jax.block_until_ready(idx.state)
                _ = float(jnp.asarray(idx.state.nbrs[0, 0], jnp.float32))
                best = min(best, time.perf_counter() - t0)
            ids = np.asarray(idx.search(probe, 1, ef_search=12)[1])
            hit = float((ids[:, 0] == np.arange(2000)).mean())
            print(json.dumps(dict(exp=f"blocksel_{name}",
                                  build_s=round(best, 2),
                                  pts_per_s=round(n / best),
                                  self_hit=round(hit, 4))), flush=True)
            del idx
        except Exception as e:
            log(f"{name} failed: {e!r}")


if __name__ == "__main__":
    main()
