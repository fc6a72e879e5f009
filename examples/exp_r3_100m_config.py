"""100M-configuration evidence run (BASELINE.json config 5, scaled):

AGGREGATE multi-million-row indexes on the 8-virtual-device CPU mesh —
2M x 96d corpus sharded over 8 shards (250k rows/shard):
  1. ShardedIVF: int8 residual codes + exact rerank, shard-routed probes +
     all-gather merge.
  2. ShardedPQFlat: PQ codes + local int8-refine rerank — the
     memory-scaling engine for the same config (run with
     `--engine pq`; n_codes=64 keeps the CPU decode tractable on the
     1-core CI host; the TPU deployment uses n_codes=256).
Validates that the 100M/v5e-16 configuration's engines execute end-to-end
at aggregate multi-million scale on a mesh; per-chip HBM budget for the
real 100M deployment is the table in docs/PERF.md §"100M configuration".

Run:  python examples/exp_r3_100m_config.py [--engine ivf|pq]
      (forces CPU; ~10-20 min cold per engine)
Output: one JSON line per engine.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
from zvdb_tpu.utils.cache import setup_compile_cache
setup_compile_cache("tpu")

import numpy as np  # noqa: E402


def main():
    from zvdb_tpu import IVFConfig, PQConfig, make_mesh
    from zvdb_tpu.bench.harness import ground_truth_host, recall_at_k
    from zvdb_tpu.io.datasets import synthetic_clustered
    from zvdb_tpu.parallel.sharded_ivf import ShardedIVF
    from zvdb_tpu.parallel.sharded_pq import ShardedPQFlat

    engine = "pq" if "--engine" in sys.argv and \
        sys.argv[sys.argv.index("--engine") + 1] == "pq" else "ivf"

    n, d, nq, k = 2_000_000, 96, 1_000, 10
    x = synthetic_clustered(n, d, n_clusters=20_000, seed=0)
    rng = np.random.default_rng(3)
    q = (x[rng.integers(0, n, nq)]
         + 0.05 * rng.standard_normal((nq, d))).astype(np.float32)

    if engine == "pq":
        nq = 512           # one full-scan batch: the CPU decode dominates
        q = q[:nq]
        cfg = PQConfig(dim=d, n_sub=16, n_codes=64, refine="int8", rerank=4)
        idx = ShardedPQFlat(cfg, mesh=make_mesh(n_shards=8))
        name = "sharded_pq16x64_int8refine_2M_96d_8shards_cpu_mesh"
    else:
        cfg = IVFConfig(dim=d, n_clusters=4096, nprobe=16, dtype="int8",
                        rerank=4)
        idx = ShardedIVF(cfg, mesh=make_mesh(n_shards=8))
        name = "sharded_ivf_int8_rerank_2M_96d_8shards_cpu_mesh"
    t0 = time.perf_counter()
    idx.build(x)
    jax.block_until_ready(idx.state)
    build_s = time.perf_counter() - t0

    ids = []
    for lo in range(0, nq, 512):
        ids.append(np.asarray(idx.search(q[lo:lo + 512], k)[1]))
    ids = np.concatenate(ids)
    _, gt = ground_truth_host(x, q, k, cfg.metric)
    rec = recall_at_k(ids, gt, k)

    import jax.numpy as jnp
    reps = 1 if engine == "pq" else 3
    staged = [jax.device_put(jnp.asarray(q[lo:lo + 512]))
              for lo in range(0, nq, 512)]
    jax.block_until_ready(staged)
    t0 = time.perf_counter()
    outs = [idx.search(qb, k) for _ in range(reps) for qb in staged]
    jax.block_until_ready(outs)
    qps = reps * nq / (time.perf_counter() - t0)

    bytes_total = sum(
        np.asarray(v).nbytes for v in jax.tree.leaves(idx.state))
    if engine == "ivf":
        bytes_total += np.asarray(idx.id_map).nbytes
    else:
        bytes_total += np.asarray(idx.codebooks).nbytes
    print(json.dumps({
        "config": name,
        "n": n, "dim": d, "shards": 8,
        "build_s": round(build_s, 1),
        "build_pps": round(n / build_s, 1),
        "recall@10": round(rec, 4),
        "qps_cpu_mesh": round(qps, 1),
        "index_bytes": int(bytes_total),
        "bytes_per_vector": round(bytes_total / n, 1),
    }), flush=True)


if __name__ == "__main__":
    sys.exit(main())
