"""Pallas fused brute-force scan: streaming corpus -> MXU scores -> in-VMEM top-k.

The XLA flat path materializes [B, N] scores between the matmul and the top-k
(approx_min_k fuses partially but still round-trips scores). This kernel keeps
the running top-k in VMEM scratch and never writes scores to HBM: the grid is
(query_tiles, corpus_chunks) — Pallas pipelines the corpus blocks HBM->VMEM
automatically (double-buffered) while each program scores its chunk on the MXU
(squared norms recomputed from the streamed chunk — negligible VPU work next to
the matmul) and folds it into the scratch top-k via k passes of min-extraction.
On the last chunk the scratch is flushed to the output block.

This is the TPU-KNN design (PAPERS.md: "K Nearest Neighbor Search at Peak
FLOP/s") expressed in Pallas. Exact: full scan, exact selection.

STATUS: SUPERSEDED by ops/pallas_topk.py (v3 — compiles on TPU, production
correct, ~parity with the XLA approx_min_k path; see docs/PERF.md). Kept as
the record of the first attempt. Original status: correct under the Pallas interpreter (tests/test_pallas_scan.py); the
compiled path is blocked on this platform's Mosaic version — lax.top_k has no
TPU lowering and the iterative min-extraction loop trips a register-allocator
spill (~257MB of spill slots at any tile size). The XLA flat path
(index/flat.py: matmul + lax.approx_min_k) already runs at ~1M QPS equivalent
on 100k x 128d, so this kernel is an optimization experiment, not a
dependency. Revisit with a compare-exchange sorting network (k x
compare/select column ops, no argmin) in a later round.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scan_kernel(q_ref, v_ref, out_s_ref, out_i_ref, best_s, best_i, *,
                 k: int, n_valid: int, metric: str):
    bq, d = q_ref.shape
    chunk = v_ref.shape[0]
    j = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_s[:] = jnp.full((bq, k), jnp.inf, jnp.float32)
        best_i[:] = jnp.full((bq, k), -1, jnp.int32)

    q = q_ref[:]
    vecs = v_ref[:]
    dots = jax.lax.dot_general(
        q, vecs,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                  # [Bq, chunk]
    base = j * chunk
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, chunk), 1)
    if metric == "l2":
        norms = jnp.sum(vecs * vecs, axis=1)
        s = norms[None, :] - 2.0 * dots
    else:
        s = -dots
    s = jnp.where(base + col < n_valid, s, jnp.inf)

    bs = best_s[:]
    bi = best_i[:]
    kcol = jax.lax.broadcasted_iota(jnp.int32, (bq, k), 1)

    def extract(_, acc):
        s_cur, bs, bi = acc
        m = jnp.min(s_cur, axis=1)
        am = jnp.argmin(s_cur, axis=1).astype(jnp.int32)
        worst = jnp.max(bs, axis=1)
        aw = jnp.argmax(bs, axis=1).astype(jnp.int32)
        take = m < worst
        hitk = (kcol == aw[:, None]) & take[:, None]
        bs = jnp.where(hitk, m[:, None], bs)
        bi = jnp.where(hitk, (base + am)[:, None], bi)
        s_cur = jnp.where(col == am[:, None], jnp.inf, s_cur)
        return s_cur, bs, bi

    _, bs, bi = jax.lax.fori_loop(0, k, extract, (s, bs, bi))
    best_s[:] = bs
    best_i[:] = bi

    @pl.when(j == n_chunks - 1)
    def _():
        fin = best_s[:]
        out_s_ref[:] = fin
        out_i_ref[:] = jnp.where(jnp.isfinite(fin), best_i[:], -1)


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "q_tile", "chunk", "interpret")
)
def flat_topk_pallas(
    q: jax.Array,         # [B, D] f32 (preprocessed: normalized for cosine)
    vectors: jax.Array,   # [N, D] f32 (live rows only)
    k: int,
    metric: str = "l2",
    q_tile: int = 256,
    chunk: int = 2048,
    interpret: bool = False,
):
    """Exact top-k over the full corpus. Returns (scores, ids) [B, k]
    (surrogate scores — caller finalizes). Pads B and N internally."""
    b, d = q.shape
    n = vectors.shape[0]
    b_pad = -(-b // q_tile) * q_tile
    n_pad = -(-n // chunk) * chunk
    qp = jnp.pad(q.astype(jnp.float32), ((0, b_pad - b), (0, 0)))
    vp = jnp.pad(vectors.astype(jnp.float32), ((0, n_pad - n), (0, 0)))

    kernel = functools.partial(_scan_kernel, k=k, n_valid=n, metric=metric)
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=(b_pad // q_tile, n_pad // chunk),
        in_specs=[
            pl.BlockSpec((q_tile, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((q_tile, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((q_tile, k), jnp.float32),
            pltpu.VMEM((q_tile, k), jnp.int32),
        ],
        interpret=interpret,
    )(qp, vp)
    return out_s[:b], out_i[:b]
