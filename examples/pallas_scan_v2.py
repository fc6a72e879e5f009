"""Pallas fused scan v2: mutable-scratch top-k fold (Mosaic-friendly).

v1 (pallas_scan.py) carried the masked score matrix through a fori_loop; Mosaic
unrolls the loop and kept every SSA copy live, spilling ~257MB of registers.
Here the score matrix lives in a VMEM scratch ref and is mutated in place; the
k extraction steps are unrolled python-level but only touch refs, so the live
set stays ~1 copy. argmin/argmax are replaced by the compare+min-reduce
pattern (min -> equality mask -> min over masked column ids), which lowers to
plain VPU reductions.

STATUS: SUPERSEDED by ops/pallas_topk.py (v3 — bin-parallel fold; compiles
on TPU, ~parity with XLA approx_min_k; docs/PERF.md). Original status:
exact under the Pallas interpreter (see tests); on this platform's
Mosaic the compile itself does not terminate within 10 minutes (the unrolled
k x [256, 2048] compare/reduce chain appears to blow up compile time rather
than VMEM now). Not wired into any engine; the XLA approx_min_k path remains
the production scan. Next attempt: smaller per-extract working set (two-level
bucket minima) or waiting for a Mosaic with native top_k.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG_I = 2**30  # python int: jnp constants captured at module scope break pallas


def _scan_kernel(q_ref, v_ref, out_s_ref, out_i_ref, s_buf, best_s, best_i, *,
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
    )
    base = j * chunk
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, chunk), 1)
    if metric == "l2":
        norms = jnp.sum(vecs * vecs, axis=1)
        s = norms[None, :] - 2.0 * dots
    else:
        s = -dots
    s_buf[:] = jnp.where(base + col < n_valid, s, jnp.inf)

    kcol = jax.lax.broadcasted_iota(jnp.int32, (bq, k), 1)
    for _ in range(k):
        cur = s_buf[:]
        m = jnp.min(cur, axis=1)                                  # [Bq]
        # argmin without the argmin op: first column achieving the min
        idx = jnp.min(jnp.where(cur == m[:, None], col, _BIG_I), axis=1)
        bs = best_s[:]
        worst = jnp.max(bs, axis=1)
        widx = jnp.min(jnp.where(bs == worst[:, None], kcol, _BIG_I), axis=1)
        take = m < worst
        hit = (kcol == widx[:, None]) & take[:, None]
        best_s[:] = jnp.where(hit, m[:, None], bs)
        best_i[:] = jnp.where(hit, (base + idx)[:, None], best_i[:])
        s_buf[:] = jnp.where(col == idx[:, None], jnp.inf, cur)

    @pl.when(j == n_chunks - 1)
    def _():
        fin = best_s[:]
        out_s_ref[:] = fin
        out_i_ref[:] = jnp.where(jnp.isfinite(fin), best_i[:], -1)


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "q_tile", "chunk", "interpret")
)
def flat_topk_pallas2(
    q: jax.Array,
    vectors: jax.Array,
    k: int,
    metric: str = "l2",
    q_tile: int = 256,
    chunk: int = 2048,
    interpret: bool = False,
):
    """Exact top-k over the full corpus (surrogate scores, ids)."""
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
            pltpu.VMEM((q_tile, chunk), jnp.float32),
            pltpu.VMEM((q_tile, k), jnp.float32),
            pltpu.VMEM((q_tile, k), jnp.int32),
        ],
        interpret=interpret,
    )(qp, vp)
    return out_s[:b], out_i[:b]
