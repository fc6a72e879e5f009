"""Pallas fused block-scorer: intra-block pairwise scores + bin-parallel
partial top-k, entirely in VMEM.

The graph build's block-kNN phase (knn_graph._block_knn_scatter) scores each
k-means block against itself ([cc, B, B] einsum) and selects top-kc per row.
The XLA path materializes the [cc, B, B] score tensor to HBM between the
matmul and the selection and runs a partial top-k at a huge-batch x
medium-width shape it is bad at — measured 0.30-0.35 s per pass at 100k
(195 blocks x B~1650) where the matmul floor is ~0.06 s (round-3
microbench, examples/exp_r3_batch3.py). This kernel fuses the whole phase:

  * grid (block, row-tile): each step loads one [bq, D] row tile (LHS) and
    the block's full [B, D] table (RHS, constant across row tiles so Mosaic
    fetches it once per block), runs the MXU matmul, masks the diagonal,
    and folds the [bq, B] scores into [bq, L] modular-bin minima — scores
    never touch HBM.
  * selection quality is the bin-collision bound (same as ops/pallas_topk):
    candidate GENERATION only — multi-view union + prune + reverse repair
    per-view misses (measured: end recall unchanged vs exact, tests).

Same precision discipline as ops/pallas_topk._scan_kernel: "high" = manual
bf16x3 splits (Mosaic has no HIGH dot precision), "highest" = f32,
"default" = single-pass bf16.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = jnp.inf


def _kernel(lhs_ref, rhs_ref, vn_ref, out_s_ref, out_i_ref, *,
            l_bins: int, metric: str, precision: str):
    bq = lhs_ref.shape[1]
    bpad = rhs_ref.shape[1]
    i = pl.program_id(1)

    # precision pinned EXPLICITLY on every dot: the graph build wraps the
    # whole pipeline in jax.default_matmul_precision("high"), and Mosaic
    # rejects an ambient HIGH resolving onto an unannotated dot_general
    def dot(a, b, prec=jax.lax.Precision.DEFAULT):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    lhs = lhs_ref[0]
    rhs = rhs_ref[0]
    if precision == "high":
        l_hi = lhs.astype(jnp.bfloat16)
        l_lo = (lhs - l_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        r_hi = rhs.astype(jnp.bfloat16)
        r_lo = (rhs - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dots = dot(l_hi, r_hi) + dot(l_hi, r_lo) + dot(l_lo, r_hi)
    elif precision == "highest":
        dots = dot(lhs, rhs, jax.lax.Precision.HIGHEST)
    else:
        dots = dot(lhs.astype(jnp.bfloat16), rhs.astype(jnp.bfloat16))

    factor = 2.0 if metric == "l2" else 1.0
    s = vn_ref[0, 0][None, :] - factor * dots               # [bq, Bpad]
    # self-pairs are exactly the diagonal (block members are distinct;
    # invalid slots carry vn=+inf already)
    row = i * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bpad), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, bpad), 1)
    s = jnp.where(row == col, INF, s)

    col_l = jax.lax.broadcasted_iota(jnp.int32, (bq, l_bins), 1)
    best_s = jnp.full((bq, l_bins), INF, jnp.float32)
    best_i = jnp.full((bq, l_bins), -1, jnp.int32)
    for m in range(bpad // l_bins):
        sm = s[:, m * l_bins:(m + 1) * l_bins]
        im = m * l_bins + col_l
        take = sm < best_s
        best_s = jnp.where(take, sm, best_s)
        best_i = jnp.where(take, im, best_i)
    out_s_ref[0] = best_s
    out_i_ref[0] = best_i


@functools.partial(
    jax.jit,
    static_argnames=("l_bins", "bq", "metric", "precision", "interpret"),
)
def block_bins(
    v: jax.Array,       # [cc, B, D] f32 block vectors (pre-gathered)
    vn: jax.Array,      # [cc, B] f32 norms; +inf marks invalid slots
    l_bins: int = 128,
    bq: int = 256,
    metric: str = "l2",
    precision: str = "high",
    interpret: bool = False,
):
    """Per row of each block: [L] bin-minimum scores + within-block column
    ids (-1 where a bin saw only invalid/self entries). Surrogate scores
    follow the repo convention (l2: ||x||^2 - 2 x.y; dot/cosine: -x.y with
    vn expected zero on valid slots)."""
    cc, b, d = v.shape
    assert bq % l_bins == 0, "bq must be a multiple of l_bins"
    bpad = -(-b // bq) * bq     # one pad serves LHS tiles, RHS width, bins
    pd = -(-d // 128) * 128 - d
    vp = jnp.pad(v.astype(jnp.float32), ((0, 0), (0, bpad - b), (0, pd)))
    # [cc, 1, bpad]: a (1, bpad) block over [cc, bpad] violates Mosaic's
    # sublane rule (second-to-last block dim must divide by 8 or equal the
    # overall dim); the singleton middle axis satisfies it exactly
    np_ = jnp.pad(vn.astype(jnp.float32), ((0, 0), (0, bpad - b)),
                  constant_values=INF)[:, None, :]

    kernel = functools.partial(_kernel, l_bins=l_bins, metric=metric,
                               precision=precision)
    grid = (cc, bpad // bq)   # row tiles innermost: the RHS block index is
    # constant across them, so Mosaic fetches each block's table once
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, vp.shape[-1]), lambda c, i: (c, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bpad, vp.shape[-1]), lambda c, i: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bpad), lambda c, i: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, l_bins), lambda c, i: (c, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, l_bins), lambda c, i: (c, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cc, bpad, l_bins), jnp.float32),
            jax.ShapeDtypeStruct((cc, bpad, l_bins), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * cc * bpad * bpad * vp.shape[-1],
            bytes_accessed=vp.size * 4 * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(vp, vp, np_)
    # drop padding rows; mask ids of bins that only saw invalid/self slots
    out_s = out_s[:, :b]
    out_i = jnp.where(jnp.isfinite(out_s), out_i[:, :b], -1)
    return out_s, out_i
