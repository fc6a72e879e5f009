"""Pallas fused flat scan v3: MXU scoring + bin-parallel partial top-k.

The production kernel the first two attempts (pallas_scan.py, pallas_scan2.py)
were reaching for. Both died in Mosaic on the k-extraction step: v1's
fori_loop kept every SSA copy of the [bq, chunk] score matrix live (257 MB of
register spills), v2's unrolled k x (min -> equality -> masked-min) chains blew
up compile time. This kernel removes extraction from the hot loop entirely —
the TPU-KNN move (PAPERS.md: "K Nearest Neighbor Search at Peak FLOP/s"):

  * Each query keeps L bins (L >= k). Corpus column c belongs to bin c % L.
  * Per corpus chunk: one MXU matmul scores the chunk, then chunk/L unrolled
    compare/select steps fold the chunk into the running [bq, L] bin minima.
    No argmin, no sort, no cross-lane reduction — two vector selects per step.
  * The [bq, L] bins are the kernel output; the caller runs one tiny exact
    lax.top_k over L columns to produce the final top-k.

Selection is exact per bin; overall per-query selection recall is the bin
collision bound E[distinct bins hit by the true top-k]/k =
L/k * (1 - (1 - 1/L)^k)  (k=10: 0.965 @ L=128, 0.983 @ L=256, 0.991 @ L=512)
— the same knob approx_min_k's recall_target turns. Because bin = c % L,
adjacent corpus rows (clustered/locality-ordered corpora) land in different
bins, so the practical recall on packed corpora is at least the random bound.

What the fusion buys over the XLA path (index/flat.py:_search): scores never
leave VMEM. The XLA scan materializes [B, tile] score blocks to HBM between
the matmul and approx_min_k; at 10k x 1M that is ~40 GB of HBM round-trips.
Here HBM traffic is corpus + queries + [B, L] bins only.

Replaces: reference's scalar L2 loop + per-query heap (src/hnsw.zig:182-224)
at brute-force scale.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG1 = -1


def _scan_kernel(q_ref, v_ref, n_ref, out_s_ref, out_i_ref, best_s, best_i, *,
                 l_bins: int, metric: str, precision: str):
    bq = q_ref.shape[0]
    chunk = v_ref.shape[0]
    j = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_s[:] = jnp.full((bq, l_bins), jnp.inf, jnp.float32)
        best_i[:] = jnp.full((bq, l_bins), _NEG1, jnp.int32)

    # explicit DEFAULT (not None): an ambient jax.default_matmul_precision
    # ("high") context would resolve None to HIGH, which Mosaic rejects
    def dot(a, b, prec=jax.lax.Precision.DEFAULT):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    if precision == "high":
        # Mosaic supports only DEFAULT/HIGHEST dot precisions, so the
        # engine's bf16x3 "high" is built by hand: x = hi + lo splits, keep
        # hi*hi + hi*lo + lo*hi (drop lo*lo) — 3 full-rate bf16 MXU passes
        # vs HIGHEST's 6, at ~1e-6 relative error (matches the XLA path's
        # BF16_BF16_F32_X3).
        qf = q_ref[:]
        vf = v_ref[:]
        q_hi = qf.astype(jnp.bfloat16)
        q_lo = (qf - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        v_hi = vf.astype(jnp.bfloat16)
        v_lo = (vf - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dots = dot(q_hi, v_hi) + dot(q_hi, v_lo) + dot(q_lo, v_hi)
    elif precision == "highest":
        dots = dot(q_ref[:], v_ref[:], jax.lax.Precision.HIGHEST)
    else:
        dots = dot(q_ref[:].astype(jnp.bfloat16),
                   v_ref[:].astype(jnp.bfloat16))        # [bq, chunk]
    # repo surrogate convention (ops/distance.py:pairwise_scores): norms are
    # +inf on un-ingested/padding rows and act as the validity bias, so scores
    # are +inf there with no separate mask. l2: norms - 2 q.x; dot/cosine:
    # norms(=0 valid) - q.x.
    factor = 2.0 if metric == "l2" else 1.0
    s = n_ref[0, :][None, :] - factor * dots

    base = j * chunk
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, l_bins), 1)
    cur_s = best_s[:]
    cur_i = best_i[:]
    for m in range(chunk // l_bins):
        sm = s[:, m * l_bins:(m + 1) * l_bins]          # lane-aligned slice
        im = base + m * l_bins + col
        take = sm < cur_s
        cur_s = jnp.where(take, sm, cur_s)
        cur_i = jnp.where(take, im, cur_i)
    best_s[:] = cur_s
    best_i[:] = cur_i

    @pl.when(j == n_chunks - 1)
    def _():
        out_s_ref[:] = best_s[:]
        out_i_ref[:] = best_i[:]


@functools.partial(
    jax.jit,
    static_argnames=("l_bins", "bq_tile", "chunk", "metric", "precision",
                     "interpret"),
)
def flat_scan_bins(
    q: jax.Array,           # [B, D] f32 preprocessed queries
    vectors: jax.Array,     # [N, D] f32 corpus (storage rows)
    norms: jax.Array,       # [N] f32 squared norms; +inf marks invalid rows
    l_bins: int = 256,
    bq_tile: int = 512,
    chunk: int = 2048,
    metric: str = "l2",
    precision: str = "high",
    interpret: bool = False,
):
    """Fold the whole corpus into [B, l_bins] per-query bin minima.

    Returns (bin_scores [B, L] f32 surrogate scores, bin_ids [B, L] int32,
    -1 where a bin never saw a valid row). Surrogate scores follow the repo
    convention: ||x||^2 - 2 q.x for l2 (query norm NOT added), -q.x otherwise.
    """
    b, d = q.shape
    n = vectors.shape[0]
    assert chunk % l_bins == 0, "chunk must be a multiple of l_bins"

    assert precision in ("highest", "high", "default")

    # pad shapes to tile multiples (D to the 128-lane boundary; the query tile
    # rounds up to a multiple of 8 — Mosaic f32 sublane tiling wants the
    # second-to-minor block dim 8-aligned, and padding covers the remainder)
    bq = min(bq_tile, -(-max(8, b) // 8) * 8)
    pb = -(-b // bq) * bq - b
    pd = -(-d // 128) * 128 - d
    pn = -(-n // chunk) * chunk - n
    qp = jnp.pad(q.astype(jnp.float32), ((0, pb), (0, pd)))
    vp = jnp.pad(vectors.astype(jnp.float32), ((0, pn), (0, pd)))
    np_ = jnp.pad(norms.astype(jnp.float32), (0, pn),
                  constant_values=jnp.inf).reshape(1, -1)

    n_q_tiles = qp.shape[0] // bq
    n_chunks = vp.shape[0] // chunk

    kernel = functools.partial(
        _scan_kernel, l_bins=l_bins, metric=metric, precision=precision)
    grid = (n_q_tiles, n_chunks)   # chunk axis innermost: scratch accumulates
    bin_s, bin_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bq, qp.shape[1]), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, vp.shape[1]), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bq, l_bins), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, l_bins), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qp.shape[0], l_bins), jnp.float32),
            jax.ShapeDtypeStruct((qp.shape[0], l_bins), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, l_bins), jnp.float32),
            pltpu.VMEM((bq, l_bins), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * vp.shape[0] * qp.shape[1],
            bytes_accessed=(qp.size + n_q_tiles * vp.size) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qp, vp, np_)
    return bin_s[:b], bin_i[:b]


def flat_scan_topk(
    q: jax.Array,
    vectors: jax.Array,
    norms: jax.Array,
    k: int,
    l_bins: int = 256,
    bq_tile: int = 512,
    chunk: int = 2048,
    metric: str = "l2",
    precision: str = "high",
    interpret: bool = False,
):
    """Fused brute-force top-k: Pallas bin fold + one tiny exact top_k over L.

    Returns (scores [B, k] surrogate, ids [B, k]); invalid slots +inf / -1.
    """
    bin_s, bin_i = flat_scan_bins(
        q, vectors, norms, l_bins=l_bins, bq_tile=bq_tile, chunk=chunk,
        metric=metric, precision=precision, interpret=interpret)
    kk = min(k, l_bins)
    neg, p = jax.lax.top_k(-bin_s, kk)
    ids = jnp.take_along_axis(bin_i, p, axis=-1)
    scores = -neg
    scores = jnp.where(ids >= 0, scores, jnp.inf)
    if kk < k:
        scores = jnp.pad(scores, ((0, 0), (0, k - kk)), constant_values=jnp.inf)
        ids = jnp.pad(ids, ((0, 0), (0, k - kk)), constant_values=-1)
    return scores, ids
