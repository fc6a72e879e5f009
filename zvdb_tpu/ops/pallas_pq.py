"""Pallas fused PQ (ADC) scan: in-VMEM one-hot decode + MXU LUT matmul +
bin-parallel partial top-k.

Why this kernel exists (VERDICT round 3, item 1): the XLA PQ scan decodes
each tile through a [tile, S, C] one-hot block. At 8-bit codes (C=256) that
is either a 268 MB/tile HBM intermediate or, folded into scoring, an
effective scan width of S*C = 4096 — 32x the FLOPs of the flat 128d scan.
Measured result: pq_1m 22k QPS, 10x SLOWER than the flat scan it exists to
beat. The fix is the TPU shape of FAISS's 4-bit "fast scan": 16 codes per
subspace keeps the one-hot width S*16 (512 at n_sub=32) — 4x the flat
scan's width, run in one full-rate bf16 MXU pass, with the one-hot built in
VMEM so HBM corpus traffic is the packed codes only (16 B/row).

Pipeline per (query-tile i, corpus-chunk j) grid step:

  codes_T block [nb, chunk] uint8   (nb = n_sub/2 packed bytes; the array is
      stored TRANSPOSED so the chunk axis is the 128-lane axis)
  -> pltpu.repeat x32 along sublanes -> [S*16, chunk] int32
  -> nibble extract + compare against per-row code ids -> one-hot bf16
     (shift/code per row are tiny precomputed column inputs, so the kernel
     has no integer division by runtime layout constants)
  -> dots = lut [bq, S*16] @ onehot [S*16, chunk]   (ONE fat MXU matmul;
     lut rows are permuted outside to match the repeat layout)
  -> surrogate scores = norms - factor * dots
  -> fold into per-query [bq, L] bin minima (same exact-per-bin scheme as
     ops/pallas_topk.py; the caller runs one tiny top_k over L).

Selection recall is the bin collision bound (pallas_topk.py docstring);
score precision: "default" = one bf16 pass (PQ quantization error dominates
bf16 rounding; the engine's refine rerank repairs ranking anyway), "high" =
hi/lo split of the LUT into two bf16 passes (one-hot entries are exact in
bf16, so only the LUT carries rounding).

Replaces: reference's scalar L2 loop + heap (src/hnsw.zig:182-224) at
brute-force scale, for the product-quantized storage tier.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG1 = -1


def _pq_kernel(lut_ref, scale_ref, codes_ref, n_ref, shift_ref, code_ref,
               out_s_ref, out_i_ref, best_s, best_i, *,
               l_bins: int, metric: str, precision: str, per_bin: int,
               chunks_per_seg: int):
    bq = lut_ref.shape[0]
    sc = lut_ref.shape[1]          # n_sub * 16
    chunk = codes_ref.shape[1]
    nb = codes_ref.shape[0]
    j = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(j % chunks_per_seg == 0)
    def _():
        best_s[:] = jnp.full((bq, per_bin * l_bins), jnp.inf, jnp.float32)
        best_i[:] = jnp.full((bq, per_bin * l_bins), _NEG1, jnp.int32)

    # --- one-hot decode in VMEM -------------------------------------------
    # tile-repeat the nb packed-byte rows 32x: result row r*nb + b is byte
    # row b, copy r; copy r encodes (code c = r % 16, nibble = r // 16) and
    # the outside wrapper permutes the LUT columns to the same (r, b) order.
    rep = pltpu.repeat(codes_ref[:].astype(jnp.int32), sc // nb, axis=0)
    lo = rep & 0xF
    hi = (rep >> 4) & 0xF
    val = jnp.where(shift_ref[:, 0:1] > 0, hi, lo)       # [sc, chunk]
    # one-hot lands directly in the matmul operand dtype (int8 path: no
    # bf16 intermediate + convert per grid step)
    oh_dtype = jnp.int8 if precision == "int8" else jnp.bfloat16
    oh = (val == code_ref[:, 0:1]).astype(oh_dtype)      # [sc, chunk]

    # --- ADC scoring: one fat MXU matmul ----------------------------------
    def dot(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

    if precision == "high":
        lut = lut_ref[:]
        l_hi = lut.astype(jnp.bfloat16)
        l_lo = (lut - l_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dots = dot(l_hi, oh) + dot(l_lo, oh)             # [bq, chunk]
    elif precision == "int8":
        # int8 MXU path (2x the bf16 rate on v5e). The LUT arrives
        # pre-quantized (pq_scan_bins quantizes ONCE per batch — doing it
        # here re-ran the max/divide/round over [bq, sc] on every one of
        # the n_q_tiles*n_chunks grid steps); scale_ref carries the
        # per-query dequant scales in its first column.
        dots_i = jax.lax.dot_general(
            lut_ref[:], oh, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        dots = dots_i.astype(jnp.float32) * scale_ref[:, 0:1]
    else:
        dots = dot(lut_ref[:].astype(jnp.bfloat16), oh)
    factor = 2.0 if metric == "l2" else 1.0
    s = n_ref[0, :][None, :] - factor * dots

    # --- bin fold (identical scheme to pallas_topk._scan_kernel) ----------
    base = j * chunk
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, l_bins), 1)
    if per_bin == 1:
        cur_s = best_s[:]
        cur_i = best_i[:]
        for m in range(chunk // l_bins):
            sm = s[:, m * l_bins:(m + 1) * l_bins]
            im = base + m * l_bins + col
            take = sm < cur_s
            cur_s = jnp.where(take, sm, cur_s)
            cur_i = jnp.where(take, im, cur_i)
        best_s[:] = cur_s
        best_i[:] = cur_i
    else:
        # per-bin TOP-2: two insertion registers per bin. A true neighbor is
        # lost only when >= 2 spuriously-better rows share its bin — squares
        # the per-bin competition loss that capped top-1 selection recall at
        # 0.9135 (1M x 128d, 4-bit ns32, measured round 4: rerank 16 and 32
        # gave IDENTICAL recall because the pool itself was bin-limited).
        s1 = best_s[:, :l_bins]
        s2 = best_s[:, l_bins:]
        i1 = best_i[:, :l_bins]
        i2 = best_i[:, l_bins:]
        for m in range(chunk // l_bins):
            sm = s[:, m * l_bins:(m + 1) * l_bins]
            im = base + m * l_bins + col
            take1 = sm < s1
            take2 = jnp.logical_and(jnp.logical_not(take1), sm < s2)
            s2 = jnp.where(take1, s1, jnp.where(take2, sm, s2))
            i2 = jnp.where(take1, i1, jnp.where(take2, im, i2))
            s1 = jnp.where(take1, sm, s1)
            i1 = jnp.where(take1, im, i1)
        best_s[:, :l_bins] = s1
        best_s[:, l_bins:] = s2
        best_i[:, :l_bins] = i1
        best_i[:, l_bins:] = i2

    @pl.when(jnp.logical_or(j % chunks_per_seg == chunks_per_seg - 1,
                            j == n_chunks - 1))
    def _():
        out_s_ref[:] = best_s[:]
        out_i_ref[:] = best_i[:]


def _layout_consts(n_sub: int):
    """Per-onehot-row (shift_is_high, code) columns for the tile-repeat
    layout: row r*nb + b <-> subspace 2b + (r // 16), code r % 16."""
    nb = n_sub // 2
    sc = n_sub * 16
    r = np.arange(sc) // nb
    code = (r % 16).astype(np.int32)
    shift = ((r // 16) * 4).astype(np.int32)
    return (jnp.asarray(shift)[:, None] * jnp.ones((1, 128), jnp.int32),
            jnp.asarray(code)[:, None] * jnp.ones((1, 128), jnp.int32))


def permute_lut(lut: jax.Array, n_sub: int) -> jax.Array:
    """[B, S, 16] ADC table (ops/pq.py:adc_lut) -> [B, S*16] columns in the
    kernel's repeat order: column (r, b) = (subspace 2b + r//16, code r%16)."""
    b = lut.shape[0]
    nb = n_sub // 2
    # s -> (byte b, nibble n): s = 2b + n
    x = lut.reshape(b, nb, 2, 16)          # [B, b, n, c]
    x = x.transpose(0, 2, 3, 1)            # [B, n, c, b]  (row = (n*16+c)*nb+b)
    return x.reshape(b, n_sub * 16)


def _prep_lut(lut: jax.Array, n_sub: int, precision: str):
    """permute_lut + the precision's LUT form: int8 path quantizes the LUT
    ONCE per batch — per-query symmetric, scale = max|lut_q| / 127 (the
    kernel used to redo the max/divide/round on every grid step). Worst-case
    per-term error scale/2 sums to ~1.6% of max|lut| rms over 32 subspaces;
    the PQ quantization error is larger and the engine's refine rerank
    repairs both. Scale floored: an all-zero LUT row (zero query vs zero
    codebooks) would otherwise give scale 0 and round(0/0)=NaN codes.

    Returns (lut_k [B, SC] int8|f32, scales [B, 128] f32)."""
    b = lut.shape[0]
    lut_k = permute_lut(lut, n_sub)        # [B, SC]
    if precision == "int8":
        scales = jnp.maximum(
            jnp.max(jnp.abs(lut_k), axis=1, keepdims=True), 1e-30) / 127.0
        lut_k = jnp.round(lut_k / scales).astype(jnp.int8)
        scales = jnp.broadcast_to(scales, (b, 128))
    else:
        scales = jnp.ones((b, 128), jnp.float32)
    return lut_k, scales


@functools.partial(
    jax.jit,
    static_argnames=("l_bins", "bq_tile", "chunk", "metric", "precision",
                     "per_bin", "seg_rows", "interpret"),
)
def pq_scan_bins(
    lut: jax.Array,          # [B, S, 16] f32 ADC table (adc_lut, rotated qs)
    codes_t: jax.Array,      # [S//2, N] uint8 nibble-packed codes, TRANSPOSED
    norms: jax.Array,        # [N] f32 decoded sq-norms (l2) / 0; +inf invalid
    l_bins: int = 256,
    bq_tile: int = 512,
    chunk: int = 1024,
    metric: str = "l2",
    precision: str = "default",
    per_bin: int = 1,
    seg_rows: int = 0,
    interpret: bool = False,
):
    """Fold the PQ-coded corpus into [B, n_seg*per_bin*l_bins] bin minima.

    Returns (bin_scores [B, n_seg*per_bin*L] f32 surrogates, bin_ids int32,
    -1 where a bin never saw a valid row). per_bin=2 keeps the two best rows
    of each bin (the second half of each segment's columns holds the
    runners-up) — the selection-recall lever when the rerank pool, not the
    quantizer, is the bottleneck. Surrogate convention matches the engines:
    l2 = ||xhat||^2 - 2 q.xhat (query norm not added), dot/cosine = -q.xhat.

    seg_rows > 0 folds each consecutive seg_rows-row corpus SEGMENT into its
    own [per_bin*L] pool (output block index j // chunks_per_seg — one kernel
    program, no extra corpus traffic): the candidate pool scales with N, so
    bin competition stays at seg_rows/L rows per bin instead of N/L.
    Measured honestly (30M x 96d A/B, examples/exp_r4_scale.py): at rerank
    depths well below the global pool capacity (rr<=32 vs 4096 slots)
    segment pools are recall-IDENTICAL to the global pool — the global
    pool still retains the ADC-top-320, so the 0.77 @ rr32 ceiling there is
    ADC-precision-bound, not eviction-bound. What segment pools buy is a
    pool that scales with N (n_seg*per_bin*L slots), which makes DEEP
    rerank (rr >= ~pool/k) meaningful — and at 30M the scan dominates
    per-query cost (~409 us vs ~4.5 us for a 320-row refine gather), so
    deep rerank is nearly free. seg_rows=0 keeps the single global pool.
    """
    assert per_bin in (1, 2)
    b, n_sub, c16 = lut.shape
    assert c16 == 16, "pallas PQ scan requires n_codes <= 16 (nibble codes)"
    nb, n = codes_t.shape
    assert nb * 2 == n_sub
    sc = n_sub * 16
    assert sc % 128 == 0, "n_sub must be a multiple of 8 for the pallas scan"
    assert chunk % l_bins == 0, "chunk must be a multiple of l_bins"

    lut_k, scales = _prep_lut(lut, n_sub, precision)
    shift_col, code_col = _layout_consts(n_sub)

    bq = min(bq_tile, -(-max(8, b) // 8) * 8)
    if seg_rows and seg_rows < n:
        # Segmented pools make the output window revisit (block index
        # j // cps), so Mosaic double-buffers it: +2*bq*lw*8 B of scoped
        # VMEM on top of the same-sized scratch — bq=512/lw=2048 measured
        # 24.05 MB vs the 16 MB limit (single-pool runs fit at 16.03).
        # Halving bq fits with room; the scan is MXU-FLOP-bound, so the
        # extra per-q-tile corpus re-reads are noise (codes are 16 B/row).
        bq = min(bq, 256)
    pb = -(-b // bq) * bq - b
    pn = -(-n // chunk) * chunk - n
    lut_p = jnp.pad(lut_k, ((0, pb), (0, 0)))
    scales_p = jnp.pad(scales, ((0, pb), (0, 0)))
    codes_p = jnp.pad(codes_t, ((0, 0), (0, pn)))
    norms_p = jnp.pad(norms.astype(jnp.float32), (0, pn),
                      constant_values=jnp.inf).reshape(1, -1)

    n_q_tiles = lut_p.shape[0] // bq
    n_chunks = codes_p.shape[1] // chunk
    if seg_rows:
        assert seg_rows % chunk == 0, "seg_rows must be a multiple of chunk"
        cps = seg_rows // chunk
    else:
        cps = n_chunks
    n_seg = -(-n_chunks // cps)

    kernel = functools.partial(
        _pq_kernel, l_bins=l_bins, metric=metric, precision=precision,
        per_bin=per_bin, chunks_per_seg=cps)
    lw = per_bin * l_bins
    grid = (n_q_tiles, n_chunks)           # chunk innermost: scratch accumulates
    bin_s, bin_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bq, sc), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, chunk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sc, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sc, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bq, lw), lambda i, j: (i, j // cps),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, lw), lambda i, j: (i, j // cps),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((lut_p.shape[0], n_seg * lw), jnp.float32),
            jax.ShapeDtypeStruct((lut_p.shape[0], n_seg * lw), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, lw), jnp.float32),
            pltpu.VMEM((bq, lw), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * codes_p.shape[1] * sc,
            bytes_accessed=lut_p.size * 4 + n_q_tiles * codes_p.size,
            transcendentals=0,
        ),
        interpret=interpret,
    )(lut_p, scales_p, codes_p, norms_p, shift_col, code_col)
    return bin_s[:b], bin_i[:b]


def grouped_geometry(cap: int, l_bins: int, chunk: int) -> tuple[int, int]:
    """Effective (chunk, padded cap) pq_grouped_scan_bins uses for a given
    cluster capacity — callers need capp to map the kernel's within-cluster
    POSITIONS (which index the padded cap) onto their own id tables."""
    chunk = min(chunk, -(-cap // l_bins) * l_bins)
    return chunk, -(-cap // chunk) * chunk


@functools.partial(
    jax.jit,
    static_argnames=("l_bins", "chunk", "metric", "precision", "per_bin",
                     "interpret"),
)
def pq_grouped_scan_bins(
    lut: jax.Array,            # [B, S, 16] f32 ADC table (adc_lut, rotated qs)
    qslot: jax.Array,          # [C, qcap] int32 query slots per cluster; -1 empty
    codes_blocks: jax.Array,   # [C, S//2, cap] uint8 nibble-packed, per-cluster
    norms_blocks: jax.Array,   # [C, cap] f32 decoded sq-norms; +inf invalid
    l_bins: int = 128,
    chunk: int = 512,
    metric: str = "l2",
    precision: str = "default",
    per_bin: int = 2,
    interpret: bool = False,
):
    """Cluster-grouped fused ADC scan: the IVF-PQ probe kernel.

    The ScaNN-style grouped layout (index/ivf.py:_grouped_scan) applied to
    PQ codes: (query, cluster) probe pairs are slotted per cluster OUTSIDE
    this call; each grid step streams ONE cluster's contiguous code block
    through the same in-VMEM one-hot + LUT-matmul + bin-fold pipeline as
    pq_scan_bins (_pq_kernel is reused verbatim — the grid axes just mean
    (cluster, cap-chunk) instead of (query-tile, corpus-chunk)).

    Why this reaches sublinear scan cost where the flat kernel cannot: the
    flat scan pays B x N LUT-matmul FLOPs per batch; here each cluster is
    scored only against the <= qcap queries that probed it, so the total is
    qcap x (C x cap) ~= slack x P/C x (B x N) — a C/(slack x P) FLOP
    reduction (128x at 30M with C=8192, P=16, slack 4). The one-hot is also
    built once per (cluster, chunk) instead of once per query tile.

    Returns (bin_scores [C, qcap, per_bin*l_bins] f32 surrogates,
    bin_pos [C, qcap, per_bin*l_bins] int32 POSITIONS within the cluster's
    padded cap — the caller maps positions to ids via its b_ids table).
    Empty slots (qslot < 0) come back +inf / -1. Surrogate convention
    matches pq_scan_bins.
    """
    assert per_bin in (1, 2)
    b, n_sub, c16 = lut.shape
    assert c16 == 16, "pallas PQ scan requires n_codes <= 16 (nibble codes)"
    c, nb, cap = codes_blocks.shape
    assert nb * 2 == n_sub
    sc = n_sub * 16
    assert sc % 128 == 0, "n_sub must be a multiple of 8 for the pallas scan"
    assert l_bins % 128 == 0, "l_bins must be a multiple of 128 (lane dim)"
    assert chunk % l_bins == 0, "chunk must be a multiple of l_bins"
    cq, qcap = qslot.shape
    assert cq == c
    # int8 MXU operands tile at (32, 128); f32/bf16 at (8, 128)
    q_align = 32 if precision == "int8" else 8
    assert qcap % q_align == 0, f"qcap must be a multiple of {q_align}"

    lut_k, scales = _prep_lut(lut, n_sub, precision)
    shift_col, code_col = _layout_consts(n_sub)

    # gather per-slot LUT rows (empty slots read query 0; masked at the end)
    slot_idx = jnp.maximum(qslot, 0).reshape(-1)            # [C*qcap]
    lut_s = jnp.take(lut_k, slot_idx, axis=0)               # [C*qcap, SC]
    scl_s = jnp.take(scales, slot_idx, axis=0)              # [C*qcap, 128]

    chunk, capp = grouped_geometry(cap, l_bins, chunk)
    codes_p = codes_blocks.reshape(c * nb, cap) if capp == cap else jnp.pad(
        codes_blocks, ((0, 0), (0, 0), (0, capp - cap))).reshape(c * nb, capp)
    # norms ride as ONE flat row: a (1, chunk) block over a [C, capp] array
    # would put a 1-row block on a C-row sublane axis, which Mosaic rejects
    # (block dim -2 must divide 8 or equal the array dim — the flat kernel's
    # (1, N) reshape, generalized to the grouped grid's i*n_chunks+j column)
    norms_p = jnp.pad(norms_blocks.astype(jnp.float32),
                      ((0, 0), (0, capp - cap)),
                      constant_values=jnp.inf).reshape(1, c * capp)

    n_chunks = capp // chunk
    kernel = functools.partial(
        _pq_kernel, l_bins=l_bins, metric=metric, precision=precision,
        per_bin=per_bin, chunks_per_seg=n_chunks)
    lw = per_bin * l_bins
    grid = (c, n_chunks)
    bin_s, bin_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((qcap, sc), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qcap, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, chunk), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i, j, nc=n_chunks: (0, i * nc + j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sc, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sc, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((qcap, lw), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qcap, lw), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c * qcap, lw), jnp.float32),
            jax.ShapeDtypeStruct((c * qcap, lw), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((qcap, lw), jnp.float32),
            pltpu.VMEM((qcap, lw), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * c * qcap * sc * capp,
            bytes_accessed=(lut_s.size * (1 if precision == "int8" else 4)
                            + codes_p.size + norms_p.size * 4
                            + c * qcap * lw * 8),
            transcendentals=0,
        ),
        interpret=interpret,
    )(lut_s, scl_s, codes_p, norms_p, shift_col, code_col)
    bin_s = bin_s.reshape(c, qcap, lw)
    bin_i = bin_i.reshape(c, qcap, lw)
    live = (qslot >= 0)[:, :, None]
    return (jnp.where(live, bin_s, jnp.inf),
            jnp.where(live, bin_i, _NEG1))


def pq_scan_topk(
    lut: jax.Array,
    codes_t: jax.Array,
    norms: jax.Array,
    k: int,
    l_bins: int = 256,
    bq_tile: int = 512,
    chunk: int = 1024,
    metric: str = "l2",
    precision: str = "default",
    per_bin: int = 1,
    seg_rows: int = 0,
    interpret: bool = False,
):
    """Fused PQ top-k: bin fold + one small exact selection over the pooled
    n_seg*per_bin*L bins (pool scales with N when seg_rows > 0).

    Returns (surrogate scores [B, k], ids [B, k]); invalid slots +inf / -1.
    """
    bin_s, bin_i = pq_scan_bins(
        lut, codes_t, norms, l_bins=l_bins, bq_tile=bq_tile, chunk=chunk,
        metric=metric, precision=precision, per_bin=per_bin,
        seg_rows=seg_rows, interpret=interpret)
    width = bin_s.shape[1]
    kk = min(k, width)
    if kk > 64:
        # wide pools (rerank*k): lax.top_k degrades superlinearly in k while
        # two lax.sort passes stay flat (ops/topk.py, round-2 measurement)
        from . import topk as T

        scores, ids = T.sort_smallest_k(bin_s, bin_i, kk)
        scores = jnp.where(ids >= 0, scores, jnp.inf)
    else:
        neg, p = jax.lax.top_k(-bin_s, kk)
        ids = jnp.take_along_axis(bin_i, p, axis=-1)
        scores = jnp.where(ids >= 0, -neg, jnp.inf)
    if kk < k:
        scores = jnp.pad(scores, ((0, 0), (0, k - kk)), constant_values=jnp.inf)
        ids = jnp.pad(ids, ((0, 0), (0, k - kk)), constant_values=-1)
    return scores, ids
