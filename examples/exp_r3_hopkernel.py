"""Fused graph-hop kernel experiment: can a Pallas kernel beat XLA's
row-gather for beam-search candidate scoring?

SURVEY §7 named a "fused gather+distance+topk hop" kernel; VERDICT round-2
listed it as the one kernel-plan item never attempted. The question it must
answer: the hop cost is the candidate-vector gather (measured 6-9 ns/row at
1M rows, row-count-bound, ~10-30x below HBM streaming peak). XLA's gather
emits a hardware dynamic-gather; the only way a Pallas kernel wins is if
per-row async DMAs (pltpu.make_async_copy with dynamic row indices) issue
faster than that, or if fusing the score avoids enough HBM traffic
([R, D] gather output write+readback) to matter.

This microbench times, at the real hop shape of the 1M cagra config
(~5000 queries x 256 candidate rows/hop ~ 1.3M rows/hop over x [1M, 128]):
  a) XLA gather + einsum score (the production hop's data path)
  b) Pallas fused kernel: per-query chunked row DMAs (CH rows in flight per
     chunk) + in-VMEM dot; the gathered [R, D] tensor never touches HBM.

RESULT (v5e, 2026-08-17): XLA gather+score 17.8 ms/hop (13.9 ns/row,
value-pulled chained timing — see the timing caveat below); Pallas per-row
DMA kernel 548 ms/hop (429 ns/row, outputs exact to 1e-5) — a 31x LOSS.
Per-row DMA issue overhead (~430 ns) dwarfs the hardware gather's ~14 ns/row;
scattered rows cannot coalesce into fewer descriptors, and fusing the score
saves only the [R, D] HBM round-trip (~1.3 GB at streaming rate ~ 1.6 ms,
<10% of the gather). The fused-hop kernel line is CLOSED: XLA's dynamic
gather is the right primitive, and hop REDUCTION (anchor seeding, hop
budgets, truncated search degree) is the lever that actually moves QPS —
which is how the engines hit their numbers (docs/PERF.md).

TIMING CAVEAT (measured here, 2026-08-17): for these gather microbench
programs, jax.block_until_ready returned in ~0.25 ms while the real device
time was 17-90 ms — through the axon relay it does NOT reliably force
execution of every program. Time microbenches by pulling a VALUE that
depends on every output (e.g. float(acc) over chained lax.scan reps, as
/tmp-style scripts here do). The engine QPS numbers in bench.py are NOT
affected: a value-pulled cross-check of the flat engine agreed with the
block_until_ready timing within 6% (857k vs 801k QPS warm).
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BT = 8        # queries per grid tile
CH = 128      # candidate rows per DMA chunk (all CH DMAs in flight together)


def _hop_kernel(idx_ref, q_ref, x_ref, out_ref, buf, sems, *, k: int):
    """One query-tile: for each of BT queries, stream its K candidate rows
    from HBM in CH-row chunks and write dot-product scores [BT, K]."""
    nch = k // CH

    # b is python-unrolled so the out_ref store row is static (Mosaic rejects
    # dynamic stores at unaligned sublane offsets); the chunk offset c*CH is
    # dynamic but 128-lane-aligned
    for b in range(BT):
        def body(c, _, b=b):
            def start(r, _):
                row = idx_ref[b, c * CH + r]
                pltpu.make_async_copy(
                    x_ref.at[pl.ds(row, 1), :],
                    buf.at[pl.ds(r, 1), :],
                    sems.at[r],
                ).start()
                return _

            def wait(r, _):
                pltpu.make_async_copy(
                    x_ref.at[pl.ds(0, 1), :],
                    buf.at[pl.ds(r, 1), :],
                    sems.at[r],
                ).wait()
                return _

            jax.lax.fori_loop(0, CH, start, None, unroll=False)
            jax.lax.fori_loop(0, CH, wait, None, unroll=False)
            qb = q_ref[b:b + 1, :]                             # [1, D]
            s = jax.lax.dot_general(
                buf[...], qb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                                  # [CH, 1]
            out_ref[b:b + 1, pl.ds(c * CH, CH)] = s.reshape(1, CH)
            return _

        jax.lax.fori_loop(0, nch, body, None, unroll=False)


def fused_hop_scores(idx, q, x, interpret=False):
    """scores[b, j] = q[b] . x[idx[b, j]] with candidate rows streamed by
    per-row DMA; the gathered [B*K, D] tensor never materializes in HBM."""
    b, k = idx.shape
    _, d = x.shape
    assert b % BT == 0 and k % CH == 0
    kern = functools.partial(_hop_kernel, k=k)
    return pl.pallas_call(
        kern,
        interpret=interpret,
        grid=(b // BT,),
        in_specs=[
            # per-tile candidate ids land in SMEM (8 KB/tile — the whole
            # [B, K] table is 5 MB and SMEM is 1 MB, so no scalar prefetch)
            pl.BlockSpec((BT, k), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BT, d), lambda i: (i, 0)),       # q tile
            pl.BlockSpec(memory_space=pl.ANY),             # x stays HBM
        ],
        out_specs=pl.BlockSpec((BT, k), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((CH, d), jnp.float32),
            pltpu.SemaphoreType.DMA((CH,)),
        ],
        out_shape=jax.ShapeDtypeStruct((b, k), jnp.float32),
    )(idx, q, x)


@jax.jit
def xla_hop_scores(idx, q, x):
    """The production hop's data path: hardware gather + batched dot."""
    cand = jnp.take(x, idx, axis=0)                    # [B, K, D]
    return jnp.einsum("bd,bkd->bk", q, cand,
                      precision=jax.lax.Precision.HIGHEST)


def main():
    from zvdb_tpu.utils.cache import setup_compile_cache
    setup_compile_cache("tpu")
    n, d, b, k = 1_000_000, 128, 4992, 256
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    # distinct indices per rep: rule out any cross-dispatch elision
    idxs = [jnp.asarray(rng.integers(0, n, (b, k)), jnp.int32)
            for _ in range(5)]
    idx = idxs[0]
    jax.block_until_ready((x, q, *idxs))
    print(f"rows/hop = {b * k:,}", flush=True)

    # (a) gather alone, output materialized (sum forces the [B,K,D] tensor).
    # x is an ARGUMENT, not a closure: jit bakes closed-over arrays into the
    # program as constants — a 512 MB HLO the remote compile service rejects
    gather_only = jax.jit(
        lambda ii, xx: jnp.take(xx, ii, axis=0).sum(axis=(1, 2)))
    jax.block_until_ready(gather_only(idx, x))
    t0 = time.perf_counter()
    outs = [gather_only(ii, x) for ii in idxs]
    jax.block_until_ready(outs)
    t_g = (time.perf_counter() - t0) / 5
    print(f"xla gather(+rowsum): {t_g*1e3:.2f} ms "
          f"({t_g / (b*k) * 1e9:.2f} ns/row)", flush=True)

    # (b) the production path: gather fused into the score einsum
    s_ref = xla_hop_scores(idx, q, x)
    jax.block_until_ready(s_ref)
    t0 = time.perf_counter()
    outs = [xla_hop_scores(ii, q, x) for ii in idxs]
    jax.block_until_ready(outs)
    t_xla = (time.perf_counter() - t0) / 5
    print(f"xla gather+score: {t_xla*1e3:.2f} ms "
          f"({t_xla / (b*k) * 1e9:.2f} ns/row)", flush=True)

    # (c) serialization-proof timing: each rep's indices depend on the
    # previous rep's scores (lax.scan), so no overlap/elision is possible
    @jax.jit
    def chained(ii0, qq, xx):
        def step(ii, _):
            s = jnp.einsum("bd,bkd->bk", qq, jnp.take(xx, ii, axis=0),
                           precision=jax.lax.Precision.HIGHEST)
            dep = (s[:1, :1].astype(jnp.int32) & 0)    # data dep, value 0
            return (ii + dep) % xx.shape[0], s[0, 0]
        _, ss = jax.lax.scan(step, ii0, None, length=8)
        return ss
    jax.block_until_ready(chained(idx, q, x))
    t0 = time.perf_counter()
    ss = chained(idx, q, x)
    jax.block_until_ready(ss)
    t_ch = (time.perf_counter() - t0) / 8
    print(f"xla gather+score (chained x8): {t_ch*1e3:.2f} ms "
          f"({t_ch / (b*k) * 1e9:.2f} ns/row)", flush=True)

    t0 = time.perf_counter()
    s_p = fused_hop_scores(idx, q, x)
    jax.block_until_ready(s_p)
    print(f"pallas compile+first run {time.perf_counter()-t0:.1f}s", flush=True)
    err = float(jnp.abs(s_p - s_ref).max())
    print(f"max |err| = {err:.2e}", flush=True)
    t0 = time.perf_counter()
    for _ in range(3):
        s_p = fused_hop_scores(idx, q, x)
    jax.block_until_ready(s_p)
    t_pl = (time.perf_counter() - t0) / 3
    print(f"pallas fused hop: {t_pl*1e3:.2f} ms "
          f"({t_pl / (b*k) * 1e9:.2f} ns/row)  -> "
          f"{'WIN' if t_pl < t_xla else 'LOSS'} vs xla ({t_pl/t_xla:.1f}x)",
          flush=True)


if __name__ == "__main__":
    main()
