"""Engine routing by measured distance concentration.

Graphs provably stop working on high-dim unstructured data (docs/PERF.md
"uniform-random regime, settled": at 128d uniform NO graph config reaches
0.95 recall — at ef=512 both graph engines sit at 0.80 recall / ~500 QPS
while flat is simultaneously 1400x faster AND more accurate). The cause is
concentration of measure: nearest-neighbor distances concentrate around the
bulk distance, so graph descent has no gradient. This module measures that
concentration directly (relative contrast, Aggarwal et al.'s
meaningfulness criterion) so callers can route data to the right engine
instead of guessing.
"""
from __future__ import annotations

import numpy as np

# Measured anchors for the decision threshold (this estimator, 20k-row
# subsample, 256 x 2048 pairs):
#   uniform [0,1)^128 (the reference workload): RC = 1.21 -> graphs 0.80 cap
#   isotropic gaussian 256d ("hardest" protocol): RC = 1.15 -> same regime
#   SIFT-like clustered 128d: RC = 7.3 -> graphs hit 0.99+
# The regimes are separated by ~6x; 1.5 splits them with wide margin.
RC_GRAPH_THRESHOLD = 1.5


def relative_contrast(x, n_queries: int = 256, n_refs: int = 2048,
                      seed: int = 0) -> float:
    """Relative contrast RC = mean(bulk distance) / mean(NN distance) on a
    subsample. RC -> 1 means distances concentrate (no neighborhood
    structure for a graph to exploit); clustered data scores well above 1.

    Host-side numpy on a subsample (one [256, 2048] GEMM) — milliseconds,
    no device round-trip.
    """
    x = np.asarray(x, np.float32)
    n = x.shape[0]
    if n < 8:
        return float("inf")
    rng = np.random.default_rng(seed)
    qi = rng.choice(n, size=min(n_queries, n), replace=False)
    ri = rng.choice(n, size=min(n_refs, n), replace=False)
    q, r = x[qi], x[ri]
    # matmul identity, not broadcast differences: the [Q, R, D] temporary
    # would be multi-GB at 1024d; this is one [Q, R] GEMM
    qn = (q.astype(np.float64) ** 2).sum(-1)
    rn = (r.astype(np.float64) ** 2).sum(-1)
    d2 = qn[:, None] + rn[None, :] - 2.0 * (q.astype(np.float64) @ r.T.astype(np.float64))
    d2 = np.maximum(d2, 0.0)
    # exclude self/duplicate pairs (distance ~0) from the NN statistic
    d2 = np.where(d2 <= 1e-12, np.inf, d2)
    finite = np.isfinite(d2)
    if not finite.any():
        # every sampled pair is a near-duplicate: fully concentrated —
        # route to the exact engine (graphs have a measured self-hit
        # weakness on duplicate-heavy data, CLAUDE.md)
        return 1.0
    nn = np.sqrt(d2.min(axis=1))
    mean_bulk = float(np.sqrt(d2[finite]).mean())
    mean_nn = float(nn[np.isfinite(nn)].mean()) if np.isfinite(nn).any() else 0.0
    if mean_nn <= 0:
        return float("inf")
    return mean_bulk / mean_nn


def suggest_engine(x, n_queries: int = 256, n_refs: int = 2048,
                   seed: int = 0) -> tuple[str, float]:
    """-> (engine, rc). "cagra" when the data has neighborhood structure a
    graph can exploit, "flat" when distances concentrate (the regime where
    flat is simultaneously faster AND more accurate — docs/PERF.md)."""
    rc = relative_contrast(x, n_queries=n_queries, n_refs=n_refs, seed=seed)
    return ("cagra" if rc >= RC_GRAPH_THRESHOLD else "flat"), rc
