"""Auto filter-mode routing: masked exact scan vs beam/probe by regime.

The reference has no filtered search at all; this policy module encodes the
measured round-4/5 crossover (docs/PERF.md "Filtered search"): the exact
masked scan dominates the graph-beam / IVF-probe alternatives at every
selectivity <= 50% (beam collapses to 0.167 recall @ 968 QPS at 1% / 1M),
while the scan is O(N*D) per query and concedes only the near-all-pass
regime on very large corpora, where filtering is almost a no-op and the
sublinear beam/probe path keeps its recall.

``filter_mode="auto"`` (the engine default) routes per call:

    scan   unless  n >= N_CROSSOVER  and  selectivity >= SEL_NEAR_ALL

Cost discipline: the corpus-size gate is checked FIRST, so below the
crossover no selectivity estimate (and no device sync) ever happens. Above
it, a boolean device mask costs one scalar pull (~28 ms through the relay,
amortized over the query batch); host numpy masks and id allowlists are
free.

Constants are measured, not guessed — exp_r5_filter.py prices the
selectivity x N grid (cagra-1M beam, ivf-10M probe); see PERF.md
"Round-5 filtered-search crossover" for the table behind the numbers.
"""
from __future__ import annotations

import numpy as np

# Measured crossover constants (exp_r5_filter.py; PERF.md round-5 grid).
# Below N_CROSSOVER the masked scan won every selectivity tried (100k-1M
# measured round 4); at 10M the probe/beam path only beats the scan while
# holding recall when the filter passes nearly everything.
N_CROSSOVER: int = 4_000_000
SEL_NEAR_ALL: float = 0.90


def mask_selectivity(allowed, n: int) -> float:
    """Fraction of the n live ids the allowlist passes (estimate in [0, 1]).

    allowed: bool mask over ids (host or device) or an int id array.
    Host inputs are free; a device bool mask costs one scalar sync
    (jnp.mean pulled as float) — never a full-mask transfer.
    """
    if n <= 0:
        return 1.0
    if isinstance(allowed, (list, tuple)):
        allowed = np.asarray(allowed)
    if isinstance(allowed, np.ndarray):
        if allowed.dtype == np.bool_:
            m = allowed[:n]
            return float(m.mean()) if m.size else 1.0
        return min(1.0, allowed.size / n)
    # jax array (or anything array-like on device)
    import jax.numpy as jnp

    a = jnp.asarray(allowed)
    if a.dtype == jnp.bool_:
        if a.shape[0] == 0:
            return 1.0
        return float(jnp.mean(a[:n].astype(jnp.float32)))
    return min(1.0, int(np.prod(a.shape)) / n)


def resolve_filter_mode(filter_mode: str, allowed, n: int,
                        alt: str = "beam") -> str:
    """Resolve "auto" to "scan" or the engine's sublinear mode (alt).

    alt is "beam" for the graph engines, "probe" for IVF/IVF-PQ. Explicit
    modes pass through unchanged; callers validate membership themselves.
    """
    if filter_mode != "auto":
        return filter_mode
    if allowed is None or n < N_CROSSOVER:
        return "scan"
    if mask_selectivity(allowed, n) >= SEL_NEAR_ALL:
        return alt
    return "scan"
