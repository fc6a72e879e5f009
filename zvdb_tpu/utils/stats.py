"""Index statistics & memory accounting.

The reference's benchmark notes estimate HNSW memory overhead at ~1.4% over raw
vectors (reference benchmarks/benchmark.md:121-144) without ever measuring it;
these helpers report the actual numbers for any engine state.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _pytree_bytes(state) -> Dict[str, int]:
    out = {}
    for field in state._fields:
        arr = getattr(state, field)
        try:
            out[field] = int(np.prod(arr.shape)) * arr.dtype.itemsize
        except AttributeError:
            out[field] = 0
    return out


def index_stats(index: Any) -> Dict[str, Any]:
    """Engine-agnostic stats: memory by component, overhead vs raw vectors,
    and (for the graph engine) degree/level distributions."""
    st = getattr(index, "state", None)
    if st is None:
        return {"n": len(index), "total_bytes": 0}
    if isinstance(st, dict):  # ShardedFlat
        comp = {k2: int(np.prod(v.shape)) * v.dtype.itemsize for k2, v in st.items()}
    else:
        comp = _pytree_bytes(st)
    total = sum(comp.values())
    stats: Dict[str, Any] = {
        "n": len(index),
        "total_bytes": total,
        "component_bytes": comp,
    }

    raw = None
    if "vectors" in comp:
        raw = comp["vectors"]
    elif "blocks" in comp:
        raw = comp["blocks"]
    if raw:
        stats["overhead_vs_raw"] = (total - raw) / max(raw, 1)

    # graph-specific structure stats (HNSW nbr0 / CAGRA nbrs)
    if hasattr(st, "nbr0") or hasattr(st, "nbrs"):
        n = int(st.n)
        table = st.nbr0 if hasattr(st, "nbr0") else st.nbrs
        nbr0 = np.asarray(table)[:n]
        deg = (nbr0 >= 0).sum(axis=1)
        stats["degree"] = {
            "mean": float(deg.mean()) if n else 0.0,
            "min": int(deg.min()) if n else 0,
            "max": int(deg.max()) if n else 0,
            "isolated": int((deg == 0).sum()),
        }
        if hasattr(st, "levels"):
            lv = np.asarray(st.levels)[:n]
            lv = lv[lv >= 0]
            stats["levels_hist"] = (
                np.bincount(lv).tolist() if lv.size else []
            )
            stats["max_level"] = int(st.max_level)
    if hasattr(st, "counts"):  # IVF
        counts = np.asarray(st.counts)
        cap = st.blocks.shape[-2]
        stats["clusters"] = {
            "count": int(counts.shape[0]),
            "fill_mean": float(counts.mean()),
            "fill_max": int(counts.max()) if counts.size else 0,
            "capacity": int(cap),
            "pad_waste": 1.0 - float(counts.sum()) / max(counts.shape[0] * cap, 1),
        }
    return stats
