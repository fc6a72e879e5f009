"""Allowlist normalization for filtered search.

Filtered ANN (an allowlist predicate over external ids) reuses the delete
machinery: an allowlist is the complement of a per-call tombstone mask, so
every engine filters it at the same point it filters deletes — beams keep
routing through non-matching nodes (standard filtered-HNSW behavior) and
non-matching ids never enter results.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def allowed_mask(allowed, n_total: int, cap: int):
    """Normalize a user allowlist to a device bool[cap] (True = eligible).

    `allowed`: either a bool mask over external ids (length n_total or cap)
    or an integer array/list of eligible external ids.
    """
    a = np.asarray(allowed)
    if a.dtype == bool:
        if a.shape[0] not in (n_total, cap):
            raise ValueError(
                f"allowed mask length {a.shape[0]} != corpus size {n_total}")
        out = np.zeros(cap, bool)
        out[: a.shape[0]] = a
    else:
        a = a.astype(np.int64).ravel()
        if a.size and ((a < 0).any() or (a >= n_total).any()):
            raise IndexError(f"allowed ids must be in [0, {n_total})")
        out = np.zeros(cap, bool)
        out[a] = True
    return jnp.asarray(out)
