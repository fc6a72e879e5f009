"""Top-k primitives (smallest-score-first convention).

Replaces the reference's per-query candidate heap + insertion sort
(reference src/hnsw.zig:202-233) with dense batched top-k suitable for the VPU/MXU.

Convention everywhere: scores are "smaller is better" surrogates
(see ops/distance.py); invalid entries carry +inf and ids carry -1.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

INF = jnp.inf


def smallest_k(scores: jax.Array, ids: jax.Array, k: int):
    """Per-row k smallest entries of (scores [..., C], ids [..., C]) -> ([..., k], [..., k]).

    Ties broken by position (stable enough for deterministic tests because inputs
    are generated deterministically). Invalid slots (+inf / id -1) sort last.
    """
    neg = -scores
    top_vals, top_idx = jax.lax.top_k(neg, k)
    out_ids = jnp.take_along_axis(ids, top_idx, axis=-1)
    out_scores = -top_vals
    # Entries that were +inf remain +inf; normalize their ids to -1.
    out_ids = jnp.where(jnp.isinf(out_scores), -1, out_ids)
    return out_scores, out_ids


def smallest_k_dense(scores: jax.Array, k: int):
    """k smallest over the last axis of a dense score matrix -> (scores, indices)."""
    top_vals, top_idx = jax.lax.top_k(-scores, k)
    return -top_vals, top_idx


def merge_topk(scores_a, ids_a, scores_b, ids_b, k: int):
    """Merge two per-row top-k lists into one top-k list (no dedupe)."""
    s = jnp.concatenate([scores_a, scores_b], axis=-1)
    i = jnp.concatenate([ids_a, ids_b], axis=-1)
    return smallest_k(s, i, k)


def mask_duplicate_ids(scores: jax.Array, ids: jax.Array):
    """Invalidate all but the first occurrence of each id per row.

    ids: [..., C] int32 (-1 = already invalid). Uses an O(C^2) equality matrix —
    C is small (beam widths), so this is VPU-cheap and shape-static.
    """
    eq = ids[..., :, None] == ids[..., None, :]  # [..., C, C]
    c = ids.shape[-1]
    earlier = jnp.tril(jnp.ones((c, c), bool), k=-1)
    dup = jnp.any(eq & earlier, axis=-1)  # True where an earlier slot has same id
    dup = dup & (ids >= 0)
    return jnp.where(dup, INF, scores), jnp.where(dup, -1, ids)


def mask_ids_in(scores: jax.Array, ids: jax.Array, banned: jax.Array):
    """Invalidate entries whose id appears in `banned` ([..., K] per-row id list)."""
    hit = jnp.any(ids[..., :, None] == banned[..., None, :], axis=-1)
    hit = hit & (ids >= 0)
    return jnp.where(hit, INF, scores), jnp.where(hit, -1, ids)
