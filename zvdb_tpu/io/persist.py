"""Index persistence (save/load).

The reference has no persistence at all — its index lives and dies in memory
(SURVEY.md §5 "Checkpoint / resume: Absent"). Here the full index state
(vectors, neighbor tables, levels, entry point, params) round-trips through a
single .npz file; shapes are static so load is a straight device_put.
"""
from __future__ import annotations

import dataclasses
import json

import jax.numpy as jnp
import numpy as np

from ..utils.config import HNSWConfig, SearchConfig

FORMAT_VERSION = 1


def save_hnsw(path: str, index) -> None:
    from ..index.hnsw import HNSW  # noqa: F401 (type only)

    st = index.state
    meta = {
        "format_version": FORMAT_VERSION,
        "cfg": dataclasses.asdict(index.cfg),
        "search_cfg": dataclasses.asdict(index.search_cfg),
        "capacity": index.capacity,
        "levels_cap": index.levels_cap,
        "n_inserted": index._n_inserted,
    }
    arrays = {}
    if st is not None:
        # npz stores ml_dtypes bfloat16 as raw void ('|V2') which cannot be
        # cast back on load — round-trip bf16 vectors through f32 (the load
        # path casts to cfg.storage_dtype anyway, so this is lossless for bf16)
        vecs = st.vectors
        if vecs.dtype == jnp.bfloat16:
            vecs = vecs.astype(jnp.float32)
        arrays = {
            "vectors": np.asarray(vecs),
            "norms": np.asarray(st.norms),
            "nbr0": np.asarray(st.nbr0),
            "nbrU": np.asarray(st.nbrU),
            "dist0": np.asarray(st.dist0),
            "distU": np.asarray(st.distU),
            "levels": np.asarray(st.levels),
            "ext_ids": np.asarray(st.ext_ids),
            "entry": np.asarray(st.entry),
            "max_level": np.asarray(st.max_level),
            "n": np.asarray(st.n),
            "q_scale": np.asarray(st.q_scale),
            "anchors": np.asarray(st.anchors),
            "a_norms": np.asarray(st.a_norms),
            "a_rows": np.asarray(st.a_rows),
        }
        if index._dead:
            arrays["dead_ext"] = np.asarray(sorted(index._dead), np.int64)
    np.savez_compressed(path, meta=json.dumps(meta), **arrays)


def load_hnsw(path: str):
    from ..index.hnsw import HNSW, HNSWState

    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["meta"]))
        if meta["format_version"] > FORMAT_VERSION:
            raise ValueError(f"unsupported index format {meta['format_version']}")
        cfg = HNSWConfig(**meta["cfg"])
        scfg = SearchConfig(**meta["search_cfg"])
        idx = HNSW(cfg, scfg)
        idx.capacity = meta["capacity"]
        idx.levels_cap = meta["levels_cap"]
        idx._n_inserted = meta["n_inserted"]
        if "vectors" in z:
            idx._anchor_n = int(z["n"])
            idx.state = HNSWState(
                vectors=jnp.asarray(z["vectors"], cfg.storage_dtype),
                norms=jnp.asarray(z["norms"]),
                nbr0=jnp.asarray(z["nbr0"]),
                nbrU=jnp.asarray(z["nbrU"]),
                dist0=jnp.asarray(z["dist0"]),
                distU=jnp.asarray(z["distU"]),
                levels=jnp.asarray(z["levels"]),
                ext_ids=jnp.asarray(z["ext_ids"]),
                entry=jnp.asarray(z["entry"]),
                max_level=jnp.asarray(z["max_level"]),
                n=jnp.asarray(z["n"]),
                q_scale=jnp.asarray(z["q_scale"]) if "q_scale" in z
                else jnp.asarray(1.0, jnp.float32),
                anchors=jnp.asarray(z["anchors"]) if "anchors" in z
                else jnp.zeros((0, cfg.dim), jnp.float32),
                a_norms=jnp.asarray(z["a_norms"]) if "a_norms" in z
                else jnp.zeros((0,), jnp.float32),
                a_rows=jnp.asarray(z["a_rows"]) if "a_rows" in z
                else jnp.zeros((0,), jnp.int32),
            )
            if "dead_ext" in z:
                dead_ext = np.asarray(z["dead_ext"], np.int64)
                idx._dead = set(int(i) for i in dead_ext)
                rows = idx._ext_to_rows(dead_ext)
                idx._dead_rows = (
                    jnp.zeros((idx.state.nbr0.shape[0],), bool)
                    .at[jnp.asarray(rows)].set(True))
    return idx
