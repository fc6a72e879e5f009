"""Mesh-sharded IVF: clusters are the sharding unit (the expert-parallel
analog — SURVEY.md §2.3 "shard-routed search: each index shard ≈ an expert").

Layout: one global k-means; clusters are then distributed across the mesh
`shard` axis greedily by size (largest-first onto the least-loaded shard) so
per-device scan work is balanced. Each device holds a complete local IVFState
over its clusters; queries are replicated, every shard probes its own top
`nprobe_local` local clusters with the grouped-matmul scan, and the per-shard
top-k merge is one all-gather + top-k that XLA derives from the sharding
annotations.

Scaling: a v5e-16 mesh with bf16 blocks holds ~2.5B 96-d vectors; per-chip
work is 1/S of the single-chip scan at matched total nprobe.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index.ivf import IVFConfig, IVFIndex, IVFState, ivf_search_impl
from ..ops import topk as T
from .mesh import SHARD_AXIS, make_mesh
from .sharded import shard_map


class ShardedIVF:
    """IVF index with clusters sharded over a device mesh."""

    def __init__(self, cfg: IVFConfig, mesh: Optional[Mesh] = None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_shards = self.mesh.shape[SHARD_AXIS]
        self.state = None          # stacked IVFState (leading shard axis)
        self.c_mask = None         # [S, C_loc] bool
        self._n = 0
        self._fns = {}

    def __len__(self) -> int:
        return self._n

    def build(self, x) -> None:
        x = np.asarray(x, np.float32)
        single = IVFIndex(self.cfg)
        single.build(x)
        st = single.state
        self._n = int(st.n)
        s = self.n_shards
        counts = np.asarray(st.counts)
        c = counts.shape[0]

        # greedy size-balanced cluster placement
        order = np.argsort(-counts, kind="stable")
        load = np.zeros(s, np.int64)
        members = [[] for _ in range(s)]
        for ci in order:
            tgt = int(np.argmin(load))
            members[tgt].append(ci)
            load[tgt] += counts[ci]
        c_loc = max(len(m) for m in members)

        def stack(field, pad_value):
            arr = np.asarray(getattr(st, field))
            out = np.full((s, c_loc) + arr.shape[1:], pad_value, arr.dtype)
            for si, m in enumerate(members):
                out[si, : len(m)] = arr[m]
            return out

        cent = stack("centroids", 0.0)
        c_norms = stack("c_norms", np.inf)       # +inf: l2 pad never probed
        blocks = stack("blocks", 0)
        b_norms = stack("b_norms", np.inf)
        b_scales = stack("b_scales", 1.0)
        b_ids = stack("b_ids", -1)
        if self.cfg.rerank:
            raise NotImplementedError(
                "rerank is not supported on the sharded IVF path yet "
                "(shadow vectors are ext-id-ordered, not cluster-sharded)"
            )
        cnt = stack("counts", 0)
        mask = np.zeros((s, c_loc), bool)
        for si, m in enumerate(members):
            mask[si, : len(m)] = True

        sh = NamedSharding(self.mesh, P(SHARD_AXIS))
        self.state = IVFState(
            centroids=jax.device_put(jnp.asarray(cent), sh),
            c_norms=jax.device_put(jnp.asarray(c_norms), sh),
            blocks=jax.device_put(jnp.asarray(blocks, self.cfg.storage_dtype), sh),
            b_norms=jax.device_put(jnp.asarray(b_norms), sh),
            b_scales=jax.device_put(jnp.asarray(b_scales), sh),
            b_ids=jax.device_put(jnp.asarray(b_ids), sh),
            counts=jax.device_put(jnp.asarray(cnt), sh),
            n=jax.device_put(
                jnp.asarray([int(st.n)] * s, jnp.int32), sh
            ),
            rerank_vecs=jax.device_put(
                jnp.zeros((s, 0, self.cfg.dim), jnp.bfloat16), sh
            ),
            rerank_norms=jax.device_put(jnp.zeros((s, 0), jnp.float32), sh),
        )
        self.c_mask = jax.device_put(jnp.asarray(mask), sh)
        self._fns = {}

    def _make(self, k: int, nprobe_local: int):
        cfg = self.cfg
        mesh = self.mesh
        specs = jax.tree.map(lambda _: P(SHARD_AXIS), self.state)

        @jax.jit
        def run(state, c_mask, q):
            def local(st, cm, q):
                st = jax.tree.map(lambda a: a[0], st)
                s_, i_ = ivf_search_impl(
                    st, q, k, nprobe_local, cfg.metric, cfg.precision,
                    c_mask=cm[0], residual=cfg.dtype == "int8",
                )
                return s_[:, None, :], i_[:, None, :]

            s_, i_ = shard_map(
                local, mesh=mesh,
                in_specs=(specs, P(SHARD_AXIS), P()),
                out_specs=(P(None, SHARD_AXIS), P(None, SHARD_AXIS)),
            )(state, c_mask, q)
            b = s_.shape[0]
            s_ = s_.reshape(b, -1)
            i_ = i_.reshape(b, -1)
            key = s_ if cfg.metric == "l2" else -s_
            ms, mi = T.smallest_k(key, i_, k)
            return (ms if cfg.metric == "l2" else -ms), mi

        return run

    def search(self, q, k: int, nprobe: Optional[int] = None):
        if self.state is None or self._n == 0:
            q = np.atleast_2d(np.asarray(q, np.float32))
            return (
                jnp.full((q.shape[0], k),
                         jnp.inf if self.cfg.metric == "l2" else -jnp.inf),
                jnp.full((q.shape[0], k), -1, jnp.int32),
            )
        p_total = nprobe or self.cfg.nprobe
        # each shard probes its local best; +1 covers placement imbalance
        p_local = min(
            max(1, -(-p_total // self.n_shards) + 1),
            self.state.centroids.shape[1],
        )
        key = (k, p_local)
        if key not in self._fns:
            self._fns[key] = self._make(k, p_local)
        q = jnp.atleast_2d(jnp.asarray(q, jnp.float32))
        return self._fns[key](self.state, self.c_mask, q)
