"""Sharded index: corpus partitioned over a device mesh, per-shard graphs,
query fan-out, all-gather top-k merge (BASELINE.json config 5; SURVEY.md §2.3).

Design (TPU-native, scaling-book recipe):
  * The corpus axis N is partitioned into S shards — the expert-parallel analog
    for a vector DB (each shard ≈ an expert; every query visits all shards).
  * Each shard holds an independent HNSW graph over its subset; graph gathers
    never cross shards, so per-shard search runs under `shard_map` with zero
    communication.
  * Per-shard top-k results (global external ids) are merged by a plain jnp
    top-k over the gathered [B, S*k] matrix — XLA inserts the all-gather over
    ICI automatically from the sharding annotations.
  * The query batch can additionally be sharded over a `data` mesh axis (DP).
  * Bulk build runs the same batched build step on every shard simultaneously
    (each device extends its own subgraph with its own slice — SPMD, no locks;
    contrast reference src/hnsw.zig:74: one global mutex).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index.build import build_batch_impl, sample_levels
from ..index.hnsw import HNSWState, init_state, max_level_for, search_state_impl
from ..ops import distance as D
from ..ops import topk as T
from ..utils.config import HNSWConfig, SearchConfig
from .mesh import DATA_AXIS, SHARD_AXIS, make_mesh

try:  # jax >= 0.4.35
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map  # type: ignore


def shard_map(f, **kw):
    """shard_map with the varying-manual-axes check disabled: the search/build
    kernels carry constant-initialized while_loop state, which trips the vma
    type check even though every shard's control flow is independent."""
    for flag in ("check_vma", "check_rep"):
        try:
            return _shard_map(f, **kw, **{flag: False})
        except TypeError:
            continue
    return _shard_map(f, **kw)


def _state_specs(state: HNSWState) -> HNSWState:
    """PartitionSpec pytree: every leaf carries a leading shard axis."""
    return jax.tree.map(lambda _: P(SHARD_AXIS), state)


def _strip(stacked: HNSWState) -> HNSWState:
    return jax.tree.map(lambda a: a[0], stacked)


def _stack1(state: HNSWState) -> HNSWState:
    return jax.tree.map(lambda a: a[None], state)


class ShardedHNSW:
    """Mesh-sharded HNSW. API mirrors the single-chip class (build/search/len)."""

    def __init__(
        self,
        cfg: HNSWConfig,
        search_cfg: SearchConfig = SearchConfig(),
        mesh: Optional[Mesh] = None,
        seed: int = 0,
    ):
        self.cfg = cfg
        self.search_cfg = search_cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_shards = self.mesh.shape[SHARD_AXIS]
        self.n_data = self.mesh.shape.get(DATA_AXIS, 1)
        self.state: Optional[HNSWState] = None  # stacked: leading shard axis
        self.levels_cap = 1
        self.shard_cap = 0
        self._key = jax.random.PRNGKey(seed)
        self._n = 0
        self._search_fn = None

    def __len__(self) -> int:
        return self._n

    # ------------------------------------------------------------------ build
    def build(self, x) -> None:
        """Bulk-build: contiguous split of the corpus across shards, all shards
        built in parallel under shard_map."""
        x = np.asarray(x, np.float32)
        n = x.shape[0]
        s = self.n_shards
        per = -(-n // s) if n else 1
        bsz = min(self.cfg.build_batch, per)
        per_pad = -(-per // bsz) * bsz
        self.shard_cap = per_pad
        self.levels_cap = (
            self.cfg.max_level
            if self.cfg.max_level is not None
            else max_level_for(per_pad, self.cfg.m)
        )
        self._n = n

        # host-side shard prep: slice, sample levels, level-desc sort, global ids
        xs = np.zeros((s, per_pad, self.cfg.dim), np.float32)
        ls = np.full((s, per_pad), -1, np.int32)
        es = np.full((s, per_pad), -1, np.int32)
        vs = np.zeros((s, per_pad), bool)
        self._key, sub = jax.random.split(self._key)
        all_levels = sample_levels(sub, n, self.cfg.m, self.levels_cap, self.cfg.ml)
        for si in range(s):
            lo, hi = si * per, min((si + 1) * per, n)
            cnt = max(hi - lo, 0)
            if cnt == 0:
                continue
            lv = all_levels[lo:hi]
            order = np.argsort(-lv, kind="stable")
            xs[si, :cnt] = x[lo:hi][order]
            ls[si, :cnt] = lv[order]
            es[si, :cnt] = (lo + order).astype(np.int32)
            vs[si, :cnt] = True

        mesh = self.mesh
        shard_sharding = NamedSharding(mesh, P(SHARD_AXIS))
        state = jax.jit(
            lambda: jax.tree.map(
                lambda a: jnp.broadcast_to(a[None], (s,) + a.shape),
                init_state(per_pad, self.cfg, self.levels_cap),
            ),
            out_shardings=jax.tree.map(lambda _: shard_sharding, _state_specs(
                init_state(0, self.cfg, self.levels_cap))),
        )()

        cfg, levels_cap = self.cfg, self.levels_cap
        specs = _state_specs(state)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state, xb, lb, eb, vb):
            def local(st, xb, lb, eb, vb):
                st = _strip(st)
                st = build_batch_impl(st, xb[0], lb[0], eb[0], vb[0], cfg, levels_cap)
                return _stack1(st)

            return shard_map(
                local,
                mesh=mesh,
                in_specs=(specs, P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS)),
                out_specs=specs,
            )(state, xb, lb, eb, vb)

        nb = per_pad // bsz
        for t in range(nb):
            lo, hi = t * bsz, (t + 1) * bsz
            state = step(
                state,
                jax.device_put(xs[:, lo:hi], shard_sharding),
                jax.device_put(ls[:, lo:hi], shard_sharding),
                jax.device_put(es[:, lo:hi], shard_sharding),
                jax.device_put(vs[:, lo:hi], shard_sharding),
            )
        self.state = state
        self._search_fn = None

    # ----------------------------------------------------------------- search
    def _make_search(self, k: int, ef: int):
        cfg, scfg, levels_cap = self.cfg, self.search_cfg, self.levels_cap
        mesh = self.mesh
        specs = _state_specs(self.state)
        qspec = P(DATA_AXIS) if self.n_data > 1 else P()

        @jax.jit
        def run(state, q):
            def local(st, q):
                st = _strip(st)
                s, ext, _ = search_state_impl(
                    st, q, k, cfg.metric, ef,
                    expand=scfg.expand, max_iters=scfg.max_iters,
                    max_upper_iters=scfg.max_upper_iters, levels_cap=levels_cap,
                    precision=cfg.precision,
                )
                return s[:, None, :], ext[:, None, :]   # [Bl, 1, k]

            s, ext = shard_map(
                local, mesh=mesh,
                in_specs=(specs, qspec),
                out_specs=(P(DATA_AXIS if self.n_data > 1 else None, SHARD_AXIS),
                           P(DATA_AXIS if self.n_data > 1 else None, SHARD_AXIS)),
            )(state, q)
            b = s.shape[0]
            s = s.reshape(b, -1)       # [B, S*k] — XLA all-gathers over ICI
            ext = ext.reshape(b, -1)
            # merge: smaller surrogate first; user scores for l2 ascend, for
            # dot/cosine descend — negate similarity to reuse ascending top-k
            key = s if cfg.metric == "l2" else -s
            mk, mi = T.smallest_k(key, ext, k)
            merged_s = mk if cfg.metric == "l2" else -mk
            return merged_s, mi

        return run

    def search(self, q, k: int, ef_search: Optional[int] = None):
        if self.state is None or self._n == 0:
            q = np.atleast_2d(np.asarray(q, np.float32))
            s = np.full((q.shape[0], k), np.inf if self.cfg.metric == "l2" else -np.inf)
            return jnp.asarray(s), jnp.full((q.shape[0], k), -1, jnp.int32)
        ef = ef_search if ef_search is not None else self.search_cfg.ef_search
        key = (k, ef)
        if self._search_fn is None or self._search_key != key:
            self._search_fn = self._make_search(k, ef)
            self._search_key = key
        q = jnp.atleast_2d(jnp.asarray(q, jnp.float32))
        return self._search_fn(self.state, q)
