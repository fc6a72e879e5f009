"""Multi-slice (DCN-aware) mesh layout — parallel/mesh.py:make_hybrid_mesh.

The reference's entire scale story is threads + mutexes in one address space
(reference src/hnsw.zig:6,50); the TPU deployment story has to say where each
mesh axis physically lives. These tests pin the layout contract: `data`
(query fan-out) is the OUTER/DCN axis, `shard` (corpus partition, where the
all-gather top-k merges happen) is the INNER/ICI axis, and the sharded
engines run unchanged on the result.
"""
import numpy as np
import pytest

from zvdb_tpu.bench.harness import recall_at_k
from zvdb_tpu.index.flat import exact_ground_truth
from zvdb_tpu.parallel.mesh import (
    DATA_AXIS, SHARD_AXIS, _group_by_slice, make_hybrid_mesh,
)

# compile-heavy multi-device tier — deselect with -m 'not slow' (fast gate)
pytestmark = pytest.mark.slow


class _Dev:
    def __init__(self, slice_index):
        self.slice_index = slice_index


def _need8():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")


def test_group_by_slice_uses_runtime_slice_index():
    devs = [_Dev(1), _Dev(0), _Dev(1), _Dev(0)]
    g = _group_by_slice(devs)
    assert set(g) == {0, 1} and all(len(v) == 2 for v in g.values())
    # CPU devices (no slice_index attr) and slice_index=None land in slice 0
    assert set(_group_by_slice([object(), _Dev(None)])) == {0}


def test_uneven_slices_rejected():
    with pytest.raises(ValueError, match="uneven"):
        make_hybrid_mesh(devices=[_Dev(0), _Dev(0), _Dev(1)])


def test_single_slice_requires_n_slices():
    _need8()
    with pytest.raises(ValueError, match="n_slices"):
        make_hybrid_mesh()


def test_fallback_layout_data_outer_shard_inner():
    _need8()
    mesh = make_hybrid_mesh(n_slices=2)
    assert mesh.axis_names == (DATA_AXIS, SHARD_AXIS)
    assert mesh.shape[DATA_AXIS] == 2 and mesh.shape[SHARD_AXIS] == 4
    with pytest.raises(ValueError, match="divisible"):
        make_hybrid_mesh(n_slices=3)


def test_sharded_engine_on_hybrid_mesh(rng):
    _need8()
    from zvdb_tpu import FlatConfig
    from zvdb_tpu.parallel.sharded_flat import ShardedFlat

    n, d, k = 4000, 16, 5
    x = rng.standard_normal((n, d)).astype(np.float32)
    idx = ShardedFlat(FlatConfig(dim=d), mesh=make_hybrid_mesh(n_slices=2))
    idx.build(x)
    q = (x[rng.integers(0, n, 64)]
         + 0.02 * rng.standard_normal((64, d))).astype(np.float32)
    _, gt = exact_ground_truth(x, q, k)
    _, ids = idx.search(q, k, approx=False)
    assert recall_at_k(np.asarray(ids), gt, k) >= 0.99
