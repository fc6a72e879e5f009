"""Pallas fused scan kernel — interpret-mode correctness (compiled path is
exercised on real TPU hardware by the bench; CPU CI uses the interpreter)."""
import numpy as np
import pytest

import jax.numpy as jnp

from zvdb_tpu.ops.pallas_scan import flat_topk_pallas


def test_pallas_scan_exact_l2(rng):
    n, d, b, k = 3000, 32, 64, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    s, i = flat_topk_pallas(
        jnp.asarray(q), jnp.asarray(x), k, interpret=True, chunk=512, q_tile=32
    )
    i = np.asarray(i)
    d2 = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d2, axis=1)[:, :k]
    assert np.mean([set(i[r]) == set(gt[r]) for r in range(b)]) == 1.0


def test_pallas_scan_dot_and_padding(rng):
    # n not divisible by chunk; b not divisible by q_tile; dot metric
    n, d, b, k = 777, 16, 33, 5
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    s, i = flat_topk_pallas(
        jnp.asarray(q), jnp.asarray(x), k, metric="dot",
        interpret=True, chunk=256, q_tile=32,
    )
    i = np.asarray(i)
    gt = np.argsort(-(q @ x.T), axis=1)[:, :k]
    assert np.mean([set(i[r]) == set(gt[r]) for r in range(b)]) == 1.0
    assert (i >= 0).all() and (i < n).all()


def test_pallas_scan_v2_exact(rng):
    import jax.numpy as jnp

    from zvdb_tpu.ops.pallas_scan2 import flat_topk_pallas2

    n, d, b, k = 3000, 32, 64, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    s, i = flat_topk_pallas2(
        jnp.asarray(q), jnp.asarray(x), k, interpret=True, chunk=512, q_tile=32
    )
    i = np.asarray(i)
    d2 = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d2, axis=1)[:, :k]
    assert np.mean([set(i[r]) == set(gt[r]) for r in range(b)]) == 1.0
