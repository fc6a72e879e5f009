"""Historical Pallas scan kernels (examples/pallas_scan_v1.py / _v2.py) —
interpret-mode correctness. These were the first two fused-scan attempts,
superseded by ops/pallas_topk.py (see its docstring for the post-mortem);
they live under examples/ as documented history, and this file keeps their
measurements reproducible."""
import importlib.util
import os

import numpy as np
import pytest

import jax.numpy as jnp

_EX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "examples")


def _load(name, fname):
    spec = importlib.util.spec_from_file_location(name,
                                                  os.path.join(_EX, fname))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_pallas_scan_exact_l2(rng):
    flat_topk_pallas = _load("pallas_scan_v1", "pallas_scan_v1.py").flat_topk_pallas
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


def test_pallas_scan_v2_exact(rng):
    flat_topk_pallas2 = _load("pallas_scan_v2", "pallas_scan_v2.py").flat_topk_pallas2
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
