"""Benchmark harness: result schema (reference BenchmarkResult parity,
shared_benchmarks.zig:4-50) and the host ground-truth oracle."""
import json

import numpy as np

from zvdb_tpu.bench.harness import (
    BenchmarkResult, ground_truth_host, random_points, recall_at_k,
)


def test_benchmark_result_schema_and_csv():
    r = BenchmarkResult(
        operation="search", num_points=1000, dimensions=128, num_queries=100,
        k=10, num_devices=1, total_time_ns=5_000_000, ops_per_sec=20000.0,
        recall=0.97, ef=64,
    )
    d = json.loads(r.to_json())
    # the reference schema fields (num_threads -> num_devices) + our additions
    for field in ("operation", "num_points", "dimensions", "num_queries", "k",
                  "num_devices", "total_time_ns", "ops_per_sec", "recall", "ef"):
        assert field in d
    csv = r.to_csv()
    assert csv.count(",") == len(d) - 1
    assert "search" in str(r) and "recall@10" in str(r)


def test_ground_truth_host_matches_numpy(rng):
    x = rng.standard_normal((300, 16)).astype(np.float32)
    q = rng.standard_normal((7, 16)).astype(np.float32)
    s, ids = ground_truth_host(x, q, 5)
    d = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(ids, np.argsort(d, 1, kind="stable")[:, :5])
    np.testing.assert_allclose(s, np.sort(d, 1)[:, :5], rtol=1e-4)


def test_ground_truth_host_cosine(rng):
    x = rng.standard_normal((200, 8)).astype(np.float32)
    q = rng.standard_normal((4, 8)).astype(np.float32)
    s, ids = ground_truth_host(x, q, 3, metric="cosine")
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sim = qn @ xn.T
    np.testing.assert_array_equal(ids, np.argsort(-sim, 1, kind="stable")[:, :3])
    assert (np.diff(s, axis=1) <= 1e-6).all()  # similarity descending


def test_recall_at_k_and_random_points(rng):
    gt = np.array([[1, 2, 3], [4, 5, 6]])
    ids = np.array([[1, 2, 9], [4, 5, 6]])
    assert abs(recall_at_k(ids, gt, 3) - 5 / 6) < 1e-9
    p = random_points(rng, 10, 4)
    assert p.shape == (10, 4) and p.dtype == np.float32
    assert (p >= 0).all() and (p < 1).all()  # reference uses uniform [0,1)
