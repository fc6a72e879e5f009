"""Recall@k vs brute-force ground truth — the measurement the reference never
makes (BASELINE.md: "Recall@k — never measured anywhere in the repo")."""
import numpy as np
import pytest

from zvdb_tpu import HNSW, HNSWConfig, exact_ground_truth


def recall_at_k(ids, gt_ids, k):
    return np.mean(
        [len(set(ids[r, :k]) & set(gt_ids[r, :k])) / k for r in range(ids.shape[0])]
    )


@pytest.mark.parametrize("metric", ["l2", "cosine"])
def test_recall_10k_random(rng, metric):
    # BASELINE.json config 1: 10k random 128d, k=10 (scaled dims for CI speed)
    n, d, nq, k = 10000, 64, 200, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((nq, d)).astype(np.float32)
    _, gt = exact_ground_truth(x, q, k, metric=metric)
    idx = HNSW(HNSWConfig(dim=d, m=16, ef_construction=100, metric=metric,
                          build_batch=1024))
    idx.build(x)
    _, ids = idx.search(q, k, ef_search=128)
    r = recall_at_k(np.asarray(ids), gt, k)
    assert r >= 0.90, f"recall@10 {r:.3f} below floor"


def test_recall_improves_with_ef(rng):
    n, d, nq, k = 5000, 32, 100, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((nq, d)).astype(np.float32)
    _, gt = exact_ground_truth(x, q, k)
    idx = HNSW(HNSWConfig(dim=d, m=16, ef_construction=100, build_batch=1024))
    idx.build(x)
    rs = []
    for ef in (16, 64, 192):
        _, ids = idx.search(q, k, ef_search=ef)
        rs.append(recall_at_k(np.asarray(ids), gt, k))
    assert rs[0] < rs[-1] or rs[-1] > 0.98
    assert rs[-1] >= 0.93


def test_dot_metric_recall(rng):
    n, d, nq, k = 4000, 48, 100, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((nq, d)).astype(np.float32)
    _, gt = exact_ground_truth(x, q, k, metric="dot")
    idx = HNSW(HNSWConfig(dim=d, m=16, ef_construction=100, metric="dot",
                          build_batch=1024))
    idx.build(x)
    s, ids = idx.search(q, k, ef_search=128)
    r = recall_at_k(np.asarray(ids), gt, k)
    assert r >= 0.85, f"dot recall@10 {r:.3f}"
    # scores are similarities (higher better), descending
    s = np.asarray(s)
    assert (np.diff(s, axis=1) <= 1e-5).all()
