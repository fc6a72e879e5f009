"""Diversity-first row reordering + truncated-degree search."""
import numpy as np

from zvdb_tpu import HNSW, HNSWConfig, SearchConfig, exact_ground_truth


def clustered(n, d, seed, nc=100):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((nc, d)).astype(np.float32)
    a = rng.integers(0, nc, n)
    return (centers[a] + 0.15 * rng.standard_normal((n, d))).astype(np.float32)


def test_diverse_rows_preserves_full_recall_and_helps_truncation(rng):
    n, d, k = 10000, 32, 10
    x = clustered(n, d, seed=1)
    q = (x[rng.integers(0, n, 200)]
         + 0.05 * rng.standard_normal((200, d))).astype(np.float32)
    _, gt = exact_ground_truth(x, q, k)

    def recall(idx, sd, anchors=0):
        idx.search_cfg = SearchConfig(search_degree=sd, seed_anchors=anchors)
        _, ids = idx.search(q, k, ef_search=64)
        ids = np.asarray(ids)
        return np.mean([len(set(ids[r]) & set(gt[r])) / k for r in range(200)])

    # The reordering matters for descent-only seeding on nearest-first rows
    # (the batched build's layout): truncation strips diversity edges and
    # recall collapses unless rows are reordered diversity-first. With anchor
    # seeding (the default) truncation no longer collapses — asserted below.
    plain = HNSW(HNSWConfig(dim=d, m=8, ef_construction=64, build_batch=2048,
                            build_mode="batched", diverse_rows=False))
    plain.build(x)
    div = HNSW(HNSWConfig(dim=d, m=8, ef_construction=64, build_batch=2048,
                          build_mode="batched", diverse_rows=True))
    div.build(x)

    # full-row search unaffected by the reordering
    assert abs(recall(plain, None) - recall(div, None)) < 0.05
    # truncated-degree search on descent-only seeding needs diverse rows
    r_plain = recall(plain, 8)
    r_div = recall(div, 8)
    assert r_div > r_plain + 0.05, f"diverse {r_div:.3f} vs plain {r_plain:.3f}"
    # anchor seeding rescues truncated search even on nearest-first rows
    r_anchor = recall(plain, 8, anchors=16)
    assert r_anchor >= r_div - 0.05, f"anchor-seeded truncated {r_anchor:.3f}"
