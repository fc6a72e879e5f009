"""Build checkpoint/resume (failure recovery — absent in the reference,
SURVEY.md §5)."""
import numpy as np

from zvdb_tpu import HNSW, HNSWConfig, IVFConfig, IVFIndex


def test_checkpoint_resume_matches_direct_build(tmp_path, rng):
    x = rng.standard_normal((1200, 16)).astype(np.float32)
    # checkpoint/resume exists only for the batched build (the oneshot build
    # has no mid-build state to snapshot) — pin the mode so `direct` uses the
    # same path as the checkpointed build
    cfg = HNSWConfig(dim=16, m=8, ef_construction=32, build_batch=256,
                     build_mode="batched")
    ckpt = str(tmp_path / "build.ckpt.npz")

    direct = HNSW(cfg, seed=5)
    direct.build(x)

    # checkpointed build: snapshot every 2 batches, then resume from the file
    partial = HNSW(cfg, seed=5)
    partial.build(x, checkpoint_path=ckpt, checkpoint_every=2)
    resumed = HNSW.resume_build(ckpt)

    assert len(resumed) == 1200
    # resumed build completes and produces a working index
    q = x[:64]
    s, i = resumed.search(q, 1, ef_search=64)
    assert (np.asarray(i)[:, 0] == np.arange(64)).mean() >= 0.95
    # determinism: the checkpoint came from the same seeded build, so the
    # finished graphs match exactly
    np.testing.assert_array_equal(
        np.asarray(direct.state.nbr0), np.asarray(partial.state.nbr0)
    )
    np.testing.assert_array_equal(
        np.asarray(partial.state.nbr0), np.asarray(resumed.state.nbr0)
    )


def test_oneshot_checkpoint_resume_identical(tmp_path, rng):
    """Oneshot build: base-layer snapshot; resume replays the epilogue from
    the saved key, so the resumed index is bit-identical to the direct one."""
    x = rng.standard_normal((1500, 16)).astype(np.float32)
    cfg = HNSWConfig(dim=16, m=8, ef_construction=32, build_batch=512,
                     build_mode="oneshot")
    ckpt = str(tmp_path / "oneshot.ckpt.npz")

    direct = HNSW(cfg, seed=7)
    direct.build(x)
    ck = HNSW(cfg, seed=7)
    ck.build(x, checkpoint_path=ckpt)         # writes the base-layer snapshot
    resumed = HNSW.resume_build(ckpt)         # "crash" after the snapshot

    assert len(resumed) == 1500
    for f in ("nbr0", "nbrU", "entry", "max_level", "a_rows", "levels"):
        np.testing.assert_array_equal(
            np.asarray(getattr(direct.state, f)),
            np.asarray(getattr(resumed.state, f)), err_msg=f,
        )
    s, i = resumed.search(x[:64], 1, ef_search=48)
    assert (np.asarray(i)[:, 0] == np.arange(64)).mean() >= 0.95


def test_ivf_plan_checkpoint_resume_identical(tmp_path, rng):
    """IVF build (10M-shape config scaled down: int8 residual codes +
    rerank shadows): the plan checkpoint captures the randomized phases;
    resume reruns only the deterministic pack -> identical state."""
    nc = 30
    centers = rng.standard_normal((nc, 24)).astype(np.float32)
    x = (centers[rng.integers(0, nc, 4000)]
         + 0.1 * rng.standard_normal((4000, 24))).astype(np.float32)
    cfg = IVFConfig(dim=24, n_clusters=64, nprobe=4, dtype="int8", rerank=4)
    ckpt = str(tmp_path / "ivf.ckpt.npz")

    direct = IVFIndex(cfg)
    direct.build(x, checkpoint_path=ckpt)
    resumed = IVFIndex.resume_build(ckpt)

    assert len(resumed) == 4000
    for f in ("centroids", "blocks", "b_norms", "b_scales", "b_ids", "counts",
              "rerank_norms"):
        np.testing.assert_array_equal(
            np.asarray(getattr(direct.state, f)),
            np.asarray(getattr(resumed.state, f)), err_msg=f,
        )
    s, i = resumed.search(x[:64], 1)
    assert (np.asarray(i)[:, 0] == np.arange(64)).mean() >= 0.9
