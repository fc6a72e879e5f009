"""Build checkpoint/resume (failure recovery — absent in the reference,
SURVEY.md §5)."""
import numpy as np

from zvdb_tpu import HNSW, HNSWConfig


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
