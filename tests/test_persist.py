"""Save/load round-trip (persistence is absent in the reference — SURVEY.md §5)."""
import numpy as np

from zvdb_tpu import HNSW, HNSWConfig


def test_save_load_roundtrip(tmp_path, rng):
    x = rng.standard_normal((1500, 24)).astype(np.float32)
    idx = HNSW(HNSWConfig(dim=24, m=8, ef_construction=48, build_batch=512))
    idx.build(x)
    q = rng.standard_normal((16, 24)).astype(np.float32)
    s0, i0 = idx.search(q, 5)

    path = str(tmp_path / "index.npz")
    idx.save(path)
    loaded = HNSW.load(path)

    assert len(loaded) == len(idx)
    s1, i1 = loaded.search(q, 5)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-6)

    # loaded index remains mutable
    loaded.insert(rng.standard_normal(24).astype(np.float32))
    assert len(loaded) == 1501
    loaded.search(q, 5)


def test_save_load_empty(tmp_path):
    idx = HNSW(HNSWConfig(dim=8))
    path = str(tmp_path / "empty.npz")
    idx.save(path)
    loaded = HNSW.load(path)
    s, i = loaded.search(np.zeros(8, np.float32), 3)
    assert (np.asarray(i) == -1).all()
