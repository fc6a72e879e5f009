"""Dataset parsing (TEXMEX formats), native loader fallback, synthetic generators."""
import struct

import numpy as np

from zvdb_tpu.io import datasets
from zvdb_tpu.io.native_loader import exact_knn_cpu


def _write_fvecs(path, x):
    with open(path, "wb") as f:
        for row in x:
            f.write(struct.pack("<i", x.shape[1]))
            f.write(np.asarray(row, np.float32).tobytes())


def _write_ivecs(path, x):
    with open(path, "wb") as f:
        for row in x:
            f.write(struct.pack("<i", x.shape[1]))
            f.write(np.asarray(row, np.int32).tobytes())


def test_fvecs_roundtrip(tmp_path, rng):
    x = rng.standard_normal((50, 24)).astype(np.float32)
    p = str(tmp_path / "x.fvecs")
    _write_fvecs(p, x)
    np.testing.assert_array_equal(datasets.read_fvecs(p), x)
    np.testing.assert_array_equal(datasets.read_fvecs(p, max_rows=10), x[:10])


def test_ivecs_roundtrip(tmp_path, rng):
    x = rng.integers(0, 1000, (30, 10)).astype(np.int32)
    p = str(tmp_path / "x.ivecs")
    _write_ivecs(p, x)
    np.testing.assert_array_equal(datasets.read_ivecs(p), x)


def test_bvecs_roundtrip(tmp_path, rng):
    x = rng.integers(0, 256, (20, 8)).astype(np.uint8)
    p = str(tmp_path / "x.bvecs")
    with open(p, "wb") as f:
        for row in x:
            f.write(struct.pack("<i", 8))
            f.write(row.tobytes())
    np.testing.assert_array_equal(datasets.read_bvecs(p), x)


def test_synthetic_determinism():
    a = datasets.synthetic_clustered(100, 16, seed=3)
    b = datasets.synthetic_clustered(100, 16, seed=3)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (100, 16) and a.dtype == np.float32


def test_load_dataset_fallback(tmp_path):
    # no files present -> synthetic stand-in with the right shape/metric
    x, q, gt, metric = datasets.load_dataset("sift1m", data_dir=str(tmp_path),
                                             max_rows=500)
    assert x.shape == (500, 128) and metric == "l2" and gt is None
    x, q, gt, metric = datasets.load_dataset("glove", data_dir=str(tmp_path),
                                             max_rows=200)
    assert x.shape == (200, 100) and metric == "cosine"


def test_load_dataset_real_files(tmp_path, rng):
    x = rng.standard_normal((40, 128)).astype(np.float32)
    q = rng.standard_normal((5, 128)).astype(np.float32)
    _write_fvecs(str(tmp_path / "sift_base.fvecs"), x)
    _write_fvecs(str(tmp_path / "sift_query.fvecs"), q)
    xb, qb, gt, metric = datasets.load_dataset("sift1m", data_dir=str(tmp_path))
    np.testing.assert_allclose(xb, x)
    np.testing.assert_allclose(qb, q)


def test_native_exact_knn_matches_numpy(rng):
    x = rng.standard_normal((300, 16)).astype(np.float32)
    q = rng.standard_normal((7, 16)).astype(np.float32)
    res = exact_knn_cpu(x, q, 5)
    if res is None:  # toolchain unavailable — numpy fallback path is tested elsewhere
        return
    s, i = res
    d = ((q[:, None] - x[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(i, np.argsort(d, axis=1, kind="stable")[:, :5])


def test_lowlid_generator_and_lid_estimator():
    """The LID-matched protocol (VERDICT r4 item 7): the low-LID mixture must
    read a Levina-Bickel MLE far below ambient dim and below the isotropic
    stand-in, and the generator must be deterministic + query-compatible."""
    # small but population-per-cluster > estimator k (docstring requirement)
    x = datasets.synthetic_lowlid(8000, 64, subdim=8, n_clusters=40, seed=5)
    assert x.shape == (8000, 64) and x.dtype == np.float32
    np.testing.assert_array_equal(
        x, datasets.synthetic_lowlid(8000, 64, subdim=8, n_clusters=40, seed=5))
    lid_low = datasets.estimate_lid(x, k=20, n_sample=400)
    iso = datasets.synthetic_clustered(8000, 64, n_clusters=40, seed=5)
    lid_iso = datasets.estimate_lid(iso, k=20, n_sample=400)
    assert lid_low < 16, lid_low          # reads near subdim, not ambient 64
    assert lid_low < 0.6 * lid_iso, (lid_low, lid_iso)
    q = datasets.lowlid_queries(32, 64, subdim=8, n_clusters=40, seed=5)
    assert q.shape == (32, 64) and q.dtype == np.float32
