"""Micro-batching search server: concurrent callers, correctness, shutdown."""
import threading

import numpy as np

from zvdb_tpu import FlatConfig, FlatIndex
from zvdb_tpu.serve import SearchServer


def test_server_batches_and_returns_correct_results(rng):
    x = rng.standard_normal((2000, 16)).astype(np.float32)
    idx = FlatIndex(FlatConfig(dim=16), capacity=2000)
    idx.add(x)
    with SearchServer(idx, k=1, max_batch=64, max_wait_ms=5.0) as srv:
        results = {}
        errs = []

        def worker(t):
            try:
                for j in range(25):
                    qi = (t * 25 + j) % 2000
                    s, i = srv.search(x[qi])
                    results[(t, j)] = (qi, int(i[0]))
            except Exception as e:  # pragma: no cover
                errs.append(e)

        threads = [threading.Thread(target=worker, args=(t,)) for t in range(8)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert not errs
        assert len(results) == 200
        acc = np.mean([qi == got for qi, got in results.values()])
        assert acc == 1.0  # exact engine: every query finds itself


def test_server_small_batch_flush_on_timeout(rng):
    x = rng.standard_normal((100, 8)).astype(np.float32)
    idx = FlatIndex(FlatConfig(dim=8), capacity=100)
    idx.add(x)
    srv = SearchServer(idx, k=2, max_batch=1024, max_wait_ms=1.0)
    try:
        s, i = srv.search(x[7], timeout=10)
        assert int(i[0]) == 7
    finally:
        srv.shutdown()


def test_server_propagates_errors(rng):
    class Broken:
        def search(self, q, k):
            raise ValueError("boom")

    srv = SearchServer(Broken(), k=1, max_wait_ms=1.0)
    try:
        fut = srv.submit(np.zeros(4, np.float32))
        try:
            fut.result(timeout=10)
            raise AssertionError("expected exception")
        except ValueError:
            pass
    finally:
        srv.shutdown()
