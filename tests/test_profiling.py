"""Profiling / observability utilities (SURVEY.md §5)."""
import numpy as np

from zvdb_tpu.utils.profiling import Phase, PhaseRecorder, live_buffer_bytes


def test_phase_timer():
    with Phase("x") as p:
        _ = sum(range(1000))
    assert p.elapsed_s is not None and p.elapsed_s >= 0


def test_phase_recorder():
    rec = PhaseRecorder()
    for _ in range(3):
        with rec.phase("work", sync=False):
            pass
    rep = rec.report()
    assert rep["work"]["count"] == 3
    assert rep["work"]["total_s"] >= 0


def test_live_buffer_bytes_grows():
    import jax.numpy as jnp

    before = live_buffer_bytes()
    x = jnp.ones((1024, 1024), jnp.float32)
    x.block_until_ready()
    after = live_buffer_bytes()
    assert after >= before + 4 * 1024 * 1024
    del x
