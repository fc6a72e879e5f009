"""filter_mode="auto" routing: scan below the crossover, beam/probe for
near-all-pass filters on huge corpora (utils/filter_policy.py).

The reference has no filtered search; this pins the round-5 policy: the
auto default must never change results below the measured crossover (it
resolves to the exact scan), and must route to the engine's sublinear mode
exactly in the (n >= N_CROSSOVER, selectivity >= SEL_NEAR_ALL) corner.
"""
import numpy as np
import pytest

from zvdb_tpu.utils import filter_policy as fp


class TestSelectivity:
    def test_bool_mask_host(self):
        m = np.zeros(100, bool)
        m[:25] = True
        assert fp.mask_selectivity(m, 100) == pytest.approx(0.25)

    def test_bool_mask_device(self):
        import jax.numpy as jnp

        m = jnp.arange(80) < 60
        assert fp.mask_selectivity(m, 80) == pytest.approx(0.75)

    def test_id_array(self):
        assert fp.mask_selectivity(np.arange(30), 100) == pytest.approx(0.3)
        assert fp.mask_selectivity([1, 2, 3], 10) == pytest.approx(0.3)

    def test_oversized_id_list_clamps(self):
        assert fp.mask_selectivity(np.arange(500), 100) == 1.0

    def test_empty_index(self):
        assert fp.mask_selectivity(np.zeros(0, bool), 0) == 1.0


class TestResolve:
    def test_explicit_passthrough(self):
        assert fp.resolve_filter_mode("scan", None, 10**9) == "scan"
        assert fp.resolve_filter_mode("beam", np.ones(10, bool), 10**9) == "beam"

    def test_no_filter_is_scan(self):
        assert fp.resolve_filter_mode("auto", None, 10**9) == "scan"

    def test_below_crossover_never_syncs(self):
        # a bool mask below the crossover must not be touched at all
        class Boom:
            dtype = np.bool_

            def __getitem__(self, _):
                raise AssertionError("selectivity estimated below crossover")

        out = fp.resolve_filter_mode("auto", Boom(), fp.N_CROSSOVER - 1)
        assert out == "scan"

    def test_near_all_pass_routes_to_alt(self):
        n = fp.N_CROSSOVER
        m = np.ones(n, bool)
        m[: int(n * (1 - fp.SEL_NEAR_ALL) / 2)] = False  # sel > threshold
        assert fp.resolve_filter_mode("auto", m, n, alt="beam") == "beam"
        assert fp.resolve_filter_mode("auto", m, n, alt="probe") == "probe"

    def test_selective_filter_stays_scan(self):
        n = fp.N_CROSSOVER
        m = np.zeros(n, bool)
        m[: n // 2] = True
        assert fp.resolve_filter_mode("auto", m, n) == "scan"


@pytest.mark.parametrize("engine", ["flatless_cagra", "ivf"])
def test_auto_equals_scan_small_corpus(engine, monkeypatch):
    """Below the crossover the auto default is bit-identical to scan."""
    from zvdb_tpu import CagraConfig, CagraIndex, IVFConfig, IVFIndex

    rng = np.random.default_rng(7)
    x = rng.standard_normal((600, 32)).astype(np.float32)
    q = rng.standard_normal((8, 32)).astype(np.float32)
    mask = rng.random(600) < 0.4
    if engine == "flatless_cagra":
        idx = CagraIndex(CagraConfig(dim=32, degree=8))
    else:
        idx = IVFIndex(IVFConfig(dim=32, n_clusters=16, nprobe=4))
    idx.build(x)
    s_a, i_a = idx.search(q, 5, allowed=mask)                      # auto
    s_s, i_s = idx.search(q, 5, allowed=mask, filter_mode="scan")  # explicit
    np.testing.assert_array_equal(np.asarray(i_a), np.asarray(i_s))
    np.testing.assert_allclose(np.asarray(s_a), np.asarray(s_s))


def test_auto_routes_probe_above_crossover(monkeypatch):
    """Shrink the crossover so a tiny corpus exercises the alt route."""
    from zvdb_tpu import IVFConfig, IVFIndex

    monkeypatch.setattr(fp, "N_CROSSOVER", 500)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((800, 16)).astype(np.float32)
    q = x[:4] + 0.01
    idx = IVFIndex(IVFConfig(dim=16, n_clusters=8, nprobe=8))
    idx.build(x)
    near_all = np.ones(800, bool)
    near_all[:8] = False  # sel ~0.99 >= SEL_NEAR_ALL
    s_auto, i_auto = idx.search(q, 3, allowed=near_all)
    s_probe, i_probe = idx.search(q, 3, allowed=near_all,
                                  filter_mode="probe")
    np.testing.assert_array_equal(np.asarray(i_auto), np.asarray(i_probe))
    # and a selective mask still takes the exact scan
    sel = np.zeros(800, bool)
    sel[:80] = True
    s_scan, i_scan = idx.search(q, 3, allowed=sel, filter_mode="scan")
    s_a2, i_a2 = idx.search(q, 3, allowed=sel)
    np.testing.assert_array_equal(np.asarray(i_a2), np.asarray(i_scan))
