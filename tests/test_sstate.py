"""Periodic steady-state (.hb) via Newton shooting — self-consistent
validation per SURVEY.md §4.3 (no reference implementation exists)."""

import numpy as np
import pytest

from circuitsimulator_tpu.api import Simulator

INVERTER = (".MODEL 2 VT 0.4 MU 1e-2 COX 1e-3 LAMBDA 0.05 CJ0 1e-13\n"
            "VDD 1 0 3\nVin 2 0 SIN 1 0.5 1e8\nRD 1 3 1k\n"
            "M1 3 2 0 n 10e-6 1e-6 2\nC1 3 0 2e-13\n"
            ".TRAN 1e-11 1e-6\n.hb 1e8 5\n")


@pytest.fixture(scope="module")
def pss():
    sim = Simulator.from_text(INVERTER)
    return sim, sim.steady_state(steps_per_period=200, warmup_periods=5)


def test_pss_converges(pss):
    _, r = pss
    assert bool(r.converged)
    assert float(r.residual) < 1e-8


def test_pss_matches_settled_transient(pss):
    sim, r = pss
    # long transient (100 periods) ON THE SAME DISCRETIZATION the
    # shooting propagator uses (osc_engine: trap + lu + tight per-step
    # tol), compare its final period to the PSS one — the shooting
    # solution must be a fixed point of exactly that map
    import jax.numpy as jnp
    from circuitsimulator_tpu.utils.options import DEFAULT_OPTIONS
    opts = DEFAULT_OPTIONS.replace(dtype=jnp.float64, tran_method="trap",
                                   tran_solver="lu", tran_tol=1e-9)
    sim_t = Simulator.from_text(INVERTER, opts=opts)
    res = sim_t.transient(tstep=1e-8 / 200, tstop=100e-8)
    last = np.asarray(res.xs)[-200:]
    mine = np.asarray(r.xs)[1:]
    # 1e-9: the 100-period run is still settling at the few-1e-10 level
    np.testing.assert_allclose(mine, last, atol=1e-9, rtol=0)


def test_pss_is_periodic(pss):
    _, r = pss
    xs = np.asarray(r.xs)
    # first and last sample of the period are the same state
    np.testing.assert_allclose(xs[0], xs[-1], atol=1e-8)


def test_pss_spectrum(pss):
    sim, r = pss
    spec = np.asarray(r.spectrum)
    freqs = np.asarray(r.freqs)
    assert freqs[1] == pytest.approx(1e8)
    v3 = sim.topo.volt_col_names.index("3")
    eq = sim.topo.volt_col_eqs[v3]
    # DC term ~ the operating point, fundamental nonzero, harmonics decay
    assert abs(spec[0, eq]) > 2.0
    assert abs(spec[1, eq]) > 1e-3
    assert abs(spec[3, eq]) < abs(spec[1, eq])


def test_pss_linear_rc():
    # linear RC low-pass driven at f0: PSS must match the analytic phasor
    R, C, f0 = 1e3, 1e-9, 1e6
    sim = Simulator.from_text(
        f"V1 1 0 SIN 0 1 {f0}\nR1 1 2 {R}\nC1 2 0 {C}\n.hb {f0} 3\n")
    r = sim.steady_state(steps_per_period=400, warmup_periods=10)
    assert bool(r.converged)
    spec = np.asarray(r.spectrum)
    w = 2 * np.pi * f0
    h_analytic = 1.0 / (1 + 1j * w * R * C)
    eq2 = 1  # node 2
    # BE at 400 steps/period has a few-percent amplitude error
    assert abs(spec[1, eq2]) == pytest.approx(abs(h_analytic), rel=0.05)


def test_pss_dbmixer():
    """Config #3 (BASELINE.md): steady state on dbmixer.sp with its periodic
    drive (.hb 100e6 50 -> 10 ns common period of the 900/800/600 MHz
    tones)."""
    sim = Simulator.from_file("tests/netlists/dbmixer.sp")
    r = sim.steady_state(steps_per_period=512, warmup_periods=6,
                         max_newton=12, n_harm=10)
    assert bool(r.converged)
    xs = np.asarray(r.xs)
    assert np.all(np.isfinite(xs))
    # periodicity of the full state trajectory
    np.testing.assert_allclose(xs[0], xs[-1], atol=1e-7)
    # the IF output nodes (102/103) carry mixing products, i.e. nonzero
    # harmonic content beyond DC
    spec = np.asarray(r.spectrum)
    eq102 = sim.topo.volt_col_eqs[sim.topo.volt_col_names.index("102")]
    assert abs(spec[0, eq102]) > 2.0          # DC bias ~2.85 V
    assert np.max(np.abs(spec[1:, eq102])) > 1e-3


def test_hb_card_missing_raises():
    sim = Simulator.from_text("R1 1 0 1\nV1 1 0 1\n.op\n")
    with pytest.raises(ValueError):
        sim.steady_state()
