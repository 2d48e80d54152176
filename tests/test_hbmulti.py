"""Multi-tone harmonic balance (analysis/hbmulti.py): linear closed-form
check, transient cross-validation on a nonlinear circuit, mixer smoke."""

import numpy as np
import jax.numpy as jnp
import pytest

from circuitsimulator_tpu.api import Simulator
from circuitsimulator_tpu.analysis.hbmulti import (
    harmonic_balance_multi, assign_tones, coeff, evaluate)
from circuitsimulator_tpu.utils.options import DEFAULT_OPTIONS

F64 = DEFAULT_OPTIONS.replace(dtype=jnp.float64)


def test_two_tone_linear_rc_closed_form():
    """Two sources at f1/f2 through resistors into a shared RC node: the HB
    grid solution must equal the phasor superposition exactly (linear
    circuit, band-limited -> spectral method is exact)."""
    f1, f2 = 1e6, 2.3e6
    A1, A2 = 1.0, 0.5
    net = f"""\
V1 a 0 SIN 0 {A1} {f1}
V2 b 0 SIN 0 {A2} {f2}
Ra a out 1k
Rb b out 2k
C1 out 0 1n
"""
    sim = Simulator.from_text(net, opts=F64)
    res = harmonic_balance_multi(sim.engine, sim.params,
                                 [(f1, 3), (f2, 3)], tol=1e-12)
    assert bool(res.converged)
    out_eq = sim.circuit.nodes[sim.circuit.node_name_to_id["out"]].eq_index

    def transfer(f, r_src, r_other):
        zc = 1.0 / (2j * np.pi * f * 1e-9)
        zpar = 1.0 / (1.0 / r_other + 1.0 / zc)
        return zpar / (r_src + zpar)

    # coefficient of e^{j w1 t}: A1 sin -> A1/(2j) * H1(f1)
    c10 = np.asarray(coeff(res, (1, 0)))[out_eq]
    c01 = np.asarray(coeff(res, (0, 1)))[out_eq]
    np.testing.assert_allclose(c10, A1 / 2j * transfer(f1, 1e3, 2e3),
                               rtol=1e-9, atol=1e-15)
    np.testing.assert_allclose(c01, A2 / 2j * transfer(f2, 2e3, 1e3),
                               rtol=1e-9, atol=1e-15)
    # no intermodulation in a linear circuit
    c11 = np.asarray(coeff(res, (1, 1)))[out_eq]
    assert abs(c11) < 1e-12
    # conjugate symmetry of the real-signal spectrum
    cm10 = np.asarray(coeff(res, (-1, 0)))[out_eq]
    np.testing.assert_allclose(cm10, np.conj(c10), rtol=1e-12)
    # waveform reconstruction at arbitrary t equals the analytic signal
    tprobe = np.array([0.0, 1.234e-7, 7.7e-7])
    xt = np.asarray(evaluate(res, jnp.asarray(tprobe)))[:, out_eq]
    analytic = (A1 * np.abs(transfer(f1, 1e3, 2e3))
                * np.sin(2 * np.pi * f1 * tprobe
                         + np.angle(transfer(f1, 1e3, 2e3)))
                + A2 * np.abs(transfer(f2, 2e3, 1e3))
                * np.sin(2 * np.pi * f2 * tprobe
                         + np.angle(transfer(f2, 2e3, 1e3))))
    np.testing.assert_allclose(xt, analytic, rtol=1e-9, atol=1e-12)


def test_two_tone_diode_vs_transient():
    """Nonlinear cross-check: a diode detector driven by two tones — the HB
    waveform evaluated on the physical diagonal x(t) = x^(t, t) must match
    the settled transient."""
    f1, f2 = 1e7, 2.3e7
    net = f"""\
V1 in 0 SIN 0.4 0.35 {f1}
V2 in2 0 SIN 0 0.25 {f2}
R12 in2 in 500
Rs in a 100
D1 a 0 IS=1e-12 N=1
C1 a 0 20p
.TRAN 1e-10 1.2e-6
"""
    sim = Simulator.from_text(net, opts=F64)
    tr = sim.transient()
    ts = np.asarray(tr.times)
    xs = np.asarray(tr.xs)
    late = ts > 0.9e-6          # several RC settle times in
    scale = np.abs(xs[late]).max()
    errs = {}
    for H in (6, 10):
        res = harmonic_balance_multi(sim.engine, sim.params,
                                     [(f1, H), (f2, H)], tol=1e-10)
        assert bool(res.converged)
        xh = np.asarray(evaluate(res, jnp.asarray(ts[late])))
        errs[H] = np.abs(xh - xs[late]).max() / scale
    assert errs[10] < 3e-3                  # matches the settled transient
    assert errs[10] < errs[6] / 2           # and converges spectrally in H


def test_assign_tones_and_errors():
    from circuitsimulator_tpu.netlist.circuit import WAVE_SIN, WAVE_PULSE
    kinds = np.array([WAVE_SIN, WAVE_SIN, 0, WAVE_SIN])
    sin = np.zeros((4, 5))
    sin[:, 2] = [9e8, 8e8, 0.0, 18e8]   # 18e8 = 2nd harmonic of tone 0
    a = assign_tones(kinds, sin, [9e8, 8e8])
    assert list(a) == [0, 1, -1, 0]
    with pytest.raises(ValueError, match="not a harmonic"):
        assign_tones(np.array([WAVE_SIN]),
                     np.array([[0, 1, 7.77e8, 0, 0.0]]), [9e8, 8e8])
    with pytest.raises(ValueError, match="DC and SIN"):
        assign_tones(np.array([WAVE_PULSE]), np.zeros((1, 5)), [9e8])


@pytest.mark.slow
def test_dbmixer_three_tone_smoke():
    """3-tone MPDE HB on the bundled Gilbert mixer: converges, and the
    900-800 MHz intermodulation product (the IF) is present."""
    sim = Simulator.from_file("tests/netlists/dbmixer.sp", opts=F64)
    res = sim.harmonic_balance(tones=[(900e6, 4), (800e6, 1), (600e6, 1)],
                               tol=1e-7, max_newton=15)
    assert np.isfinite(float(res.residual))
    assert bool(res.converged)
    # differential tank output nodes
    eq = {n: sim.circuit.nodes[sim.circuit.node_name_to_id[n]].eq_index
          for n in ("102", "103")}
    c_if = np.asarray(coeff(res, (1, -1, 0)))
    v_if = abs(c_if[eq["102"]] - c_if[eq["103"]])
    assert v_if > 1e-5          # down-converted 100 MHz product exists
