"""E... LAPLACE s-domain sources (text-expansion extension)."""

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator
from circuitsimulator_tpu.netlist.laplace import expand_laplace


def node_eq(sim, name):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index


LP_DECK = """* first-order lowpass as a transfer function
V1 in 0 DC 1 AC 1
E1 out 0 LAPLACE in 0 1 / 1 1.59155e-4
Rl out 0 1k
.AC lin 1 1e3 1e3
.TRAN 5e-6 1e-3
.end
"""

# transient variant: a clean 0 -> 1 step (DC stays 0)
LP_STEP = LP_DECK.replace("V1 in 0 DC 1 AC 1",
                          "V1 in 0 PULSE(0 1 0 1e-9 1e-9 1 1)")


def test_dc_gain():
    sim = Simulator.from_text(LP_DECK)
    x = sim.dc(polish=True)
    assert float(x[node_eq(sim, "out")]) == pytest.approx(1.0, abs=1e-9)


def test_ac_pole():
    # tau = 1.59155e-4 -> f3dB = 1 kHz; |H| = 1/sqrt(2), phase -45 deg
    sim = Simulator.from_text(LP_DECK)
    res = sim.ac(freqs=np.asarray([1e3]))
    h = np.asarray(res.xs)[0, node_eq(sim, "out")]
    assert abs(h) == pytest.approx(1.0 / np.sqrt(2.0), rel=1e-6)
    assert np.angle(h, deg=True) == pytest.approx(-45.0, abs=0.01)


def test_transient_step_response():
    sim = Simulator.from_text(LP_STEP)
    res = sim.transient()
    v = np.asarray(res.xs)[:, node_eq(sim, "out")]
    t = np.asarray(res.times)
    want = 1.0 - np.exp(-t / 1.59155e-4)
    assert np.abs(v - want).max() < 0.02     # BE at tau/32


def test_second_order_bandpass():
    # H(s) = (s/Q w0) / (1 + s/(Q w0) + s^2/w0^2), w0 = 2pi*1k, Q = 5:
    # unity gain and 0 phase at resonance
    w0 = 2 * np.pi * 1e3
    q = 5.0
    b1 = 1.0 / (q * w0)
    a2 = 1.0 / w0**2
    deck = f"""* rlc-equivalent bandpass
V1 in 0 AC 1
E1 out 0 LAPLACE in 0 0 {b1:.9e} / 1 {b1:.9e} {a2:.9e}
Rl out 0 1k
.AC lin 3 900 1100
.end
"""
    sim = Simulator.from_text(deck)
    res = sim.ac(freqs=np.asarray([1e3, 2e3]))
    h0 = np.asarray(res.xs)[0, node_eq(sim, "out")]
    h2 = np.asarray(res.xs)[1, node_eq(sim, "out")]
    assert abs(h0) == pytest.approx(1.0, rel=1e-6)
    assert np.angle(h0, deg=True) == pytest.approx(0.0, abs=0.01)
    # analytic |H(2f0)| = 1/sqrt(1 + Q^2 (2-1/2)^2)
    want = 1.0 / np.hypot(1.0, q * 1.5)
    assert abs(h2) == pytest.approx(want, rel=1e-6)


def test_pure_gain_order_zero():
    sim = Simulator.from_text("""* gain
V1 in 0 DC 2
E1 out 0 LAPLACE in 0 3 / 1.5
Rl out 0 1k
.op
""")
    x = sim.dc(polish=True)
    assert float(x[node_eq(sim, "out")]) == pytest.approx(4.0, abs=1e-9)


def test_proper_transfer_with_direct_term():
    # highpass H(s) = s tau/(1+s tau): DC gain 0, HF gain 1
    deck = """* highpass
V1 in 0 DC 1 AC 1
E1 out 0 LAPLACE in 0 0 1e-4 / 1 1e-4
Rl out 0 1k
.AC lin 1 1e6 1e6
.end
"""
    sim = Simulator.from_text(deck)
    x = sim.dc(polish=True)
    assert float(x[node_eq(sim, "out")]) == pytest.approx(0.0, abs=1e-9)
    res = sim.ac(freqs=np.asarray([1e7]))
    assert abs(np.asarray(res.xs)[0, node_eq(sim, "out")]) == pytest.approx(
        1.0, rel=1e-4)


def test_bad_syntax_warns(capsys):
    out = expand_laplace("E1 out 0 LAPLACE in 0 1 2 3\n")
    assert "num / den" in capsys.readouterr().err
    assert out.strip() == "E1 out 0 LAPLACE in 0 1 2 3"


def test_brace_expr_coefficients():
    # coefficients may be {.PARAM exprs}; '/' inside braces is division
    deck = """* butterworth via params
.PARAM w0={2*pi*10k}
V1 in 0 AC 1
E1 out 0 LAPLACE in 0 1 / 1 {sqrt(2)/w0} {1/(w0*w0)}
Rl out 0 1k
.AC lin 1 1e4 1e4
.end
"""
    sim = Simulator.from_text(deck)
    res = sim.ac(freqs=np.asarray([1e4]))
    h = np.asarray(res.xs)[0, node_eq(sim, "out")]
    # Butterworth: |H(w0)| = 1/sqrt(2) exactly
    assert abs(h) == pytest.approx(1.0 / np.sqrt(2.0), rel=1e-6)


def test_leading_number_expr_not_truncated():
    # "1/(w0*w0)" must NOT parse as the bare number 1 (lenient-parser quirk)
    from circuitsimulator_tpu.netlist.laplace import _coeff
    assert _coeff("{1/(4*2)}", {}) == pytest.approx(0.125)
    assert _coeff("10k", {}) == pytest.approx(10000.0)
    assert _coeff("2meg", {}) == pytest.approx(2e6)


def test_g_form_current_output():
    # G LAPLACE follows the plain-VCCS convention: gm(s)*V(in) flows from
    # n+ through the source to n-, so with a load at n+ the voltage is
    # -H(s)*R*V(in).  Pure gain: V(out) = -gm*R*V(in)
    sim = Simulator.from_text("""* transimpedance
V1 in 0 DC 0.5
G1 out 0 LAPLACE in 0 2m / 1
Rl out 0 1k
.op
""")
    x = sim.dc(polish=True)
    ref = Simulator.from_text("""* plain vccs
V1 in 0 DC 0.5
G1 out 0 in 0 2m
Rl out 0 1k
.op
""")
    xr = ref.dc(polish=True)
    vo = float(x[node_eq(sim, "out")])
    vr = float(xr[node_eq(ref, "out")])
    assert vo == pytest.approx(vr, abs=1e-12)
    assert abs(vo) == pytest.approx(1.0, rel=1e-9)   # |gm*R*V| = 2m*1k*0.5


def test_g_form_dynamic():
    # first-order gm rolloff: at dc, |V(out)| = gm*R*V; well above the pole
    # the magnitude falls 20 dB/dec
    sim = Simulator.from_text("""* gm with pole
V1 in 0 AC 1
G1 out 0 LAPLACE in 0 1m / 1 1.59155e-5
Rl out 0 1k
.AC lin 1 1e5 1e5
.end
""")
    res = sim.ac(freqs=np.asarray([1e4, 1e5]))
    h4 = abs(np.asarray(res.xs)[0, node_eq(sim, "out")])
    h5 = abs(np.asarray(res.xs)[1, node_eq(sim, "out")])
    # pole at 10 kHz: |H(1e4)| = 1/sqrt(2), |H(1e5)| ~ 1/10.05 of gm*R
    assert h4 == pytest.approx(1.0 / np.sqrt(2.0), rel=1e-6)
    assert h5 == pytest.approx(1.0 / np.hypot(1, 10), rel=1e-6)
