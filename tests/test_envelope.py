"""Envelope-following transient (analysis/envelope.py).

Anchors:
- a pure-carrier deck's envelope is t1-invariant and equals plain HB;
- a memoryless AM deck tracks frozen-slow-source harmonic balance
  point-for-point (with C=0 the quasi-static limit is exact, so the
  envelope step IS a static HB solve at vb(t1));
- an AM step into an RC matches the discrete backward-Euler complex
  envelope recurrence to solver tolerance AND the continuous closed
  form Y(t) = Yinf + (Y0-Yinf)e^{-(1+j w0 RC)t/RC} to O(dt).
"""

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator
from circuitsimulator_tpu.analysis.hb import harmonic_balance
from circuitsimulator_tpu.analysis.sweep import find_source


F0 = 1e6


def _eq(sim, node):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[node]].eq_index


def test_pure_carrier_is_t1_invariant():
    sim = Simulator.from_text(f"""* carrier only
V1 in 0 SIN 0 0.8 {F0}
R1 in out 100
B1 out 0 I=0.3*v(out)^3
R2 out 0 200
.op
""")
    res = sim.envelope(t_stop=2e-6, dt_env=5e-7, f0=F0, n_harm=5)
    assert res.converged.all()
    eq = _eq(sim, "out")
    hb = harmonic_balance(sim.engine, sim.params, F0, n_harm=5)
    for n in range(len(res.t1)):
        np.testing.assert_allclose(res.coeffs[n, :, eq],
                                   np.asarray(hb.spectrum)[:, eq],
                                   atol=1e-8)


def test_dc_offset_carrier_keeps_bias():
    """'V1 in 0 DC 2 SIN(...)' — the source's DC term is slow but must
    NOT be dropped when the SIN rides the fast axis: the envelope's
    harmonic-0 coefficient must match plain HB (which sees dc + sin)."""
    sim = Simulator.from_text(f"""* biased carrier
V1 in 0 DC 2 SIN 0 0.8 {F0}
R1 in out 100
B1 out 0 I=0.3*v(out)^3
R2 out 0 200
.op
""")
    res = sim.envelope(t_stop=2e-6, dt_env=5e-7, f0=F0, n_harm=5)
    assert res.converged.all()
    eq = _eq(sim, "out")
    hb = harmonic_balance(sim.engine, sim.params, F0, n_harm=5)
    # the bias makes harmonic 0 strongly nonzero; envelope == HB per step
    assert abs(np.asarray(hb.spectrum)[0, eq]) > 0.3
    for n in range(len(res.t1)):
        np.testing.assert_allclose(res.coeffs[n, :, eq],
                                   np.asarray(hb.spectrum)[:, eq],
                                   atol=1e-7)


def test_nonharmonic_fast_sin_warns():
    """A SIN at 0.7*f0 is fast-classified (>= f0/2) but not T-periodic
    on the fast grid — it aliases, so the classifier must warn."""
    sim = Simulator.from_text(f"""* off-grid carrier
V1 in 0 SIN 0 1 {0.7 * F0}
R1 in 0 1k
.op
""")
    with pytest.warns(UserWarning, match="not harmonics"):
        sim.envelope(t_stop=1e-6, dt_env=5e-7, f0=F0, n_harm=3)


def test_memoryless_am_tracks_quasi_static_hb():
    sim = Simulator.from_text(f"""* AM into a cubic
Vc carr 0 SIN 0 1 {F0}
Rc carr 0 1k
Vb base 0 PWL(0 0.2 5e-6 1.0)
Rb base 0 1k
Bm m 0 V=v(base)*v(carr)
Rl m out 100
Bc out 0 I=0.3*v(out)^3
Ro out 0 200
.op
""")
    res = sim.envelope(t_stop=4e-6, dt_env=1e-6, f0=F0, n_harm=5)
    assert res.converged.all()
    eq = _eq(sim, "out")
    _, bidx = find_source(sim.circuit, "Vb")
    for n, t1 in enumerate(res.t1):
        vb = 0.2 + (1.0 - 0.2) * t1 / 5e-6
        p = dict(sim.params)
        p["vs_dc"] = p["vs_dc"].at[bidx].set(vb)
        p["vs_pwl_v"] = p["vs_pwl_v"].at[bidx].set(0.0)
        hb = harmonic_balance(sim.engine, p, F0, n_harm=5)
        assert bool(hb.converged)
        np.testing.assert_allclose(res.coeffs[n, :, eq],
                                   np.asarray(hb.spectrum)[:, eq],
                                   atol=1e-7)


def test_am_step_into_rc_closed_form():
    R = 1e3
    C = 1.0 / (2.0 * np.pi * 1e9)         # w0*R*C = 1 exactly at F0
    v1, v2 = 0.5, 1.0
    sim = Simulator.from_text(f"""* AM step into RC
Vc carr 0 SIN 0 1 {F0}
Rc carr 0 1k
Vb base 0 PULSE({v1} {v2} 0 1e-9 1e-9 1 1)
Rb base 0 1k
Bm m 0 V=v(base)*v(carr)
Rr m out {R}
Cc out 0 {C}
.op
""")
    dt = 5e-8
    res = sim.envelope(t_stop=3e-6, dt_env=dt, f0=F0, n_harm=3)
    assert res.converged.all()
    eq = _eq(sim, "out")
    y = res.coeffs[:, 1, eq]               # fundamental complex envelope

    w0rc = 2.0 * np.pi * F0 * R * C        # = 1
    pole = 1.0 + 1j * w0rc
    y0 = -1j * v1 / pole
    yinf = -1j * v2 / pole
    # t1=0 initial PSS: the frozen PULSE is still at v1
    assert y[0] == pytest.approx(y0, rel=1e-6)
    # exact discrete BE recurrence of the decoupled fundamental:
    #   (RC/dt)(Y_n - Y_{n-1}) + pole*Y_n = -j v2
    a = R * C / dt
    yd = y0
    for n in range(1, len(res.t1)):
        yd = (a * yd - 1j * v2) / (a + pole)
        assert y[n] == pytest.approx(yd, rel=1e-6)
    # continuous closed form: BE is first order, err ~ dt/RC
    t = res.t1
    yc = yinf + (y0 - yinf) * np.exp(-pole * t / (R * C))
    err1 = np.abs(y - yc).max()
    assert err1 < 0.12 * abs(y0 - yinf)
    # ... and the error is O(dt): halving dt halves it
    res2 = sim.envelope(t_stop=3e-6, dt_env=dt / 2, f0=F0, n_harm=3)
    y2 = res2.coeffs[:, 1, eq]
    yc2 = yinf + (y0 - yinf) * np.exp(-pole * res2.t1 / (R * C))
    err2 = np.abs(y2 - yc2).max()
    assert err2 < 0.6 * err1
    # and the carrier-free baseband node stays put (sanity on splitting)
    eqb = _eq(sim, "base")
    assert np.abs(res.coeffs[:, 1:, eqb]).max() < 1e-9
    np.testing.assert_allclose(res.coeffs[1:, 0, eqb].real, v2, atol=1e-9)


def test_trap_envelope_is_second_order():
    """Smooth baseband SIN modulation through the same RC: after the
    initial transient decays, BE tracks the closed-form particular
    solution to O(dt) while trapezoidal does O(dt^2) — at dt/RC = 0.31
    the trap error must be far below BE's."""
    R = 1e3
    C = 1.0 / (2.0 * np.pi * 1e9)
    fm = 1e5                               # slow SIN (< F0/2): envelope
    sim = Simulator.from_text(f"""* smooth AM into RC
Vc carr 0 SIN 0 1 {F0}
Rc carr 0 1k
Vb base 0 SIN 0.5 0.2 {fm}
Rb base 0 1k
Bm m 0 V=v(base)*v(carr)
Rr m out {R}
Cc out 0 {C}
.op
""")
    eq = _eq(sim, "out")
    rc = R * C
    pole = 1.0 + 2.0j * np.pi * F0 * rc
    wm = 2.0 * np.pi * fm

    def y_exact(t):
        # RC y' + pole y = -j vb(t), vb = 0.5 + 0.2 sin(wm t); particular
        # solution + the decaying homogeneous piece from y(0) = -0.5j/pole
        yp = (-0.5j / pole
              - 0.1 * np.exp(1j * wm * t) / (pole + 1j * wm * rc)
              + 0.1 * np.exp(-1j * wm * t) / (pole - 1j * wm * rc))
        # y(0) = -0.5j/pole (frozen PSS), so the homogeneous coefficient
        # is y(0) - yp(0) = -y_p0
        return yp - y_p0 * np.exp(-pole * t / rc)

    y_p0 = (-0.1 / (pole + 1j * wm * rc) + 0.1 / (pole - 1j * wm * rc))
    errs = {}
    for order in (1, 2):
        res = sim.envelope(t_stop=3e-6, dt_env=5e-8, f0=F0, n_harm=3,
                           order=order)
        assert res.converged.all()
        y = res.coeffs[:, 1, eq]
        errs[order] = np.abs(y - y_exact(res.t1)).max()
    assert errs[1] < 0.05                  # BE in the right ballpark
    assert errs[2] < 0.12 * errs[1]        # trap: second order


def test_tline_carrier_envelope_matches_hb():
    """Guards the 'T-line delays included' claim: a carrier through a
    mismatched transmission line — the envelope must be t1-invariant and
    equal to plain HB (whose band-limited shift operators are the
    independently validated delay treatment)."""
    sim = Simulator.from_text(f"""* carrier through a line
V1 in 0 SIN 0 1 {F0}
RS in a 75
T1 a 0 b 0 Z0=50 TD=37n
RL b 0 120
.op
""")
    res = sim.envelope(t_stop=1.5e-6, dt_env=5e-7, f0=F0, n_harm=4)
    assert res.converged.all()
    eq = _eq(sim, "b")
    hb = harmonic_balance(sim.engine, sim.params, F0, n_harm=4)
    assert bool(hb.converged)
    for n in range(len(res.t1)):
        np.testing.assert_allclose(res.coeffs[n, :, eq],
                                   np.asarray(hb.spectrum)[:, eq],
                                   atol=1e-8)


def test_cli_envelope(tmp_path):
    from circuitsimulator_tpu.cli import main
    deck = tmp_path / "am.sp"
    deck.write_text(f"""* AM envelope CLI
Vc carr 0 SIN 0 1 {F0}
Rc carr 0 1k
Vb base 0 PWL(0 0.2 2e-6 1.0)
Rb base 0 1k
Bm m 0 V=v(base)*v(carr)
Rr m out 1k
Cc out 0 0.159n
.hb {F0} 3
""")
    out = tmp_path / "env.csv"
    rc = main([str(deck), "--no-tran", "--env-order", "2",
               "--run-envelope", f"2e-6:2e-7:{out}"])
    assert rc == 0
    lines = out.read_text().strip().split("\n")
    hdr = lines[0].split(",")
    assert hdr[0] == "time" and "|V(out)@f0|" in hdr
    col = hdr.index("|V(out)@f0|")
    first = float(lines[1].split(",")[col])
    last = float(lines[-1].split(",")[col])
    # the AM ramp 0.2 -> 1.0 grows the fundamental envelope
    assert last > 3.0 * first > 0.0
    # bad spec is a clean failure
    assert main([str(deck), "--no-tran", "--run-envelope", "2e-6"]) == 1
