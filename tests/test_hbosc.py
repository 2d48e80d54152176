"""Autonomous harmonic balance (analysis/hbosc.py): frequency-domain
oscillator steady state with f0 as a Newton unknown.  Validated against
the time-domain shooting solver, describing-function closed forms, and —
for the T-line case no shooting path can solve — a long transient."""

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator


def node_eq(sim, name):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index


VDP = """* van der pol lc oscillator
L1 a 0 1u
C1 a 0 1n
Rl a 0 2k
Bneg a 0 I=-2m*v(a) + 0.5m*v(a)**3
.op
"""


def test_vdp_matches_shooting_and_closed_form():
    sim = Simulator.from_text(VDP)
    r = sim.oscillator_hb(f0_guess=5.0e6, anchor_node="a", n_harm=9)
    assert bool(r.converged), float(r.residual)
    # shooting (trap, K=256) has O(dt²) period error ~5e-5; HB is spectral
    sh = sim.oscillator(f0_guess=5.0e6, anchor_node="a")
    assert sh.converged
    assert r.f0 == pytest.approx(float(sh.f0), rel=5e-4)
    assert r.f0 == pytest.approx(5.03e6, rel=5e-3)   # 1/(2π√(LC))
    # describing-function amplitude A = sqrt(4(a-g)/(3b)) = 2.0 V
    a_eq = node_eq(sim, "a")
    fund = np.abs(np.asarray(r.spectrum)[1, a_eq])
    assert fund == pytest.approx(2.0, rel=2e-2)
    # odd-symmetric nonlinearity: even harmonics vanish
    spec_a = np.abs(np.asarray(r.spectrum)[:, a_eq])
    assert spec_a[2] < 1e-6 and spec_a[4] < 1e-6
    assert spec_a[3] > 1e-3        # the cubic's third harmonic is there


# delay-line (T-line feedback) oscillator: inverting saturating amp into a
# matched 50 Ω line, round-trip phase π at ωτ ⇒ f₀ ≈ 1/(2 TD) = 100 MHz,
# pulled slightly low by the smoothing pole at node a.  Describing
# function: gain 3 ⇒ |loop| = (3 − (3/8)A_b²)/2 = 1 ⇒ A_b = √(16/3)·...
# (amplitude asserted loosely; the frequency is the sharp prediction).
DELAY_OSC = """* delay-line oscillator
Bamp b 0 V=-3.0*v(a)+0.5*v(a)^3
Rb b bl 50
T1 bl 0 a 0 Z0=50 TD=5n
Ra a 0 50
Ca a 0 2p
.op
"""


def test_delay_line_oscillator_vs_transient():
    # the shooting oscillator CANNOT solve this deck (dt-dependent delay
    # ring); autonomous HB handles the delay exactly
    sim = Simulator.from_text(DELAY_OSC)
    with pytest.raises(NotImplementedError):
        sim.oscillator(f0_guess=1e8, anchor_node="a")
    r = sim.oscillator_hb(f0_guess=1e8, anchor_node="a", n_harm=13,
                          warmup_periods=60)
    assert bool(r.converged), float(r.residual)
    assert r.f0 == pytest.approx(1.0e8, rel=3e-2)    # ≈ 1/(2 TD)

    # independent time-domain check: kicked transient (delay ring is
    # tick-exact at dt = TD/100), period from late upward crossings
    tr_deck = DELAY_OSC.replace(".op\n", "") + (
        "Ik a 0 PULSE(0 20m 1n 0.1n 0.1n 1n 1000)\n"
        ".TRAN 0.05n 400n\n")
    sim_t = Simulator.from_text(tr_deck)
    res = sim_t.transient()
    assert not bool(np.asarray(res.failed).any())
    xs = np.asarray(res.xs)
    ya = xs[:, node_eq(sim_t, "a")]
    tail = ya[-2000:]                                # last 100 ns
    assert tail.max() > 0.3                          # it really oscillates
    mean = tail.mean()
    up = np.nonzero((tail[:-1] < mean) & (tail[1:] >= mean))[0]
    assert len(up) >= 5
    # sub-sample crossing times by linear interpolation
    frac = (mean - tail[up]) / (tail[up + 1] - tail[up])
    tcross = (up + frac) * 0.05e-9
    T_tran = np.mean(np.diff(tcross))
    assert r.f0 == pytest.approx(1.0 / T_tran, rel=5e-3)
    # odd-symmetric saturating loop: strong 3rd harmonic (the square-ish
    # wave carries ~33% of the fundamental there), 2nd harmonic limited
    # only by truncation aliasing (the slow spectral decay leaks even
    # content at finite H: measured 0.52% at H=13 → 0.06% at H=31; the
    # transient's true value is 0.02%)
    a_eq = node_eq(sim, "a")
    spec_a = np.abs(np.asarray(r.spectrum)[:, a_eq])
    assert spec_a[3] > 0.25 * spec_a[1]
    assert spec_a[2] < 0.01 * spec_a[1]


def test_hb_ppv_phase_noise_matches_shooting_ppv():
    # same physics, two PPV constructions: the HB Jacobian's left null
    # vector vs the shooting monodromy's Floquet adjoint (oscnoise.py) —
    # the diffusion constant and flicker coefficient must agree
    sim = Simulator.from_text(VDP)
    r = sim.oscillator_hb(f0_guess=5.0e6, anchor_node="a", n_harm=11)
    assert bool(r.converged)
    pn_hb = sim.oscillator_phase_noise_hb([1e3, 1e4, 1e5], osc=r)
    # delay-free: the Fredholm scale reproduces the DAE biorthogonality
    # v·Cẋ = 1 pointwise to roundoff
    assert pn_hb.invariance < 1e-8
    assert pn_hb.sv_gap < 1e-6           # clean 1-D phase null space
    pn_sh = sim.oscillator_phase_noise([1e3, 1e4, 1e5],
                                       f0_guess=5.0e6, anchor_node="a")
    assert pn_hb.c == pytest.approx(pn_sh.c, rel=3e-2)
    # thermal-only deck: the R class carries everything, in both paths
    assert set(pn_hb.by_class) == {"R"}
    assert pn_hb.by_class["R"] == pytest.approx(pn_hb.c)
    np.testing.assert_allclose(pn_hb.L_dbc, pn_sh.L_dbc, atol=0.3)


def test_delay_line_oscillator_phase_noise():
    # the shooting PPV cannot exist here (no shooting solution with a
    # T-line); the HB PPV delivers the full phase-noise story.  The
    # square-ish wave's slow spectral decay means the Jacobian is only
    # singular to truncation level (sv_gap ~2e-2 at H=13), so the PPV is
    # checked for H-convergence rather than a pointwise invariant (the
    # v·Cẋ products are legitimately non-flat with distributed state).
    sim = Simulator.from_text(DELAY_OSC)
    a_eq = node_eq(sim, "a")

    def c_at(H):
        r = sim.oscillator_hb(f0_guess=1e8, anchor_node="a", n_harm=H,
                              warmup_periods=60)
        assert bool(r.converged)
        pn = sim.oscillator_phase_noise_hb([1e4, 1e5, 1e6, 1e7], osc=r,
                                           extra_pairs=[(a_eq, -1)],
                                           extra_psd=[1e-18])
        return pn

    pn = c_at(13)
    assert pn.c > 0 and np.isfinite(pn.L_dbc).all()
    assert pn.sv_gap < 0.05
    # white-only: 20 dB/decade in the 1/f² region
    assert pn.L_dbc[1] - pn.L_dbc[2] == pytest.approx(20.0, abs=0.5)
    # the injected source at node a and the thermal resistors all land
    assert set(pn.by_class) == {"R", "X"}
    assert pn.by_class["R"] + pn.by_class["X"] == pytest.approx(pn.c)
    # truncation convergence: doubling the harmonic box moves c < 10%
    pn2 = c_at(21)
    assert pn2.sv_gap < pn.sv_gap
    assert pn2.c == pytest.approx(pn.c, rel=0.10)


def test_cli_run_osc(tmp_path, capsys):
    from circuitsimulator_tpu.cli import main
    # T-line deck: --osc-method auto must pick autonomous HB
    deck = tmp_path / "osc.sp"
    deck.write_text(DELAY_OSC)
    out = tmp_path / "osc.csv"
    rc = main([str(deck), "--run-osc", f"1e8:a:{out}"])
    cap = capsys.readouterr()
    assert rc == 0, cap.err
    assert "oscillator steady state (hb)" in cap.out
    assert "converged=True" in cap.out
    assert "Steady-state harmonics" in cap.out
    assert out.exists()
    # lumped deck: auto = shooting; SPICE suffix in the guess
    deck2 = tmp_path / "vdp.sp"
    deck2.write_text(VDP.replace(".op\n", ".op\n"))
    out2 = tmp_path / "vdp.csv"
    rc = main([str(deck2), "--run-osc", f"5meg:a:{out2}"])
    cap = capsys.readouterr()
    assert rc == 0, cap.err
    assert "oscillator steady state (shooting)" in cap.out
    assert "f0=5.03" in cap.out
    assert out2.exists()


MEISSNER = """* meissner (transformer-feedback) mos oscillator, class A
.MODEL 1 VT 0.7 MU 5e-2 COX 2e-3 LAMBDA 0.01 KF 1e-15 AF 1
VDD 1 0 3
VG gb 0 1.2
L1 g gb 100u
C1 g 0 100p
Rl g 0 5k
Blim g 0 I=100m*(v(g)-1.2)**3
L2 1 d 10u
K1 L1 L2 0.5
M1 d g 0 n 60e-6 1e-6 1
.op
"""


def test_mos_meissner_hb_matches_shooting():
    # real-device oscillator (MOS + transformer feedback + junction
    # caps): autonomous HB must agree with the shooting solver on
    # frequency and fundamental amplitude
    sim = Simulator.from_text(MEISSNER)
    r = sim.oscillator_hb(f0_guess=1.6e6, anchor_node="g", n_harm=9,
                          warmup_periods=60)
    assert bool(r.converged), float(r.residual)
    sh = sim.oscillator(f0_guess=1.6e6, anchor_node="g",
                        steps_per_period=256, warmup_periods=60)
    assert sh.converged
    # this agreement bar caught a real bug: the shooting map's per-step
    # Newton early-stop at the default 1e-6 biased f0 by ~1e-3 here
    # (osc_engine now tightens it to 1e-9; gap measured 3e-5 at K=256,
    # 4e-6 at 512 — clean O(dt²) onto the spectral value)
    assert r.f0 == pytest.approx(float(sh.f0), rel=1e-4)
    g_eq = node_eq(sim, "g")
    fund_hb = np.abs(np.asarray(r.spectrum)[1, g_eq])
    xs_sh = np.asarray(sh.xs)[:, g_eq]
    fund_sh = (xs_sh.max() - xs_sh.min()) / 2
    assert fund_hb == pytest.approx(fund_sh, rel=0.03)
    # the DC component sits at the gate bias
    assert np.abs(np.asarray(r.spectrum)[0, g_eq]) == pytest.approx(
        1.2, abs=0.05)
