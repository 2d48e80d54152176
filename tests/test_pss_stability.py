"""Driven-PSS Floquet stability (analysis/oscnoise.pss_floquet).

Anchors:
1. a driven linear RC: the single Floquet multiplier is exp(-T/RC)
   exactly (trapezoidal discretization error << 1e-3 at 512
   steps/period) and the PSS is stable;
2. a net-negative-conductance linear tank: shooting happily converges
   to the repelling PSS, and pss_floquet flags it with
   lambda = exp(+g_net*T/C) > 1;
3. the autonomous van der Pol analyzed through the driven path shows
   the obligatory phase-mode multiplier at +1.
"""

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator


F0 = 5e6


def test_stable_rc_closed_form():
    R, C = 1e3, 1e-10                       # T/RC = 2
    sim = Simulator.from_text(f"""* driven rc
I1 0 a SIN 0 1m {F0}
R1 a 0 {R}
C1 a 0 {C}
.hb {F0} 5
""")
    ss = sim.steady_state(steps_per_period=512)
    assert bool(ss.converged)
    st = sim.pss_stability(ss=ss)
    assert st.stable
    # the transient map stamps the reference-parity tran_gmin (1e-6 S)
    # on every node, so the decay rate sees 1/R + gmin
    g = 1.0 / R + sim.opts.tran_gmin
    lam_exp = np.exp(-g / (F0 * C))
    assert st.lambda_max == pytest.approx(lam_exp, rel=1e-4)
    assert st.closure < 1e-6


def test_unstable_pss_flagged():
    # net conductance -0.4 mS on 1 nF: the periodic solution exists and
    # shooting finds it (linear => one Newton step), but it repels with
    # lambda = exp(+g_net*T/C) per period
    sim = Simulator.from_text(f"""* negative-g tank
I1 0 a SIN 0 1u {F0}
R1 a 0 10k
Bneg a 0 I=-0.5m*v(a)
C1 a 0 0.1n
.hb {F0} 5
""")
    ss = sim.steady_state(steps_per_period=256, warmup_periods=2,
                          max_newton=8)
    st = sim.pss_stability(ss=ss)
    g_net = 0.5e-3 - 1.0 / 10e3 - sim.opts.tran_gmin
    lam_exp = np.exp(g_net / (F0 * 0.1e-9))
    assert not st.stable
    assert st.lambda_max == pytest.approx(lam_exp, rel=1e-2)


def test_autonomous_deck_shows_phase_mode():
    sim = Simulator.from_text("""* van der pol
L1 a 0 1u
C1 a 0 1n
Rl a 0 2k
Bneg a 0 I=-2m*v(a) + 0.5m*v(a)**3
.op
""")
    osc = sim.oscillator(f0_guess=5e6, anchor_node="a",
                         steps_per_period=256, warmup_periods=40)
    assert osc.converged
    from circuitsimulator_tpu.analysis.oscnoise import pss_floquet
    st = pss_floquet(sim.engine, sim.params, osc, f0=osc.f0)
    # phase mode at +1 (within discretization), amplitude mode inside
    assert st.lambda_max == pytest.approx(1.0, abs=2e-3)
    assert not st.stable                      # |lambda|=1 is not < 1
    assert abs(st.multipliers[1]) < 0.99


def test_cli_flag(tmp_path, capsys):
    from circuitsimulator_tpu.cli import main
    deck = tmp_path / "rc.sp"
    deck.write_text(f"""* driven rc
I1 0 a SIN 0 1m {F0}
R1 a 0 1k
C1 a 0 1e-10
.hb {F0} 3
""")
    rc = main([str(deck), "--no-tran", "--run-hb",
               str(tmp_path / "hb.csv"), "--pss-stability"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "stable (attractor)" in out
    # the hb method has no shooting vector: warns, does not fail
    rc = main([str(deck), "--no-tran", "--run-hb",
               str(tmp_path / "hb2.csv"), "--hb-method", "hb",
               "--pss-stability"])
    assert rc == 0
    assert "needs the shooting method" in capsys.readouterr().err


def test_tline_deck_runs():
    """T-line decks used to refuse (the monodromy dropped the delay
    ring); since r5 the ring rides the shooting vector and the map is
    the full discretized-DDE state map (deeper anchors in
    tests/test_floquet_tline.py).  A matched 50-ohm line is absorbing:
    stable, with every multiplier far inside the unit circle."""
    sim = Simulator.from_text(f"""* driven line
V1 in 0 SIN 0 1 {F0}
R1 in a 50
T1 a 0 b 0 Z0=50 TD=10n
Rb b 0 50
.hb {F0} 3
""")
    ss = sim.steady_state(steps_per_period=64)
    fl = sim.pss_stability(ss=ss)
    assert fl.stable
    assert fl.lambda_max < 0.5
    assert fl.closure < 1e-6


def test_missing_vector_raises():
    sim = Simulator.from_text(f"""* rc
I1 0 a SIN 0 1m {F0}
R1 a 0 1k
C1 a 0 1n
.hb {F0} 3
""")
    ss = sim.steady_state(steps_per_period=64)
    ss.s = None
    with pytest.raises(ValueError):
        sim.pss_stability(ss=ss)
