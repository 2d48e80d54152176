"""Autonomous oscillator shooting (analysis/sstate.py): a van der Pol
LC oscillator built from a behavioral negative conductance, validated
against the describing-function amplitude and the tank frequency."""

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator


# tank: L = 1uH, C = 1nF -> f0 = 1/(2 pi sqrt(LC)) = 5.0329 MHz
# nonlinearity: i = -a*v + b*v^3 with a = 2 mS, b = 0.5 mS/V^2, plus a
# 2 kOhm load (g = 0.5 mS).  Describing function: oscillation amplitude
# A = sqrt(4 (a - g) / (3 b)) = sqrt(4 * 1.5e-3 / 1.5e-3) = 2.0 V.
VDP = """* van der pol lc oscillator
L1 a 0 1u
C1 a 0 1n
Rl a 0 2k
Bneg a 0 I=-2m*v(a) + 0.5m*v(a)**3
.op
"""


def test_vdp_oscillator_frequency_and_amplitude():
    sim = Simulator.from_text(VDP)
    # deliberately poor frequency guess (30% off)
    res = sim.oscillator(f0_guess=6.5e6, anchor_node="a",
                         steps_per_period=256, warmup_periods=40)
    assert res.converged, float(res.residual)
    f_expect = 1.0 / (2 * np.pi * np.sqrt(1e-6 * 1e-9))
    # BE at 256 steps/period has ~percent-level period error; the weak
    # nonlinearity also pulls the frequency slightly
    assert res.f0 == pytest.approx(f_expect, rel=2e-2)
    v = np.asarray(res.xs)[:, 0]
    amp = 0.5 * (v.max() - v.min())
    assert amp == pytest.approx(2.0, rel=5e-2)
    # the solution really is periodic: endpoints match
    np.testing.assert_allclose(v[0], v[-1], atol=2e-3)


def test_oscillator_period_independent_of_guess():
    sim = Simulator.from_text(VDP)
    r1 = sim.oscillator(4e6, "a", steps_per_period=128, warmup_periods=40)
    r2 = sim.oscillator(7e6, "a", steps_per_period=128, warmup_periods=40)
    assert r1.converged and r2.converged
    assert r1.f0 == pytest.approx(r2.f0, rel=1e-3)
