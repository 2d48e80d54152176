"""Timing-jitter analysis (analysis/jitter.py): threshold-crossing
statistics over independent TRNOISE lanes, pinned by the small-noise
prediction t_jitter = v_noise_rms / slew_rate."""

import math

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator


NA = 5e-3          # 5 mV RMS noise
TR = 1e-4          # 100 us rise -> slew 1e4 V/s
PRED = NA / (1.0 / TR)      # 0.5 us predicted edge jitter


def _deck():
    return Simulator.from_text(f"""* noisy edges
V1 in 0 PULSE(0 1 1e-4 {TR} {TR} 3e-4 1e-3) TRNOISE({NA} 4e-6)
R1 in out 1k
R2 out 0 1k
.TRAN 1e-6 8e-3
.end
""")


def test_edge_jitter_matches_prediction():
    sim = _deck()
    out = sim.jitter("in", threshold=0.5, n=64)
    assert out["n_edges"] == 8                    # 8 periods in the run
    # every edge's absolute jitter tracks v_n / SR
    for k in range(out["n_edges"]):
        assert out["edge_jitter"][k] == pytest.approx(PRED, rel=0.4), k
    # edge means sit at the noise-free crossing (td + tr/2 + m*per)
    t0 = 1e-4 + TR / 2
    np.testing.assert_allclose(out["edge_mean"],
                               t0 + 1e-3 * np.arange(8), rtol=2e-3)
    # period jitter of independent edges ~ sqrt(2) x edge jitter
    pj = out["period_jitter"]
    assert pj.shape == (7,)
    assert np.median(pj) == pytest.approx(math.sqrt(2) * PRED, rel=0.5)
    # periods average to the source period
    np.testing.assert_allclose(out["period_mean"], 1e-3, rtol=1e-3)


def test_falling_edges_and_tmin():
    sim = _deck()
    out = sim.jitter("in", threshold=0.5, n=16, rising=False,
                     t_min=2e-3)
    # falling edges after 2 ms: periods 2..7 -> 6 edges
    assert out["n_edges"] == 6
    assert np.all(out["edge_mean"] > 2e-3)


def test_hysteresis_debounces_double_crossings(capsys):
    # slow ramp (10 mV/step) with 50 mV noise: raw detection
    # double-crosses and the lanes disagree (loud warning); a Schmitt
    # release band restores exactly one edge per cycle
    sim = Simulator.from_text("""* noisy slow edges
V1 in 0 PULSE(0 1 0 2e-4 2e-4 1e-4 5e-4) TRNOISE(50m 2e-6)
R1 in 0 1k
.TRAN 1e-6 2e-3
.end
""")
    raw = sim.jitter("in", threshold=0.5, n=8)
    err = capsys.readouterr().err
    assert "disagree" in err                      # loud, not silent
    clean = sim.jitter("in", threshold=0.5, n=8, hysteresis=0.2)
    assert clean["n_edges"] == 4                  # one per cycle
    # edge jitter ~ v_n/SR = 50mV/(5kV/s) = 10 us
    assert 4e-6 < np.median(clean["edge_jitter"]) < 2.5e-5
    np.testing.assert_allclose(clean["period_mean"], 5e-4, rtol=0.05)


def test_requires_noise_sources():
    sim = Simulator.from_text("""* quiet
V1 in 0 PULSE(0 1 0 1n 1n 1 2)
R1 in 0 1k
.TRAN 1e-6 1e-4
.end
""")
    with pytest.raises(ValueError):
        sim.jitter("in", threshold=0.5, n=4)
