"""N-port S-parameter extraction (analysis/sparams.py) vs closed forms."""

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator


def test_pi_attenuator_10db():
    # canonical 10 dB pi pad at Z0=50: R_shunt=96.2478, R_series=71.1512
    sim = Simulator.from_text("""* 10dB pad
R1 p1 0 96.2478
R2 p1 p2 71.1512
R3 p2 0 96.2478
.op
""")
    res = sim.sparams([("p1", None, 50.0), ("p2", None, 50.0)],
                      freqs=[1e6])
    s = res.s[0]
    assert abs(s[0, 0]) == pytest.approx(0.0, abs=1e-4)
    assert abs(s[1, 1]) == pytest.approx(0.0, abs=1e-4)
    assert abs(s[1, 0]) == pytest.approx(10 ** (-10 / 20), rel=1e-4)
    assert s[0, 1] == pytest.approx(s[1, 0], rel=1e-12)   # reciprocity


def test_matched_tline_sparams():
    # ideal 50-ohm line, TD=1n: S11=0, S21=e^{-j w TD}
    sim = Simulator.from_text(
        "T1 p1 0 p2 0 Z0=50 TD=1n\n.op\n")
    freqs = [5e7, 1.5e8]
    res = sim.sparams([("p1", None, 50.0), ("p2", None, 50.0)], freqs=freqs)
    for k, f in enumerate(freqs):
        s = res.s[k]
        assert abs(s[0, 0]) == pytest.approx(0.0, abs=1e-9)
        assert s[1, 0] == pytest.approx(np.exp(-2j * np.pi * f * 1e-9),
                                        rel=1e-9)


def test_shunt_rc_one_port():
    # 1-port shunt RC: S11 = (Zin - Z0)/(Zin + Z0)
    sim = Simulator.from_text("R1 p 0 100\nC1 p 0 10p\n.op\n")
    f = 1e8
    res = sim.sparams([("p", None, 50.0)], freqs=[f])
    zin = 1.0 / (1 / 100 + 2j * np.pi * f * 10e-12)
    expect = (zin - 50) / (zin + 50)
    assert res.s[0, 0, 0] == pytest.approx(expect, rel=1e-9)


def test_sparams_csv(tmp_path):
    from circuitsimulator_tpu.analysis.sparams import write_sparams_csv
    sim = Simulator.from_text("R1 p 0 50\n.op\n")
    res = sim.sparams([("p", None, 50.0)], freqs=[1e6, 2e6])
    path = tmp_path / "s.csv"
    write_sparams_csv(str(path), res)
    lines = path.read_text().strip().split("\n")
    assert lines[0] == "freq,|S11|,argS11(deg)"
    assert len(lines) == 3
    # 50-ohm into 50-ohm reference: S11 = 0
    assert float(lines[1].split(",")[1]) == pytest.approx(0.0, abs=1e-9)
