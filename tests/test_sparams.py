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


def test_touchstone_writer_and_cli(tmp_path, capsys):
    """3 dB resistive pi pad: S21 = -3 dB, S11 ~ 0; Touchstone v1 layout
    (option line + the 2-port S11 S21 S12 S22 order)."""
    deck = tmp_path / "atten.sp"
    deck.write_text("""* 3 dB pi pad
R1 in 0 292
R2 in out 17.6
R3 out 0 292
.AC DEC 2 1e3 1e5
.op
""")
    from circuitsimulator_tpu.cli import main
    out = tmp_path / "atten.s2p"
    rc = main([str(deck), "--no-tran",
               "--run-sparams", "in,out", "--sparams-out", str(out)])
    assert rc == 0
    lines = out.read_text().strip().split("\n")
    assert lines[0].startswith("!")
    assert lines[1] == "# Hz S MA R 50"
    first = [float(v) for v in lines[2].split()]
    assert len(first) == 9          # f + 4 MA pairs
    s11_mag, s21_mag = first[1], first[3]
    assert 20 * np.log10(s21_mag) == pytest.approx(-3.0, abs=0.02)
    assert s11_mag < 1e-3
