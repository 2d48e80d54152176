"""Loop-gain / stability analysis (analysis/loopgain.py): Bode return
ratio of a VCVS error amp, pinned by closed-form single- and
three-pole loops."""

import math

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator


def test_single_pole_loop():
    # error amp A=1000 driving an RC pole, unity feedback:
    # T = A/(1+jwt), t = 1 ms/(2pi*159Hz)... tau = 1k*1u = 1 ms
    A, tau = 1000.0, 1e-3
    sim = Simulator.from_text(f"""* one-pole loop
Vref in 0 DC 1 AC 0
E1 a 0 in out {A}
R1 a out 1k
C1 out 0 1u
.AC DEC 40 0.01 1e6
.end
""")
    out = sim.loop_gain("E1")
    f = np.asarray(out["freqs"])
    T = out["T"]
    pred = A / (1 + 1j * 2 * math.pi * f * tau)
    np.testing.assert_allclose(T, pred, rtol=1e-6)
    # unity crossover and phase margin, closed form
    wu = math.sqrt(A * A - 1) / tau
    assert out["f_unity"] == pytest.approx(wu / (2 * math.pi), rel=1e-3)
    pm_true = 180.0 - math.degrees(math.atan(wu * tau))
    assert out["phase_margin_deg"] == pytest.approx(pm_true, abs=0.05)
    assert out["gain_margin_db"] is None      # never reaches -180 deg


def test_three_pole_margins():
    # three buffered identical poles: T = A/(1+jwt)^3 — crosses -180 at
    # wt = sqrt(3) with |T| = A/8, so GM = 20log10(8/A); PM from
    # (1+(wt)^2)^(3/2) = A at crossover
    A, tau = 2.0, 1e-3
    sim = Simulator.from_text(f"""* three-pole loop
Vref in 0 DC 0 AC 0
E1 a 0 in out {A}
R1 a b 1k
C1 b 0 1u
EB1 c 0 b 0 1
R2 c d 1k
C2 d 0 1u
EB2 e 0 d 0 1
R3 e out 1k
C3 out 0 1u
.AC DEC 60 0.1 1e5
.end
""")
    out = sim.loop_gain("E1")
    f = np.asarray(out["freqs"])
    pred = A / (1 + 1j * 2 * math.pi * f * tau) ** 3
    np.testing.assert_allclose(out["T"], pred, rtol=1e-6)
    gm_true = 20 * math.log10(8.0 / A)
    assert out["gain_margin_db"] == pytest.approx(gm_true, abs=0.05)
    assert out["f_180"] == pytest.approx(math.sqrt(3) / (2 * math.pi * tau),
                                         rel=1e-3)
    wt = math.sqrt(A ** (2 / 3) - 1.0)
    pm_true = 180.0 - 3 * math.degrees(math.atan(wt))
    assert out["phase_margin_deg"] == pytest.approx(pm_true, abs=0.1)


def test_unknown_source_raises():
    sim = Simulator.from_text("""* no amp
V1 in 0 DC 1 AC 1
R1 in 0 1k
.AC DEC 5 10 1e3
.end
""")
    with pytest.raises(KeyError):
        sim.loop_gain("E9")


def test_cli_loop_gain_and_friends(tmp_path, capsys, monkeypatch):
    from circuitsimulator_tpu.cli import main
    deck = tmp_path / "loop.sp"
    deck.write_text("""* one-pole loop
Vref in 0 DC 1 AC 0
E1 a 0 in out 1000
R1 a out 1k
C1 out 0 1u
.AC DEC 20 0.01 1e6
.NOISE V(out) Vref
.end
""")
    monkeypatch.chdir(tmp_path)
    rc = main([str(deck), str(tmp_path / "t.csv"),
               "--run-loop-gain", "E1",
               "--run-noise-figure", "R1",
               "--run-group-delay", "out"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "phase margin" in out
    assert "Noise figure" in out
    assert "Group delay" in out
    assert (tmp_path / "loopgain.csv").exists()
    assert (tmp_path / "nf.csv").exists()
    assert (tmp_path / "groupdelay.csv").exists()
    lg = (tmp_path / "loopgain.csv").read_text().splitlines()
    assert lg[0] == "freq,mag_db,phase_deg"
    assert abs(float(lg[1].split(",")[1]) - 60.0) < 0.1   # 1000x = 60 dB
