"""AC small-signal analysis + DC sweep (cards the reference parses but never
executes; semantics defined in analysis/ac.py, analysis/sweep.py)."""

import numpy as np
import pytest

from circuitsimulator_tpu.api import Simulator
from circuitsimulator_tpu.analysis.ac import sweep_frequencies, write_ac_csv
from circuitsimulator_tpu.analysis.sweep import sweep_values, write_sweep_csv


def test_sweep_frequencies():
    np.testing.assert_allclose(sweep_frequencies("lin", 5, 1.0, 5.0),
                               [1, 2, 3, 4, 5])
    f = sweep_frequencies("dec", 10, 1.0, 100.0)
    assert len(f) == 21
    assert f[0] == pytest.approx(1.0) and f[-1] == pytest.approx(100.0)
    f = sweep_frequencies("oct", 2, 1.0, 8.0)
    assert len(f) == 7


def test_ac_rc_lowpass_matches_phasor():
    R, C = 1e3, 1e-9
    sim = Simulator.from_text(
        f"V1 1 0 DC 0 AC 1\nR1 1 2 {R}\nC1 2 0 {C}\n.AC dec 5 1e3 1e8\n")
    res = sim.ac()
    f = np.asarray(res.freqs)
    h = np.asarray(res.xs)[:, 1]  # node 2
    h_ref = 1.0 / (1.0 + 1j * 2 * np.pi * f * R * C)
    np.testing.assert_allclose(h, h_ref, rtol=1e-9)


def test_ac_rlc_resonance():
    # series RLC: |I| peaks at f0 = 1/(2 pi sqrt(LC))
    R, L, C = 10.0, 1e-6, 1e-9
    f0 = 1 / (2 * np.pi * np.sqrt(L * C))
    sim = Simulator.from_text(
        f"V1 1 0 AC 1\nR1 1 2 {R}\nL1 2 3 {L}\nC1 3 0 {C}\n"
        f".AC lin 3 {f0/2} {f0*1.5}\n")
    res = sim.ac(freqs=np.array([f0 / 2, f0, f0 * 2]))
    xs = np.asarray(res.xs)
    iV = xs[:, -2]  # V1 branch current (vs before L branch)
    # at resonance the current magnitude is V/R
    assert abs(iV[1]) == pytest.approx(1.0 / R, rel=1e-6)
    assert abs(iV[0]) < abs(iV[1]) and abs(iV[2]) < abs(iV[1])


def test_ac_phase_source():
    sim = Simulator.from_text("V1 1 0 AC 2 45\nR1 1 0 1\n.AC lin 1 1e3 1e3\n")
    res = sim.ac()
    v1 = np.asarray(res.xs)[0, 0]
    assert abs(v1) == pytest.approx(2.0, rel=1e-12)
    assert np.degrees(np.angle(v1)) == pytest.approx(45.0, rel=1e-9)


def test_ac_mos_common_source_gain():
    # common-source amp: small-signal gain at low f ~= -gd_total*RD ... use
    # numeric derivative of the DC solve as the oracle
    text = (".MODEL 2 VT 0.4 MU 1e-2 COX 1e-3 LAMBDA 0.05 CJ0 0\n"
            "VDD 1 0 3\nVin 2 0 DC 1 AC 1\nRD 1 3 100k\n"
            "M1 3 2 0 n 10e-6 1e-6 2\n.AC lin 1 1 1\n")
    sim = Simulator.from_text(text)
    res = sim.ac(freqs=np.array([1.0]))
    gain = np.asarray(res.xs)[0, 2]  # node 3
    # numeric DC derivative dV(3)/dVin
    import jax.numpy as jnp
    dv = 1e-6
    p_hi = dict(sim.params)
    p_hi["vs_dc"] = sim.params["vs_dc"].at[1].add(dv)
    p_lo = dict(sim.params)
    p_lo["vs_dc"] = sim.params["vs_dc"].at[1].add(-dv)
    x_hi = np.asarray(sim.dc(p_hi))
    x_lo = np.asarray(sim.dc(p_lo))
    g_ref = (x_hi[2] - x_lo[2]) / (2 * dv)
    assert gain.imag == pytest.approx(0.0, abs=1e-9)
    # the DC solve stamps gmin ~3.35e-7 on node rows (dcanalysis.hpp:45-48)
    # while AC does not, so with RD=100k the oracle differs by ~gmin*RD ~3%
    assert gain.real == pytest.approx(g_ref, rel=0.05)
    assert gain.real < -1.0  # it actually amplifies and inverts


def test_ac_csv(tmp_path):
    sim = Simulator.from_text(
        "V1 1 0 AC 1\nR1 1 2 1k\nC1 2 0 1n\n.AC dec 2 1e3 1e6\n")
    res = sim.ac()
    out = tmp_path / "ac.csv"
    write_ac_csv(str(out), sim.topo, res)
    lines = out.read_text().splitlines()
    assert lines[0] == "freq,VM(1),VP(1),VM(2),VP(2),IM(V1),IP(V1)"
    assert len(lines) == 1 + len(np.asarray(res.freqs))


def test_dc_sweep_divider():
    sim = Simulator.from_text(
        "V1 1 0 1\nR1 1 2 1k\nR2 2 0 1k\n.DC V1 0 5 0.5\n")
    res = sim.dc_sweep()
    vals = np.asarray(res.values)
    np.testing.assert_allclose(vals, np.arange(0, 5.01, 0.5))
    np.testing.assert_allclose(np.asarray(res.xs)[:, 1], vals / 2, atol=1e-12)


def test_dc_sweep_mos_transfer():
    text = (".MODEL 2 VT 0.4 MU 1e-2 COX 1e-3 LAMBDA 0.05 CJ0 0\n"
            "VDD 1 0 3\nVin 2 0 1\nRD 1 3 10k\nM1 3 2 0 n 10e-6 1e-6 2\n"
            ".DC Vin 0 3 0.25\n")
    sim = Simulator.from_text(text)
    res = sim.dc_sweep()
    v3 = np.asarray(res.xs)[:, 2]
    vin = np.asarray(res.values)
    # below threshold: output stays ~VDD; above: output falls monotonically
    assert np.all(v3[vin <= 0.4] > 2.98)  # gmin*RD leaks ~10 mV
    assert np.all(np.diff(v3) <= 1e-9)
    assert v3[-1] < 1.0


def test_dc_sweep_isource_and_csv(tmp_path):
    sim = Simulator.from_text("I1 0 1 1m\nR1 1 0 1k\n.DC I1 0 2m 1m\n")
    res = sim.dc_sweep()
    np.testing.assert_allclose(np.asarray(res.xs)[:, 0], [0.0, 1.0, 2.0],
                               atol=1e-12)
    out = tmp_path / "sw.csv"
    write_sweep_csv(str(out), sim.topo, res)
    assert out.read_text().splitlines()[0] == "I1,V(1)"


def test_sweep_unknown_source():
    sim = Simulator.from_text("V1 1 0 1\nR1 1 0 1\n.DC VX 0 1 0.5\n")
    with pytest.raises(KeyError):
        sim.dc_sweep()


def test_ac_csv_probe_selection(tmp_path):
    """`.PRINT AC` probes restrict + order the AC CSV columns; differential
    probes subtract complex phasors."""
    from circuitsimulator_tpu.analysis.ac import write_ac_csv
    from circuitsimulator_tpu.io.csvout import probe_selection
    net = """\
V1 in 0 DC 0 AC 1
R1 in mid 1k
R2 mid out 1k
C1 out 0 1n
.AC dec 2 1e2 1e4
.PRINT AC V(out) V(in,mid) I(V1)
.PRINT TRAN V(mid)
"""
    sim = Simulator.from_text(net)
    res = sim.ac()
    sel = probe_selection(sim.topo, sim.config.print_commands, analysis="ac")
    assert [l for l, _ in sel] == ["V(out)", "V(in)-V(mid)", "I(V1)"]
    path = tmp_path / "ac.csv"
    write_ac_csv(str(path), sim.topo, res, selection=sel)
    lines = path.read_text().splitlines()
    assert lines[0] == ("freq,VM(out),VP(out),VM(in)-V(mid),VP(in)-V(mid),"
                        "IM(V1),IP(V1)")
    row = np.array(lines[1].split(","), dtype=float)
    xs = np.asarray(res.xs)[0]
    v = {n: xs[e] for n, e in zip(sim.topo.volt_col_names,
                                  sim.topo.volt_col_eqs)}
    np.testing.assert_allclose(row[1], abs(v["out"]), rtol=1e-8)
    np.testing.assert_allclose(row[3], abs(v["in"] - v["mid"]), rtol=1e-8)
