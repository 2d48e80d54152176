"""ngspice ASCII rawfile writer (io/rawfile.py, extension)."""

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator
from circuitsimulator_tpu.cli import main


DECK = """* rc lowpass
V1 in 0 DC 0 AC 1 PULSE(0 1 0 1n 1n 1 1)
R1 in out 1k
C1 out 0 1u
.TRAN 1e-4 2e-3
.AC lin 3 100 300
.DC V1 0 1 0.5
.end
"""


def parse_raw(path):
    """Minimal reader: [(plotname, flags, var_names, points)] where points
    is (npoints, nvars) float (real) or complex."""
    plots = []
    with open(path) as f:
        lines = f.read().splitlines()
    i = 0
    while i < len(lines):
        assert lines[i].startswith("Title: ")
        plot = {"plotname": lines[i + 2].split(": ", 1)[1],
                "flags": lines[i + 3].split(": ", 1)[1]}
        nvars = int(lines[i + 4].split(": ", 1)[1])
        npts = int(lines[i + 5].split(": ", 1)[1])
        assert lines[i + 6] == "Variables:"
        names = []
        for k in range(nvars):
            idx, name, typ = lines[i + 7 + k].split("\t")[1:]
            assert int(idx) == k
            names.append(name)
        plot["names"] = names
        i += 7 + nvars
        assert lines[i] == "Values:"
        i += 1
        cx = plot["flags"] == "complex"
        pts = np.zeros((npts, nvars), complex if cx else float)

        def val(s):
            if "," in s:
                re_, im_ = s.split(",")
                return complex(float(re_), float(im_))
            return float(s)

        for pn in range(npts):
            first, v0 = lines[i].split("\t")
            assert int(first) == pn
            pts[pn, 0] = val(v0)
            for k in range(1, nvars):
                pts[pn, k] = val(lines[i + k].strip())
            i += nvars
        plot["points"] = pts
        plots.append(plot)
    return plots


def test_multi_plot_rawfile_roundtrip(tmp_path):
    deck = tmp_path / "rc.sp"
    deck.write_text(DECK)
    raw = tmp_path / "out.raw"
    rc = main([str(deck), str(tmp_path / "t.csv"),
               "--run-ac", str(tmp_path / "ac.csv"),
               "--run-dc-sweep", str(tmp_path / "dc.csv"),
               "--raw", str(raw)])
    assert rc == 0
    plots = parse_raw(str(raw))
    assert [p["plotname"] for p in plots] == [
        "Transient Analysis", "AC Analysis", "DC transfer characteristic"]

    tran = plots[0]
    assert tran["flags"] == "real"
    assert tran["names"][0] == "time"
    iout = tran["names"].index("v(out)")
    t = tran["points"][:, 0].real
    vout = tran["points"][:, iout].real
    assert len(t) == 21 and t[0] == 0.0
    # RC charge at t = 1 ms ~ 1 - e^-1
    k = np.argmin(np.abs(t - 1e-3))
    assert vout[k] == pytest.approx(1 - np.exp(-1), abs=0.02)

    ac = plots[1]
    assert ac["flags"] == "complex"
    f = ac["points"][:, 0].real
    assert f.tolist() == [100.0, 200.0, 300.0]
    h = ac["points"][:, ac["names"].index("v(out)")]
    want = 1.0 / (1.0 + 2j * np.pi * f * 1e-3)
    assert np.abs(h - want).max() < 1e-9

    dc = plots[2]
    assert dc["names"][0] == "v(v1)"
    vals = dc["points"][:, 0].real
    assert vals.tolist() == [0.0, 0.5, 1.0]
    vout_dc = dc["points"][:, dc["names"].index("v(out)")].real
    assert np.abs(vout_dc - vals).max() < 1e-9


def test_api_write_raw_append(tmp_path):
    sim = Simulator.from_text(DECK)
    res = sim.transient()
    acres = sim.ac()
    path = tmp_path / "both.raw"
    sim.write_raw(str(path), res)
    sim.write_raw(str(path), acres, mode="a")
    plots = parse_raw(str(path))
    assert len(plots) == 2


def test_write_raw_rejects_unknown(tmp_path):
    sim = Simulator.from_text(DECK)
    with pytest.raises(TypeError):
        sim.write_raw(str(tmp_path / "x.raw"), object())
