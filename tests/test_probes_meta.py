"""Probe-driven CSV selection (extension) + run-metadata JSON."""

import json

import numpy as np
import pytest

from circuitsimulator_tpu.api import Simulator
from circuitsimulator_tpu.io.csvout import probe_selection, read_csv
from circuitsimulator_tpu.io.metadata import transient_metadata, write_metadata

TEXT = ("V1 1 0 SIN 0 1 1e6\nR1 1 2 1k\nC1 2 0 1n\nL1 2 3 1u\nR2 3 0 1k\n"
        ".TRAN 1e-8 2e-7\n.PLOTNV 2 0\n.plotnc L1\n.print tran V(1,2) I(V1)\n")


def test_probe_selection_resolution():
    sim = Simulator.from_text(TEXT)
    sel = probe_selection(sim.topo, sim.config.print_commands)
    labels = [l for l, _ in sel]
    assert labels == ["V(2)", "V(0)", "I(L1)", "V(1)-V(2)", "I(V1)"]
    # ground probe resolves to the constant-zero pseudo-column
    specs = dict(sel)
    assert specs["V(0)"] == -1


def test_probes_only_csv(tmp_path):
    sim = Simulator.from_text(TEXT)
    res = sim.transient()
    full = tmp_path / "full.csv"
    sel = tmp_path / "sel.csv"
    sim.write_transient_csv(str(full), res)
    sim.write_transient_csv(str(sel), res, probes_only=True)
    h_full, d_full = read_csv(str(full))
    h_sel, d_sel = read_csv(str(sel))
    assert h_sel == ["time", "V(2)", "V(0)", "I(L1)", "V(1)-V(2)", "I(V1)"]
    # V(2) column identical to the full CSV's
    np.testing.assert_array_equal(d_sel[:, 1], d_full[:, h_full.index("V(2)")])
    # ground is exactly zero; V(1,2) is the column difference
    np.testing.assert_array_equal(d_sel[:, 2], 0.0)
    np.testing.assert_allclose(
        d_sel[:, 4],
        d_full[:, h_full.index("V(1)")] - d_full[:, h_full.index("V(2)")],
        atol=1e-15)


def test_metadata_json(tmp_path):
    sim = Simulator.from_text(TEXT)
    res = sim.transient()
    meta = transient_metadata(sim, res, wall_s=1.5)
    path = tmp_path / "run.json"
    write_metadata(str(path), meta)
    loaded = json.loads(path.read_text())
    assert loaded["n_unknowns"] == sim.topo.n_unknowns
    assert loaded["n_steps"] == res.n_steps
    assert loaded["newton"]["total"] == int(np.asarray(res.newton_iters).sum())
    assert loaded["solver"]["backend"] == sim.opts.tran_solver
    assert loaded["failed_lanes"] == 0
    assert "histogram" in loaded["newton"]
    assert loaded["timesteps_per_second"] == pytest.approx(res.n_steps / 1.5)
