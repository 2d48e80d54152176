"""Nested (two-source) .DC sweep — `.DC s1 a1 b1 d1 s2 a2 b2 d2`."""

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator
from circuitsimulator_tpu.netlist.parser import parse_netlist_text


DECK = """* resistive summer: V(out) = (v1 + v2)/2 by superposition
V1 a 0 DC 0
V2 b 0 DC 0
R1 a out 1k
R2 b out 1k
.DC V1 0 2 1 V2 0 10 5
.end
"""


def test_nested_sweep_grid_values():
    sim = Simulator.from_text(DECK)
    cfg = sim.config.dc_sweeps[0]
    assert cfg.source2 == "V2"
    assert (cfg.start2, cfg.stop2, cfg.step2) == (0.0, 10.0, 5.0)
    res = sim.dc_sweep()
    v1 = np.asarray(res.values)
    v2 = np.asarray(res.values2)
    assert res.source2 == "V2"
    # outer-major order: V2 slowest
    assert v2.tolist() == [0, 0, 0, 5, 5, 5, 10, 10, 10]
    assert v1.tolist() == [0, 1, 2, 0, 1, 2, 0, 1, 2]
    out_eq = sim.circuit.nodes[sim.circuit.node_name_to_id["out"]].eq_index
    got = np.asarray(res.xs)[:, out_eq]
    assert np.abs(got - (v1 + v2) / 2.0).max() < 1e-6


def test_nested_sweep_mos_family(tmp_path):
    # Id-Vds family: inner Vds sweep, outer Vgs steps
    sim = Simulator.from_text("""* nmos output characteristics
.MODEL mn VT 1 MU 1e-3 COX 1e-3
Vds d 0 DC 0
Vgs g 0 DC 0
M1 d g 0 n 1e-6 1e-6 mn
.DC Vds 0 5 0.5 Vgs 1 3 1
.end
""")
    res = sim.dc_sweep()
    ids = -np.asarray(res.xs)[:, sim.topo.vs_k[0]]   # Vds branch current
    v1 = np.asarray(res.values)
    v2 = np.asarray(res.values2)
    assert len(v1) == 11 * 3
    k = 1e-3 * 1e-3
    # the ramped DC solve leaves a gmin-scale shunt at the drain (reference
    # quirk, ~3e-7 S); estimate it from the vov=0 family and subtract
    off = v2 == 1.0
    g_leak = np.polyfit(v1[off], ids[off], 1)[0]
    ids = ids - g_leak * v1
    # saturation points (vds >= vgs - vt): Id = k/2 (vgs-vt)^2
    sat = v1 >= (v2 - 1.0)
    vov = np.maximum(v2 - 1.0, 0.0)
    want_sat = 0.5 * k * vov**2
    assert np.abs(ids[sat] - want_sat[sat]).max() < 1e-8
    # current increases with vgs at fixed large vds
    last = ids[v1 == 5.0]
    assert last[0] < last[1] < last[2]


def test_nested_sweep_csv(tmp_path):
    from circuitsimulator_tpu.analysis.sweep import write_sweep_csv
    sim = Simulator.from_text(DECK)
    res = sim.dc_sweep()
    path = tmp_path / "sweep.csv"
    write_sweep_csv(str(path), sim.topo, res)
    lines = path.read_text().splitlines()
    assert lines[0].startswith("V2,V1,")
    assert len(lines) == 1 + 9


def test_nested_sweep_native_parity():
    from circuitsimulator_tpu import native
    if not native.available():
        pytest.skip("native frontend not built")
    _, sim_py = parse_netlist_text(DECK)
    _, sim_nat = native.parse_netlist_text_native(DECK)
    assert sim_nat.dc_sweeps == sim_py.dc_sweeps


def test_single_sweep_unchanged():
    sim = Simulator.from_text("""* single
V1 a 0 DC 0
R1 a 0 1k
.DC V1 0 1 0.5
""")
    res = sim.dc_sweep()
    assert res.source2 == "" and res.values2 is None
    assert np.asarray(res.values).tolist() == [0.0, 0.5, 1.0]
