""".INCLUDE/.LIB expansion (netlist/include.py) and .STEP TEMP."""

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator
from circuitsimulator_tpu.netlist.include import expand_includes


def node_eq(sim, name):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index


def test_include_basic(tmp_path):
    (tmp_path / "models.inc").write_text(
        ".MODEL nm1 vt 0.7 mu 350u cox 2.3m\n")
    (tmp_path / "top.sp").write_text(
        "* top\n.INCLUDE models.inc\nVdd d 0 DC 5\n"
        "M1 d g 0 nm1 10u 1u\nRg g 0 1k\n.op\n")
    sim = Simulator.from_file(str(tmp_path / "top.sp"))
    assert "nm1" in sim.circuit.mos_models
    assert sim.circuit.node_name_to_id.get("d") is not None


def test_include_nested_relative(tmp_path):
    sub = tmp_path / "lib"
    sub.mkdir()
    (sub / "inner.inc").write_text("R2 a 0 2k\n")
    (sub / "outer.inc").write_text("R1 a 0 2k\n.INC inner.inc\n")
    (tmp_path / "top.sp").write_text(
        "* top\n.include lib/outer.inc\nV1 a 0 DC 2\n.op\n")
    sim = Simulator.from_file(str(tmp_path / "top.sp"))
    names = [e.name for e in sim.circuit.elements]
    assert "R1" in names and "R2" in names
    # branch current: 2 V across 1k parallel
    x = sim.dc()
    assert float(x[node_eq(sim, "a")]) == pytest.approx(2.0)


def test_lib_section(tmp_path):
    (tmp_path / "corners.lib").write_text(
        ".LIB fast\n.PARAM rv=500\n.ENDL\n"
        ".LIB slow\n.PARAM rv=2k\n.ENDL\n")
    (tmp_path / "top.sp").write_text(
        "* top\n.lib corners.lib slow\nV1 a 0 DC 1\nR1 a 0 {rv}\n.op\n")
    sim = Simulator.from_file(str(tmp_path / "top.sp"))
    assert sim.config.param_values["rv"] == pytest.approx(2000.0)


def test_missing_include_warns_and_continues(tmp_path, capsys):
    (tmp_path / "top.sp").write_text(
        "* top\n.INCLUDE nope.inc\nV1 a 0 DC 1\nR1 a 0 1k\n.op\n")
    sim = Simulator.from_file(str(tmp_path / "top.sp"))
    assert len(sim.circuit.elements) == 2


def test_circular_include_bounded(tmp_path):
    (tmp_path / "a.inc").write_text(".include b.inc\nR1 x 0 1k\n")
    (tmp_path / "b.inc").write_text(".include a.inc\n")
    out = expand_includes(".include a.inc\n", str(tmp_path))
    assert out.count("R1 x 0 1k") == 1


def test_step_temp_diode():
    # diode forward drop falls with temperature at fixed current
    sim = Simulator.from_text("""* temp step
I1 0 a DC 1m
D1 a 0 IS=1e-12
.STEP TEMP LIST 0 27 100
.op
""")
    sres = sim.step()
    assert sres.kind == "temp"
    v = np.asarray(sres.result)[:, 0]
    assert v[0] < v[1] < v[2] or v[0] > v[1] > v[2]
    # monotone in temperature; at higher T the thermal voltage rises so
    # the drop at 1 mA rises ~ n*VT*ln(I/IS) (IS held constant here)
    assert v[2] > v[0]


def test_step_temp_native_parity():
    from circuitsimulator_tpu import native
    if not native.available():
        pytest.skip("native frontend not built")
    import dataclasses
    from circuitsimulator_tpu.netlist.parser import parse_netlist_text
    text = "V1 a 0 1\nR1 a 0 1k\n.STEP TEMP 0 100 50\n.op\n"
    _, sp = parse_netlist_text(text)
    _, sn = native.parse_netlist_text_native(text)
    assert ([dataclasses.asdict(s) for s in sn.steps]
            == [dataclasses.asdict(s) for s in sp.steps])
    assert sp.steps[0].kind == "temp"


def test_quoted_include_path_with_spaces(tmp_path):
    (tmp_path / "my lib.inc").write_text("R1 a 0 1k\n")
    (tmp_path / "top.sp").write_text(
        '* top\n.INCLUDE "my lib.inc"\nV1 a 0 DC 1\n.op\n')
    sim = Simulator.from_file(str(tmp_path / "top.sp"))
    assert [e.name for e in sim.circuit.elements] == ["R1", "V1"]


def test_diamond_include_splices_twice(tmp_path):
    (tmp_path / "common.inc").write_text("* common marker\n")
    (tmp_path / "a.inc").write_text(".include common.inc\n")
    (tmp_path / "b.inc").write_text(".include common.inc\n")
    out = expand_includes(".include a.inc\n.include b.inc\n", str(tmp_path))
    assert out.count("common marker") == 2
