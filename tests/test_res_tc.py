"""Resistor temperature coefficients (TC=tc1[,tc2], extension) with
.TEMP and .STEP TEMP."""

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator
from circuitsimulator_tpu.netlist.parser import parse_netlist_text


def vdiv_deck(temp_line, tc_spec):
    return f"""* divider with hot top resistor
V1 in 0 DC 1
R1 in out 1k {tc_spec}
R2 out 0 1k
{temp_line}
.op
"""


def out_v(sim):
    x = sim.dc(polish=True)
    eq = sim.circuit.nodes[sim.circuit.node_name_to_id["out"]].eq_index
    return float(x[eq])


def test_tc1_scales_resistance():
    # dT = 100 C: R1 = 1k * (1 + 1m*100) = 1100
    sim = Simulator.from_text(vdiv_deck(".TEMP 127", "TC=1m"))
    assert out_v(sim) == pytest.approx(1000.0 / 2100.0, rel=1e-9)


def test_tc2_quadratic_term():
    # R1 = 1k * (1 + 1m*100 + 10u*100^2) = 1200
    sim = Simulator.from_text(vdiv_deck(".TEMP 127", "TC=1m,10u"))
    assert out_v(sim) == pytest.approx(1000.0 / 2200.0, rel=1e-9)


def test_tc_separate_keys():
    sim = Simulator.from_text(vdiv_deck(".TEMP 127", "TC1=1m TC2=10u"))
    assert out_v(sim) == pytest.approx(1000.0 / 2200.0, rel=1e-9)


def test_no_temp_card_means_nominal():
    sim = Simulator.from_text(vdiv_deck("", "TC=1m"))
    assert out_v(sim) == pytest.approx(0.5, rel=1e-9)


def test_negative_delta():
    # dT = -73: R1 = 1k * (1 - 0.073) = 927
    sim = Simulator.from_text(vdiv_deck(".TEMP -46", "TC=1m"))
    assert out_v(sim) == pytest.approx(1000.0 / 1927.0, rel=1e-9)


def test_step_temp_sweeps_resistance():
    sim = Simulator.from_text("""* step temp
V1 in 0 DC 1
R1 in out 1k TC=1m
R2 out 0 1k
.STEP TEMP LIST 27 127
.op
""")
    res = sim.step()
    assert res.analysis == "op"
    eq = sim.circuit.nodes[sim.circuit.node_name_to_id["out"]].eq_index
    vals = np.asarray(res.result)[..., eq].ravel()
    assert vals[0] == pytest.approx(0.5, rel=1e-6)
    assert vals[1] == pytest.approx(1000.0 / 2100.0, rel=1e-6)


def test_native_parity_tc():
    from circuitsimulator_tpu import native
    if not native.available():
        pytest.skip("native frontend not built")
    import dataclasses
    text = vdiv_deck(".TEMP 127", "TC=1m,10u")
    ckt_py, _ = parse_netlist_text(text)
    ckt_nat, _ = native.parse_netlist_text_native(text)
    ckt_py.assign_equation_indices()
    ckt_nat.assign_equation_indices()
    for a, b in zip(ckt_nat.elements, ckt_py.elements):
        assert dataclasses.asdict(a) == dataclasses.asdict(b), (a, b)
    r1 = next(e for e in ckt_nat.elements if e.name == "R1")
    assert (r1.tc1, r1.tc2) == (pytest.approx(1e-3), pytest.approx(1e-5))
