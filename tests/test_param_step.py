"""`.PARAM` expressions (utils/expr.py) and `.STEP` vmapped sweeps
(analysis/step.py)."""

import math

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator
from circuitsimulator_tpu.netlist.parser import parse_netlist_text
from circuitsimulator_tpu.utils.expr import eval_expr, ExprError


# ---- expression evaluator ----

def test_eval_basics():
    assert eval_expr("1+2*3") == 7
    assert eval_expr("(1+2)*3") == 9
    assert eval_expr("2**10") == 1024
    assert eval_expr("2^10") == 1024
    assert eval_expr("-2**2") == -4          # ngspice convention
    assert eval_expr("10%3") == 1
    assert eval_expr("2.2k") == pytest.approx(2200.0)
    assert eval_expr("1meg/2") == pytest.approx(5e5)
    assert eval_expr("sqrt(2)") == pytest.approx(math.sqrt(2))
    assert eval_expr("min(3, 5) + max(1, 2)") == 5
    assert eval_expr("2*pi") == pytest.approx(2 * math.pi)
    assert eval_expr("exp(1)") == pytest.approx(math.e)
    assert eval_expr("atan2(1, 1)") == pytest.approx(math.pi / 4)


def test_eval_bindings_case_insensitive():
    assert eval_expr("2*Rload", {"rload": 50.0}) == 100.0
    assert eval_expr("RLOAD", {"rLoad": 50.0}) == 50.0


def test_eval_errors():
    with pytest.raises(ExprError):
        eval_expr("1 +")
    with pytest.raises(ExprError):
        eval_expr("undefined_name")
    with pytest.raises(ExprError):
        eval_expr("sin(1, 2)")
    with pytest.raises(ExprError):
        eval_expr("1/0")
    with pytest.raises(ExprError):
        eval_expr("3 @ 4")


# ---- .PARAM in netlists ----

PARAM_NET = """* params
.PARAM rval=1k cval={2*0.5n} vdd=3.3
.PARAM rtop={2*rval}
V1 in 0 DC {vdd}
R1 in out {rtop}
R2 out 0 {rval}
C1 out 0 {cval}
.op
"""


def test_param_substitution():
    ckt, sim = parse_netlist_text(PARAM_NET)
    assert sim.param_values["rval"] == pytest.approx(1000.0)
    assert sim.param_values["rtop"] == pytest.approx(2000.0)
    assert sim.param_values["cval"] == pytest.approx(1e-9)
    vals = {e.name: e for e in ckt.elements}
    assert vals["R1"].value == pytest.approx(2000.0)
    assert vals["R2"].value == pytest.approx(1000.0)
    assert vals["C1"].value == pytest.approx(1e-9)
    assert vals["V1"].spec.dc == pytest.approx(3.3)


def test_param_forward_reference():
    _, sim = parse_netlist_text(
        ".PARAM a={b+1}\n.PARAM b=2\nR1 x 0 {a}\n.op\n")
    assert sim.param_values["a"] == pytest.approx(3.0)


def test_param_override_wins():
    ckt, _ = parse_netlist_text("*\n.PARAM rv=1k\nR1 a 0 {rv}\n.op\n",
                                param_overrides={"rv": 500.0})
    assert ckt.elements[0].value == pytest.approx(500.0)


def test_param_dc_solution():
    sim = Simulator.from_text(PARAM_NET)
    x = sim.dc()
    out_eq = sim.circuit.nodes[sim.circuit.node_name_to_id["out"]].eq_index
    assert float(x[out_eq]) == pytest.approx(3.3 / 3.0, rel=1e-9)


def test_braced_expression_with_spaces():
    ckt, _ = parse_netlist_text("R1 a 0 { 2 * 500 }\n.op\n")
    assert ckt.elements[0].value == pytest.approx(1000.0)


# ---- .STEP ----

STEP_PARAM_NET = """* step a divider ratio
.PARAM rbot=1k
V1 in 0 DC 6
R1 in out 1k
R2 out 0 {rbot}
.STEP PARAM rbot 1k 3k 1k
.op
"""


def test_step_param_dc():
    sim = Simulator.from_text(STEP_PARAM_NET)
    sres = sim.step()
    assert sres.analysis == "op" and sres.kind == "param"
    assert sres.values == pytest.approx([1000.0, 2000.0, 3000.0])
    out_eq = sim.circuit.nodes[sim.circuit.node_name_to_id["out"]].eq_index
    xs = np.asarray(sres.result)
    expect = [6 * r / (1000 + r) for r in (1000.0, 2000.0, 3000.0)]
    np.testing.assert_allclose(xs[:, out_eq], expect, rtol=1e-9)


def test_step_source_list():
    sim = Simulator.from_text(
        "V1 in 0 DC 1\nR1 in out 2k\nR2 out 0 2k\n"
        ".STEP V1 LIST 1 2 5\n.op\n")
    sres = sim.step()
    assert sres.kind == "source"
    out_eq = sim.circuit.nodes[sim.circuit.node_name_to_id["out"]].eq_index
    xs = np.asarray(sres.result)
    np.testing.assert_allclose(xs[:, out_eq], [0.5, 1.0, 2.5], rtol=1e-9)


def test_param_step_native_frontend_parity():
    from circuitsimulator_tpu import native
    if not native.available():
        pytest.skip("native frontend not built")
    import dataclasses
    text = (PARAM_NET.replace(".op", ".STEP PARAM rval 500 1.5k 500\n.op")
            + ".PARAM extra={sqrt(2)*rval + min(rval, 1)}\n"
            + "R3 out 0 {extra}\n"
            + ".MODEL mm VT {0.5+0.2} MU 1e-2 COX 1e-3\n"
            + "M1 in out 0 mm {2u} {1u}\n")
    ckt_py, sim_py = parse_netlist_text(text)
    ckt_nat, sim_nat = native.parse_netlist_text_native(text)
    ckt_py.assign_equation_indices()
    ckt_nat.assign_equation_indices()
    assert sim_nat.param_values == sim_py.param_values   # bit-identical
    assert ([dataclasses.asdict(s) for s in sim_nat.steps]
            == [dataclasses.asdict(s) for s in sim_py.steps])
    for a, b in zip(ckt_nat.elements, ckt_py.elements):
        assert dataclasses.asdict(a) == dataclasses.asdict(b), (a, b)


def test_dc_polish_removes_gmin_leak():
    import jax.numpy as jnp
    sim = Simulator.from_text(
        ".MODEL nm1 vt 0.7 mu 350u cox 2.3m\nVdd vdd 0 DC 5\n"
        "Vg g 0 DC 1.5\nRd vdd d 10k\nM1 d g 0 nm1 1000u 1u\n.op\n")
    d_eq = sim.circuit.nodes[sim.circuit.node_name_to_id["d"]].eq_index
    x_raw = sim.dc()
    x_pol = sim.dc(polish=True)
    # analytic: Id = 0.5*K*Vov^2 with K = 350u*2.3m*1000, Vov = 0.8
    k = 350e-6 * 2.3e-3 * 1000
    vd = 5.0 - 1e4 * 0.5 * k * 0.64
    assert abs(float(x_pol[d_eq]) - vd) < 1e-9
    assert abs(float(x_raw[d_eq]) - vd) > 1e-6    # the reference leak


def test_step_cartesian_two_cards():
    sim = Simulator.from_text("""* grid
.PARAM rbot=1k
V1 in 0 DC 2
R1 in out 1k
R2 out 0 {rbot}
.STEP PARAM rbot LIST 1k 3k
.STEP V1 LIST 2 4
.op
""")
    sres = sim.step()
    assert sres.kind == "param,source"
    assert len(sres.values) == 4
    out_eq = sim.circuit.nodes[sim.circuit.node_name_to_id["out"]].eq_index
    xs = np.asarray(sres.result)
    got = dict(zip([tuple(v) for v in sres.values], xs[:, out_eq]))
    for (rb, v1), vout in got.items():
        assert vout == pytest.approx(v1 * rb / (1000 + rb), rel=1e-9)


def test_step_cartesian_csv(tmp_path):
    from circuitsimulator_tpu.analysis.step import write_step_csv
    sim = Simulator.from_text(
        "V1 a 0 DC 1\nR1 a 0 1k\n"
        ".STEP V1 LIST 1 2\n.STEP TEMP LIST 0 100\n.op\n")
    sres = sim.step()
    p = tmp_path / "grid.csv"
    write_step_csv(str(p), sim.topo, sres)
    lines = p.read_text().strip().split("\n")
    assert lines[0].startswith("V1,temp,")
    assert len(lines) == 5


def test_step_transient_with_measures(tmp_path):
    sim = Simulator.from_text("""* step RC tau
.PARAM rr=1k
V1 in 0 PULSE(0 1 0 1n 1n 1 2)
R1 in out {rr}
C1 out 0 1n
.TRAN 20n 8u
.STEP PARAM rr LIST 1k 2k
.MEASURE TRAN t63 WHEN V(out)=0.632 RISE=1
""")
    sres = sim.step()
    assert sres.analysis == "tran"
    (name, t63) = sres.measures[0]
    assert name == "t63"
    # tau = R*C: 1us and 2us
    np.testing.assert_allclose(t63, [1.02e-6, 2.04e-6], rtol=5e-2)
    # CSV writer smoke
    from circuitsimulator_tpu.analysis.step import write_step_csv
    p = tmp_path / "step.csv"
    write_step_csv(str(p), sim.topo, sres)
    lines = p.read_text().strip().split("\n")
    assert lines[0] == "rr,t63"
    assert len(lines) == 3
