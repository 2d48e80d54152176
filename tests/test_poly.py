"""SPICE2 POLY(n) controlled sources (extension) — lowered onto the
behavioral-source machinery."""

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator
from circuitsimulator_tpu.netlist.parser import parse_netlist_text


def node_eq(sim, name):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index


def test_poly1_linear_matches_plain_e():
    net_p = ("V1 in 0 DC 2\nE1 out 0 POLY(1) in 0 0 3\nR1 out 0 1k\n.op\n")
    net_e = ("V1 in 0 DC 2\nE1 out 0 in 0 3\nR1 out 0 1k\n.op\n")
    vp = Simulator.from_text(net_p)
    ve = Simulator.from_text(net_e)
    a = float(vp.dc()[node_eq(vp, "out")])
    b = float(ve.dc()[node_eq(ve, "out")])
    assert a == pytest.approx(b, rel=1e-7)
    assert a == pytest.approx(6.0, rel=1e-6)


def test_poly1_single_coeff_is_linear():
    # classic SPICE2 shorthand: one coefficient = the linear term
    sim = Simulator.from_text(
        "V1 in 0 DC 2\nE1 out 0 POLY(1) in 0 3\nR1 out 0 1k\n.op\n")
    x = sim.dc()
    assert float(x[node_eq(sim, "out")]) == pytest.approx(6.0, rel=1e-6)


def test_poly1_quadratic():
    # E = 1 + 2*v + 0.5*v^2 at v=2 -> 7
    sim = Simulator.from_text(
        "V1 in 0 DC 2\nE1 out 0 POLY(1) in 0 1 2 0.5\nR1 out 0 1k\n.op\n")
    x = sim.dc()
    assert float(x[node_eq(sim, "out")]) == pytest.approx(7.0, rel=1e-6)


def test_poly2_multiplier():
    # classic analog multiplier: E = 0 + 0*va + 0*vb + 0*va^2 + 1*va*vb
    sim = Simulator.from_text(
        "V1 a 0 DC 3\nV2 b 0 DC -2\n"
        "E1 out 0 POLY(2) a 0 b 0 0 0 0 0 1\nR1 out 0 1k\n.op\n")
    x = sim.dc()
    assert float(x[node_eq(sim, "out")]) == pytest.approx(-6.0, rel=1e-6)


def test_poly_g_and_f():
    # G POLY current: i = 1m*v(a); F POLY: i = 2*i(Vs)
    sim = Simulator.from_text(
        "V1 a 0 DC 4\nG1 0 o1 POLY(1) a 0 1m\nRo1 o1 0 1k\n"
        "Vs a s 0\nRs s 0 1k\nF1 0 o2 POLY(1) Vs 2\nRo2 o2 0 1k\n.op\n")
    x = sim.dc()
    # G: 4 mA into o1 -> 4 V
    assert float(x[node_eq(sim, "o1")]) == pytest.approx(4.0, rel=1e-3)
    # i(Vs) = 4 mA (a->s); F drives 8 mA into o2 -> 8 V
    assert float(x[node_eq(sim, "o2")]) == pytest.approx(8.0, rel=1e-3)


def test_poly_h_ccvs():
    sim = Simulator.from_text(
        "V1 a 0 DC 1\nVs a s 0\nRs s 0 100\n"
        "H1 out 0 POLY(1) Vs 0 500\nRo out 0 1k\n.op\n")
    x = sim.dc()
    # i(Vs) = 10 mA -> V(out) = 5 V
    assert float(x[node_eq(sim, "out")]) == pytest.approx(5.0, rel=1e-3)


def test_poly_in_subckt():
    sim = Simulator.from_text("""* poly in subckt
.SUBCKT sq in out
E1 out 0 POLY(1) in 0 0 0 1
.ENDS
V1 a 0 DC 3
X1 a b sq
Rb b 0 1k
.op
""")
    x = sim.dc()
    assert float(x[node_eq(sim, "b")]) == pytest.approx(9.0, rel=1e-6)


def test_poly_native_frontend_parity():
    from circuitsimulator_tpu import native
    if not native.available():
        pytest.skip("native frontend not built")
    import dataclasses
    text = ("V1 a 0 1\nV2 b 0 2\nVs a s 0\nRs s 0 1k\n"
            "E1 o1 0 POLY(2) a 0 b 0 0 1m 2.2k 0 0.5\n"
            "G1 o1 0 POLY(1) a 0 1u 2u\n"
            "F1 o1 0 POLY(1) Vs 2\n"
            "H1 o2 0 POLY(1) Vs 0 10\n"
            "Ro1 o1 0 1k\nRo2 o2 0 1k\n.op\n")
    ckt_py, _ = parse_netlist_text(text)
    ckt_nat, _ = native.parse_netlist_text_native(text)
    ckt_py.assign_equation_indices()
    ckt_nat.assign_equation_indices()
    assert len(ckt_nat.elements) == len(ckt_py.elements)
    for a, b in zip(ckt_nat.elements, ckt_py.elements):
        assert dataclasses.asdict(a) == dataclasses.asdict(b), (a, b)
    # the raw coefficient tokens survive verbatim in the expression
    e1 = next(e for e in ckt_py.elements if e.name == "E1")
    assert e1.b_expr == "0 + 1m*v(a,0) + 2.2k*v(b,0) + 0*v(a,0)**2 " \
                       "+ 0.5*v(a,0)*v(b,0)"
