"""Behavioral B sources (extension): expressions compiled to JAX with
autodiff-derived Newton stamps (utils/expr.py compile_jax + ops/assemble)."""

import math

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator
from circuitsimulator_tpu.netlist.parser import parse_netlist_text


def node_eq(sim, name):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index


def test_constant_bv():
    sim = Simulator.from_text("B1 a 0 V=2.5\nR1 a 0 1k\n.op\n")
    x = sim.dc()
    assert float(x[node_eq(sim, "a")]) == pytest.approx(2.5, rel=1e-9)


def test_linear_vcvs_equivalent():
    # B V=3*v(in) must match an E element with gain 3
    net_b = "V1 in 0 DC 2\nB1 out 0 V=3*v(in)\nR1 out 0 1k\n.op\n"
    net_e = "V1 in 0 DC 2\nE1 out 0 in 0 3\nR1 out 0 1k\n.op\n"
    xb = Simulator.from_text(net_b)
    xe = Simulator.from_text(net_e)
    vb = float(xb.dc()[node_eq(xb, "out")])
    ve = float(xe.dc()[node_eq(xe, "out")])
    # B runs through the ramped nonlinear DC path (gmin leak,
    # step-size stop); E is one linear solve
    assert vb == pytest.approx(ve, rel=1e-8)
    assert vb == pytest.approx(6.0, rel=1e-9)


def test_nonlinear_multiplier_dc():
    # analog multiplier: V(out) = v(a)*v(b)
    sim = Simulator.from_text(
        "V1 a 0 DC 3\nV2 b 0 DC -2\nB1 out 0 V=v(a)*v(b)\nR1 out 0 1k\n.op\n")
    x = sim.dc()
    assert float(x[node_eq(sim, "out")]) == pytest.approx(-6.0, rel=1e-9)


def test_bi_nonlinear_conductance():
    # I = 1m * v(a)^2 pulled out of node a (two-terminal nonlinear R):
    # KCL at a: (10 - v)/1k = 1m*v^2 -> v^2 + v - 10 = 0 -> v = 2.7016
    sim = Simulator.from_text(
        "V1 s 0 DC 10\nR1 s a 1k\nB1 a 0 I=1m*v(a)**2\n.op\n")
    x = sim.dc()
    expect = (-1 + math.sqrt(41)) / 2
    assert float(x[node_eq(sim, "a")]) == pytest.approx(expect, rel=1e-3)  # gmin-leak scale


def test_time_dependent_bv_transient():
    sim = Simulator.from_text(
        "B1 a 0 V=sin(2*pi*1e6*time)\nR1 a 0 1k\n.TRAN 10n 2u\n")
    res = sim.transient()
    t = np.asarray(res.times)
    v = np.asarray(res.xs)[:, node_eq(sim, "a")]
    np.testing.assert_allclose(v, np.sin(2 * np.pi * 1e6 * t), atol=2e-3)


def test_branch_current_ref():
    # current-controlled behavioral: V(out) = 1000 * i(Vs)
    sim = Simulator.from_text(
        "Vs in 0 DC 1\nR1 in 0 100\nB1 out 0 V=1000*i(Vs)\nRo out 0 1k\n.op\n")
    x = sim.dc()
    # i(Vs) = -10 mA (MNA branch convention: current p->m inside source)
    assert float(x[node_eq(sim, "out")]) == pytest.approx(-10.0, rel=1e-4)  # gmin leak


def test_param_reference_in_expr():
    sim = Simulator.from_text(
        ".PARAM gain=4\nV1 in 0 DC 2\nB1 out 0 V=gain*v(in)\nR1 out 0 1k\n.op\n")
    x = sim.dc()
    assert float(x[node_eq(sim, "out")]) == pytest.approx(8.0, rel=1e-9)


def test_differential_probe():
    sim = Simulator.from_text(
        "V1 a 0 DC 5\nR1 a b 1k\nR2 b 0 1k\n"
        "B1 out 0 V=2*v(a,b)\nRo out 0 1k\n.op\n")
    x = sim.dc()
    assert float(x[node_eq(sim, "out")]) == pytest.approx(5.0, rel=1e-3)  # gmin leak


def test_bsource_transient_oscillator_limiter():
    # soft limiter in a feedback loop: V(out) = tanh(5*v(in)); driven by a
    # sine, output saturates near +-1
    sim = Simulator.from_text(
        "V1 in 0 SIN 0 2 1e6\nB1 out 0 V=tanh(5*v(in))\nR1 out 0 1k\n"
        ".TRAN 5n 2u\n")
    res = sim.transient()
    v = np.asarray(res.xs)[:, node_eq(sim, "out")]
    assert v.max() == pytest.approx(1.0, abs=1e-3)
    assert v.min() == pytest.approx(-1.0, abs=1e-3)


def test_bsource_ac_linearization():
    # AC through the multiplier linearized at the OP: d(va*vb)/dva = vb0
    sim = Simulator.from_text(
        "V1 a 0 DC 3 AC 1\nV2 b 0 DC -2\nB1 out 0 V=v(a)*v(b)\n"
        "R1 out 0 1k\n.AC lin 1 1e3 1e3\n")
    acres = sim.ac()
    vout = np.asarray(acres.xs)[0, node_eq(sim, "out")]
    assert vout.imag == pytest.approx(0.0, abs=1e-9)
    assert vout.real == pytest.approx(-2.0, rel=1e-3)  # OP gmin leak


def test_unknown_node_in_expr_is_loud():
    with pytest.raises(ValueError):
        Simulator.from_text("B1 a 0 V=2*v(zzz)\nR1 a 0 1k\n.op\n")


def test_bsource_native_frontend_parity():
    from circuitsimulator_tpu import native
    if not native.available():
        pytest.skip("native frontend not built")
    import dataclasses
    text = ("V1 in 0 DC 1\n"
            "B1 out 0 V=3*v(in) + sin(2*pi*time)\n"
            "B2 out 0 I = 1m * v(out) ** 2\n"
            "Ro out 0 1k\n.op\n")
    ckt_py, _ = parse_netlist_text(text)
    ckt_nat, _ = native.parse_netlist_text_native(text)
    ckt_py.assign_equation_indices()
    ckt_nat.assign_equation_indices()
    assert len(ckt_nat.elements) == len(ckt_py.elements) == 4
    for a, b in zip(ckt_nat.elements, ckt_py.elements):
        assert dataclasses.asdict(a) == dataclasses.asdict(b), (a, b)


def test_step_rebinds_behavioral_param():
    # behavioral .PARAM references are DYNAMIC (params["b_consts"]), so a
    # .STEP re-binding flows through without recompiling the expression
    sim = Simulator.from_text("""* step through a behavioral gain
.PARAM g=2
V1 in 0 DC 3
B1 out 0 V=g*v(in)
R1 out 0 1k
.STEP PARAM g LIST 1 2 4
.op
""")
    sres = sim.step()
    eq = node_eq(sim, "out")
    np.testing.assert_allclose(np.asarray(sres.result)[:, eq],
                               [3.0, 6.0, 12.0], rtol=1e-6)


def test_invalid_expression_dropped_by_both_frontends():
    from circuitsimulator_tpu import native
    text = "B1 a 0 V=2**\nR1 a 0 1k\nV1 a 0 1\n.op\n"
    ckt_py, _ = parse_netlist_text(text)
    assert [e.name for e in ckt_py.elements] == ["R1", "V1"]
    if native.available():
        ckt_nat, _ = native.parse_netlist_text_native(text)
        assert [e.name for e in ckt_nat.elements] == ["R1", "V1"]


def test_bsource_woodbury_matches_lu():
    """B-source rank-1 rows on the Woodbury plan == per-iteration LU
    (I-form multiplier + V-form limiter with a time term, f64)."""
    import dataclasses
    import jax.numpy as jnp
    from circuitsimulator_tpu.utils.options import DEFAULT_OPTIONS
    net = """\
V1 a 0 SIN 0 1 1e4
V2 b 0 SIN 0 1 1.3e4
R1 a 0 1k
R2 b 0 1k
B1 p 0 I=v(a)*v(b)*1m
RP p 0 1k
B2 q 0 V=tanh(v(p)*2)+0.1*sin(6.28e4*time)
RQ q 0 2k
C1 q 0 10n
D1 q 0 IS=1e-14
.TRAN 1u 200u
"""
    res = {}
    for solver in ("lu", "woodbury"):
        opts = dataclasses.replace(DEFAULT_OPTIONS, dtype=jnp.float64,
                                   tran_solver=solver)
        sim = Simulator.from_text(net, opts=opts)
        res[solver] = np.asarray(sim.transient().xs)
    np.testing.assert_allclose(res["woodbury"], res["lu"], atol=1e-10)


def test_bsource_woodbury_plan_shape():
    from circuitsimulator_tpu.ops.woodbury import WoodburyPlan
    sim = Simulator.from_text(
        "V1 a 0 1\nR1 a 0 1k\nB1 p 0 I=v(a)*v(a)\nRP p 0 1k\n"
        "S1 p q a 0 swm\nRQ q 0 1k\n.MODEL swm SW RON=1 ROFF=1e6 VT=0.5\n"
        ".op\n")
    plan = WoodburyPlan(sim.engine)
    # switch forces W=4; the B row (one probe pair, width 2) pads to it
    assert plan.nB == 1 and plan.nS == 1 and plan.W == 4
    assert plan.k == 2
