"""Hierarchical netlists: .SUBCKT/.ENDS/X flattening (netlist/subckt.py)."""

import numpy as np
import pytest

from circuitsimulator_tpu.api import Simulator
from circuitsimulator_tpu.netlist.lexer import lex_text
from circuitsimulator_tpu.netlist.subckt import flatten_subcircuits


def veq(sim, name):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index


def test_basic_flatten_dc():
    net = """\
.SUBCKT div in out
R1 in mid 1k
R2 mid out 1k
.ENDS
V1 a 0 4
X1 a b div
X2 b 0 div
RL b 0 100k
"""
    sim = Simulator.from_text(net)
    x = np.asarray(sim.dc())
    # series 2k, then 2k || 100k to ground
    rpar = 2e3 * 1e5 / (2e3 + 1e5)
    np.testing.assert_allclose(x[veq(sim, "b")], 4 * rpar / (2e3 + rpar),
                               rtol=1e-12)
    # internal nodes got instance-scoped names
    assert "X1.mid" in sim.circuit.node_name_to_id
    assert "X2.mid" in sim.circuit.node_name_to_id


def test_nested_instances_and_ground_global():
    net = """\
.SUBCKT half a b
R1 a b 500
Rg a 0 1e6
.ENDS
.SUBCKT full p q
X1 p m half
X2 m q half
.ENDS
V1 in 0 1
XA in out full
RL out 0 1k
"""
    sim = Simulator.from_text(net)
    x = np.asarray(sim.dc())
    # ~1k series (with tiny 1M leaks) into 1k load
    np.testing.assert_allclose(x[veq(sim, "out")], 0.5, atol=2e-3)
    assert "XA.m" in sim.circuit.node_name_to_id
    assert "X1@XA.m" not in sim.circuit.node_name_to_id  # ports map through


def test_model_hoisted_and_mos_inside_subckt():
    net = """\
.SUBCKT inv vin vout vdd
M1 vout vin 0 n 10u 1u mn
RL vdd vout 10k
.MODEL mn VT 0.7 MU 5e-2 COX 2e-3 LAMBDA 0.0
.ENDS
VDD vdd 0 5
VIN in 0 2
X1 in out vdd inv
"""
    sim = Simulator.from_text(net)
    x = np.asarray(sim.dc())
    # triode: (5-V)/RL = k*(vov*V - V^2/2) with k=1e-3, vov=1.3
    # -> 5 V^2 - 14 V + 5 = 0 -> V = (14 - sqrt(96))/10
    v_exact = (14.0 - np.sqrt(96.0)) / 10.0
    np.testing.assert_allclose(x[veq(sim, "out")], v_exact, atol=5e-4)


def test_ctrl_source_reference_scoped():
    """F's controlling V source defined inside the same subckt instance."""
    net = """\
.SUBCKT sense inp outp
Vs inp m 0
Rm m 0 1k
F1 outp 0 Vs 3
.ENDS
V1 a 0 2
X1 a f1out sense
RF f1out 0 1k
"""
    sim = Simulator.from_text(net)
    x = np.asarray(sim.dc())
    # branch current of Vs@X1 (current leaving node a into the branch)
    # is +2 mA; F injects 3*I out of outp, so V(f1out) = -3*2mA*1k = -6 V
    np.testing.assert_allclose(x[veq(sim, "f1out")], -6.0, rtol=1e-12)


def test_flatten_warnings(capsys):
    stmts = lex_text("""\
X1 a b nodef
.ENDS
V1 a 0 1
R1 a b 1k
RB b 0 1k
""")
    out = flatten_subcircuits(stmts)
    err = capsys.readouterr().err
    assert "unknown subcircuit" in err
    assert ".ENDS without .SUBCKT" in err
    assert [s.tokens[0] for s in out] == ["V1", "R1", "RB"]


def test_port_count_mismatch(capsys):
    net = """\
.SUBCKT two a b
R1 a b 1k
.ENDS
V1 x 0 1
X1 x y z two
Ry y 0 1k
"""
    sim = Simulator.from_text(net)
    err = capsys.readouterr().err
    assert "3 nets for 2 ports" in err
    assert sim.topo.counts["R"] == 1  # instance dropped, Ry remains


def test_transient_through_subckt():
    net = """\
.SUBCKT rc i o
R1 i o 1k
C1 o 0 1u
.ENDS
V1 in 0 PULSE 0 1 0 1e-12 1e-12 1 2
X1 in out rc
.TRAN 2e-4 2e-3
"""
    sim = Simulator.from_text(net)
    res = sim.transient()
    assert not bool(res.failed)
    v = np.asarray(res.xs)[:, veq(sim, "out")]
    ts = np.asarray(res.times)
    assert np.abs(v - (1 - np.exp(-ts / 1e-3))).max() < 0.06


def test_native_frontend_flatten_parity():
    net = """\
.SUBCKT half a b
R1 a b 500
.ENDS
.SUBCKT full p q
X1 p m half
X2 m q half
.MODEL hn VT 0.5 MU 1e-2 COX 1e-3
.ENDS
V1 in 0 1
XA in out full
RL out 0 1k
"""
    sims = {fe: Simulator.from_text(net, frontend=fe)
            for fe in ("python", "native")}
    assert (sorted(sims["python"].circuit.node_name_to_id)
            == sorted(sims["native"].circuit.node_name_to_id))
    # hoisted model lands in the (python-side) registry; the native
    # frontend resolves models into element params inside C++
    assert "hn" in sims["python"].circuit.mos_models
    np.testing.assert_array_equal(np.asarray(sims["python"].dc()),
                                  np.asarray(sims["native"].dc()))


def test_global_nodes_shared_across_instances():
    """`.GLOBAL vdd`: the rail keeps its name inside every definition
    (extension; both frontends)."""
    net = """\
.GLOBAL vdd
.SUBCKT inv in out
Rload vdd out 10k
M1 out in 0 b mn W=10u L=1u
.ENDS
.MODEL mn VT 0.6 MU 2e-2 COX 1e-3
VDD vdd 0 3
VIN a 0 1.2
X1 a b inv
X2 b c inv
RL c 0 1meg
.op
"""
    xs = {}
    for fe in ("python", "native"):
        sim = Simulator.from_text(net, frontend=fe)
        names = sim.circuit.node_name_to_id
        assert "vdd" in names and "X1.vdd" not in names
        xs[fe] = np.asarray(sim.dc())
    np.testing.assert_array_equal(xs["python"], xs["native"])
    # both inverters actually pull from the shared rail
    sim = Simulator.from_text(net)
    b = sim.circuit.nodes[sim.circuit.node_name_to_id["b"]].eq_index
    assert 0.1 < float(xs["python"][b]) < 3.0
