"""Scoped subcircuit parameters: `.SUBCKT ... PARAMS: a=...` defaults,
per-instance overrides, caller-scope evaluation, and instance-local
`.PARAM` cards (netlist/subckt.py + the native C++ mirror)."""

import numpy as np
import pytest

from circuitsimulator_tpu.api import Simulator


def veq(sim, name):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index


def elem_values(sim):
    return {e.name: getattr(e, "value", None)
            for e in sim.circuit.elements}


PARAMS_NET = """\
.PARAM gr=2k
.SUBCKT div in out PARAMS: rtop=1k rbot=1k
R1 in mid {rtop}
R2 mid out {rbot}
.ENDS
V1 a 0 4
X1 a b div rtop={gr} rbot=2k
X2 b 0 div
RL b 0 100k
"""


def test_defaults_and_overrides_dc():
    sim = Simulator.from_text(PARAMS_NET)
    ev = elem_values(sim)
    # X1 overrides both params ({gr} resolves via the global table)
    assert ev["R1@X1"] == 2000.0 and ev["R2@X1"] == 2000.0
    # X2 takes the declared defaults
    assert ev["R1@X2"] == 1000.0 and ev["R2@X2"] == 1000.0
    x = np.asarray(sim.dc())
    rpar = 2e3 * 1e5 / (2e3 + 1e5)          # X2 (2k) || RL
    np.testing.assert_allclose(x[veq(sim, "b")], 4 * rpar / (4e3 + rpar),
                               rtol=1e-9)


def test_nested_caller_scope_and_local_param():
    net = """\
.SUBCKT half a b PARAMS: r=500
.PARAM rleak={r*2000}
R1 a b {r}
Rg a 0 {rleak}
.ENDS
.SUBCKT full p q PARAMS: r=1
X1 p m half r={r/2}
X2 m q half r={r/2}
.ENDS
V1 in 0 1
XA in out full r=1000
RL out 0 1k
"""
    sim = Simulator.from_text(net)
    ev = elem_values(sim)
    # r=1000 at XA, halved per stage by the caller-scope expression
    assert ev["R1@X1@XA"] == 500.0 and ev["R1@X2@XA"] == 500.0
    # instance-local .PARAM sees the instance's binding
    assert ev["Rg@X1@XA"] == 1e6
    x = np.asarray(sim.dc())
    np.testing.assert_allclose(x[veq(sim, "out")], 0.5, atol=2e-3)


def test_params_keyword_optional_and_spaced_eq():
    net = """\
.SUBCKT load n PARAMS: r = 1k
R1 n 0 {r}
.ENDS
V1 a 0 2
X1 a load r = 250
X2 a load
"""
    sim = Simulator.from_text(net)
    ev = elem_values(sim)
    assert ev["R1@X1"] == 250.0
    assert ev["R1@X2"] == 1000.0


def test_default_referencing_earlier_default():
    net = """\
.SUBCKT rc a b PARAMS: r=1k tau=1m c={tau/r}
R1 a b {r}
C1 b 0 {c}
.ENDS
V1 in 0 1
X1 in out rc r=2k
"""
    sim = Simulator.from_text(net)
    ev = elem_values(sim)
    assert ev["R1@X1"] == 2000.0
    # c default re-evaluates against the overridden r?  No: defaults are
    # bound left-to-right BEFORE overrides (ngspice semantics), so tau/r
    # uses the default r=1k unless c is overridden too.
    assert ev["C1@X1"] == pytest.approx(1e-3 / 1e3)


def test_step_param_rebinds_through_subckt():
    net = """\
.PARAM gr=1k
.SUBCKT load n PARAMS: r={gr}
R1 n 0 {r}
.ENDS
V1 in 0 1
RT in out 1k
X1 out load
.STEP PARAM gr 1k 3k 1k
.op
"""
    sim = Simulator.from_text(net)
    sres = sim.step()
    out_eq = veq(sim, "out")
    xs = np.asarray(sres.result)
    expect = [r / (1000 + r) for r in (1000.0, 2000.0, 3000.0)]
    np.testing.assert_allclose(xs[:, out_eq], expect, rtol=1e-9)


def test_native_frontend_params_parity():
    net = """\
.PARAM gr=2k
.SUBCKT div in out PARAMS: rtop=1k rbot=1k
.PARAM rmid={rtop+rbot}
R1 in mid {rtop}
R2 mid out {rbot}
R3 in out {rmid}
.ENDS
.SUBCKT full p q PARAMS: r=1
X1 p m div rtop={r/2} rbot={r/2}
RQ m q 10
.ENDS
V1 a 0 4
X1 a b div rtop={gr} rbot=2k
X2 b 0 div
XF a c full r=4k
RL b 0 100k
RC c 0 1k
"""
    sims = {fe: Simulator.from_text(net, frontend=fe)
            for fe in ("python", "native")}
    assert (sorted(sims["python"].circuit.node_name_to_id)
            == sorted(sims["native"].circuit.node_name_to_id))
    assert elem_values(sims["python"]) == elem_values(sims["native"])
    np.testing.assert_array_equal(np.asarray(sims["python"].dc()),
                                  np.asarray(sims["native"].dc()))


def test_unknown_param_and_unresolved_default_warn(capsys):
    net = """\
.SUBCKT load n PARAMS: r=1k bad={undefined_thing}
R1 n 0 {r}
.ENDS
V1 a 0 1
X1 a load r=2k typo=5
"""
    sim = Simulator.from_text(net)
    err = capsys.readouterr().err
    assert "cannot resolve default" in err
    assert "is not a parameter of" in err
    assert elem_values(sim)["R1@X1"] == 2000.0


def test_unresolvable_brace_falls_through_to_global_warning(capsys):
    net = """\
.SUBCKT load n PARAMS: r=1k
R1 n 0 {r*nope}
.ENDS
V1 a 0 1
X1 a load
"""
    sim = Simulator.from_text(net)
    err = capsys.readouterr().err
    # flattener left the brace; the parser's global pass owns the warning
    assert "cannot evaluate" in err
    assert "R1@X1" in elem_values(sim)
