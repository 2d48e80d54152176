"""`.FUNC` user-defined expression functions (text pre-pass, extension)."""

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator
from circuitsimulator_tpu.netlist.funcs import expand_funcs


def node_eq(sim, name):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index


def out_v(sim, node="out"):
    x = sim.dc(polish=True)
    return float(x[node_eq(sim, node)])


def test_func_in_brace_group():
    sim = Simulator.from_text("""* func in value
.FUNC half(x) {x/2}
V1 in 0 DC 1
R1 in out {half(2k)}
R2 out 0 1k
.op
""")
    assert out_v(sim) == pytest.approx(0.5, rel=1e-9)


def test_func_in_param_and_nested():
    sim = Simulator.from_text("""* nested funcs
.FUNC sq(x) {x*x}
.FUNC hyp(a,b) {sqrt(sq(a)+sq(b))}
.PARAM rr=hyp(3k,4k)
V1 in 0 DC 1
R1 in out {rr}
R2 out 0 5k
.op
""")
    assert out_v(sim) == pytest.approx(0.5, rel=1e-9)


def test_func_args_substitute_textually():
    # sq(1+2) must expand to ((1+2)*(1+2)) = 9, not 1+2*1+2 = 5
    out = expand_funcs(".FUNC sq(x) {x*x}\n.PARAM a=sq(1+2)\n")
    assert "((1+2)*(1+2))" in out.replace(" ", "")


def test_func_equals_form_and_continuation():
    text = (".FUNC tri(a,b,c)=a+\n+ b +\n+ c\n"
            ".PARAM s=tri(1,2,3)\nV1 n 0 DC {s}\nR1 n 0 1k\n.op\n")
    sim = Simulator.from_text(text)
    assert out_v(sim, "n") == pytest.approx(6.0, rel=1e-9)


def test_func_in_behavioral_source():
    sim = Simulator.from_text("""* func in B expr
.FUNC dbl(x) {2*x}
V1 a 0 DC 1.5
B1 out 0 V=dbl(v(a))
R1 out 0 1k
.op
""")
    assert out_v(sim) == pytest.approx(3.0, rel=1e-6)


def test_func_shadowing_builtin_rejected(capsys):
    out = expand_funcs(".FUNC sin(x) {x}\n.PARAM a={sin(0)}\n")
    err = capsys.readouterr().err
    assert "shadows a builtin" in err
    assert "{sin(0)}" in out          # call left for the builtin


def test_func_native_frontend_sees_expanded_text():
    from circuitsimulator_tpu import native
    if not native.available():
        pytest.skip("native frontend not built")
    sim = Simulator.from_text("""* func native
.FUNC half(x) {x/2}
V1 in 0 DC 1
R1 in out {half(2k)}
R2 out 0 1k
.op
""", frontend="native")
    r1 = next(e for e in sim.circuit.elements if e.name == "R1")
    assert r1.value == pytest.approx(1000.0)
