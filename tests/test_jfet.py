"""JFET (J element, Shichman-Hodges square law — extension)."""

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator, DEFAULT_OPTIONS
from circuitsimulator_tpu.netlist.parser import parse_netlist_text


def node_eq(sim, name):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index


NJF_CS = """* n-jfet common source
.MODEL j1 NJF VTO=-2 BETA=1e-3 LAMBDA=0
Vdd vdd 0 DC 10
Vg g 0 DC {vg}
Rd vdd d 1k
J1 d g 0 j1
.op
"""


def test_njf_saturation_current():
    # Vgs=0: Id = BETA*(Vgs-VTO)^2 = 1e-3*4 = 4 mA -> V(d) = 10 - 4 = 6 V
    sim = Simulator.from_text(NJF_CS.replace("{vg}", "0"))
    x = sim.dc()
    assert float(x[node_eq(sim, "d")]) == pytest.approx(6.0, abs=5e-3)  # gmin-leak scale (reference parity)


def test_njf_partial_pinch():
    # Vgs=-1: Id = 1e-3*1 = 1 mA -> V(d) = 9 V
    sim = Simulator.from_text(NJF_CS.replace("{vg}", "-1"))
    x = sim.dc()
    assert float(x[node_eq(sim, "d")]) == pytest.approx(9.0, abs=5e-3)


def test_njf_pinched_off():
    sim = Simulator.from_text(NJF_CS.replace("{vg}", "-3"))
    x = sim.dc()
    assert float(x[node_eq(sim, "d")]) == pytest.approx(10.0, abs=5e-3)


def test_pjf_mirror():
    # p-channel mirror of the saturation test
    sim = Simulator.from_text("""* p-jfet
.MODEL j2 PJF VTO=-2 BETA=1e-3
Vss vss 0 DC -10
Vg g 0 DC 0
Rd vss d 1k
J1 d g 0 j2
.op
""")
    x = sim.dc()
    assert float(x[node_eq(sim, "d")]) == pytest.approx(-6.0, abs=5e-3)


def test_jfet_transient_woodbury_matches_lu():
    net = """* jfet amp
.MODEL j1 NJF VTO=-2 BETA=1e-3 LAMBDA=0.01
Vdd vdd 0 DC 10
Vg g 0 SIN -1 0.2 1e6
Rd vdd d 1k
Cl d 0 1p
J1 d g 0 j1
.TRAN 1n 2u
"""
    import jax.numpy as jnp
    a = np.asarray(Simulator.from_text(net).transient().xs)
    opts = DEFAULT_OPTIONS.replace(dtype=jnp.float64, tran_solver="lu")
    b = np.asarray(Simulator.from_text(net, opts=opts).transient().xs)
    np.testing.assert_allclose(a, b, atol=1e-9)


def test_jfet_native_frontend_parity():
    from circuitsimulator_tpu import native
    if not native.available():
        pytest.skip("native frontend not built")
    import dataclasses
    text = (".MODEL j1 NJF(VTO=-1.5 BETA=2m LAMBDA=0.02)\n"
            ".MODEL j2 PJF VTO=-0.5\n"
            "Vd d 0 1\nJ1 d g 0 j1\nJ2 d g 0 j2\nRg g 0 1k\n.op\n")
    ckt_py, _ = parse_netlist_text(text)
    ckt_nat, _ = native.parse_netlist_text_native(text)
    ckt_py.assign_equation_indices()
    ckt_nat.assign_equation_indices()
    assert len(ckt_nat.elements) == len(ckt_py.elements) == 4
    for a, b in zip(ckt_nat.elements, ckt_py.elements):
        assert dataclasses.asdict(a) == dataclasses.asdict(b), (a, b)
