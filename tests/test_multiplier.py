"""`M=` parallel-multiplicity factor on R/C/L and M/D/Q/J instance cards
(extension; ngspice-style device multiplier)."""

import numpy as np
import pytest

from circuitsimulator_tpu.api import Simulator

NET = """\
.MODEL mn VT 0.6 MU 2e-2 COX 1e-3
.MODEL qn NPN IS=1e-15 BF=100
.MODEL jn NJF VTO=-2 BETA=1m
V1 a 0 2
R1 a b 1k M=2
C1 b 0 1u M=3
L1 b c 1m M=4
RL c 0 1k
M1 a g 0 bb mn W=10u L=1u M=2
VG g 0 1.2
D1 a 0 IS=1e-14 M=5
Q1 a g e qn M=2
RE e 0 1k
J1 a g s jn M=3
RS s 0 1k
"""


def elem(sim, name):
    return next(e for e in sim.circuit.elements if e.name == name)


def test_multiplier_values():
    sim = Simulator.from_text(NET)
    assert elem(sim, "R1").value == 500.0          # 1k || 1k
    assert elem(sim, "C1").value == pytest.approx(3e-6)
    assert elem(sim, "L1").value == pytest.approx(0.25e-3)
    assert elem(sim, "M1").k == pytest.approx(2e-2 * 1e-3 * 10 * 2)
    assert elem(sim, "D1").i_sat == pytest.approx(5e-14)
    assert elem(sim, "D1").d_ibv == pytest.approx(5e-3)
    assert elem(sim, "Q1").i_sat == pytest.approx(2e-15)
    assert elem(sim, "Q1").cje == 0.0
    assert elem(sim, "J1").k == pytest.approx(3e-3)


def test_multiplier_frontend_parity():
    import dataclasses
    from circuitsimulator_tpu import native
    if not native.available():
        pytest.skip("native frontend not built")
    from circuitsimulator_tpu.netlist.parser import parse_netlist_text
    ckt_py, _ = parse_netlist_text(NET)
    ckt_nat, _ = native.parse_netlist_text_native(NET)
    ckt_py.assign_equation_indices()
    ckt_nat.assign_equation_indices()
    for a, b in zip(ckt_nat.elements, ckt_py.elements):
        assert dataclasses.asdict(a) == dataclasses.asdict(b), (a, b)


def test_multiplier_equivalent_to_parallel_copies():
    two = Simulator.from_text("""\
V1 in 0 1
R1 in out 1k
M1 out g 0 b mn W=10u L=1u M=2
VG g 0 1.5
.MODEL mn VT 0.6 MU 2e-2 COX 1e-3
""")
    pair = Simulator.from_text("""\
V1 in 0 1
R1 in out 1k
Ma out g 0 b mn W=10u L=1u
Mb out g 0 b mn W=10u L=1u
VG g 0 1.5
.MODEL mn VT 0.6 MU 2e-2 COX 1e-3
""")
    eq2 = two.circuit.nodes[two.circuit.node_name_to_id["out"]].eq_index
    eqp = pair.circuit.nodes[pair.circuit.node_name_to_id["out"]].eq_index
    np.testing.assert_allclose(np.asarray(two.dc())[eq2],
                               np.asarray(pair.dc())[eqp], rtol=1e-9)


def test_bad_multiplier_warns_and_ignored(capsys):
    sim = Simulator.from_text("V1 a 0 1\nR1 a 0 1k M=0\n")
    assert "must be > 0" in capsys.readouterr().err
    assert elem(sim, "R1").value == 1000.0
