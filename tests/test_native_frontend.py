"""C++ native frontend vs the Python frontend: both must produce identical
circuits, configs, and end-to-end results."""

import dataclasses

import numpy as np
import pytest

from circuitsimulator_tpu import native
from circuitsimulator_tpu.api import Simulator
from circuitsimulator_tpu.netlist.parser import parse_netlist_text
from circuitsimulator_tpu.synthetic import rc_ladder_netlist

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native frontend not built")

CASES = [
    open("tests/netlists/buffer.sp").read(),
    open("tests/netlists/dbmixer.sp").read(),
    rc_ladder_netlist(40),
    # grammar corners
    ("* title\nhello junk line\n"
     "V1 1 0 DC 2 AC 0.5 30 SIN 0 1 1e6 1n 0.3\n"
     "V2 2 0 PULSE(0 1 1n 1n 1n 5n 10n)\n"
     "V3 3 0 PWL(0 0 1n 1 2n -1)\n"
     "I1 3 0 DC 1m\nI2 1 2 2u\n"
     "R1 1 2 10k\nC1 2 0 1u\nL1 2 3 1n\n"
     "D1 3 0 IS=1e-15 N=1.5\n"
     ".MODEL 7 VT -0.6 MU 1e-2 COX 1e-3 LAMBDA 0.02 CJO 1e-14\n"
     "M1 1 2 3 p 2e-6 1e-6 7\n"
     "M2 1 2 3 7 3e-6 1e-6\n"
     ".TRAN 1n 100n 5n\n.AC oct 3 1e3 1e6\n.DC V1 0 2 0.5\n.hb 1e6 4\n"
     ".print tran V(1) V(1,2) I(R1)\n.plotnv 1 2\n.plotnc M1(d)\n.end\n"),
    # error paths must behave identically (bad values, unknown model)
    ("R1 1 0 zz\nM1 1 2 3 n 1e-6 1e-6 99\nV1 1 0 SIN 1 2\nRok 1 0 1k\n"),
]


def canon_circuit(ckt):
    ckt.assign_equation_indices()
    out = []
    for e in ckt.elements:
        d = dataclasses.asdict(e)
        out.append(d)
    nodes = [(n.name, n.eq_index) for n in ckt.nodes]
    return nodes, out


def canon_config(sim):
    return (sim.do_op, dataclasses.asdict(sim.tran), dataclasses.asdict(sim.ac),
            dataclasses.asdict(sim.hb),
            [dataclasses.asdict(s) for s in sim.dc_sweeps],
            sorted((pc.analysis, p.kind, p.node1, p.node2, p.ele_name,
                    p.ele_port)
                   for pc in sim.print_commands for p in pc.probes))


@pytest.mark.parametrize("idx", range(len(CASES)))
def test_native_matches_python(idx):
    text = CASES[idx]
    ckt_py, sim_py = parse_netlist_text(text)
    ckt_nat, sim_nat = native.parse_netlist_text_native(text)
    nodes_py, els_py = canon_circuit(ckt_py)
    nodes_nat, els_nat = canon_circuit(ckt_nat)
    assert nodes_nat == nodes_py
    assert len(els_nat) == len(els_py)
    for a, b in zip(els_nat, els_py):
        assert a == b, (a, b)
    assert canon_config(sim_nat) == canon_config(sim_py)


def test_native_end_to_end_dc():
    s_py = Simulator.from_file("tests/netlists/buffer.sp", frontend="python")
    s_nat = Simulator.from_file("tests/netlists/buffer.sp", frontend="native")
    np.testing.assert_array_equal(np.asarray(s_py.dc()),
                                  np.asarray(s_nat.dc()))


def test_native_frontend_auto():
    s = Simulator.from_text("R1 1 0 1k\nV1 1 0 5\n.op\n", frontend="auto")
    x = np.asarray(s.dc())
    np.testing.assert_allclose(x, [5.0, -5e-3], rtol=1e-12)
