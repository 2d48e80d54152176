"""BJT junction capacitances (CJE/CJC model keys, extension)."""

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator
from circuitsimulator_tpu.netlist.parser import parse_netlist_text


# unbiased BJT: both junctions off, so the device is just its two junction
# caps — the base sees CJE (to grounded E) + CJC (to grounded C) in parallel
RC_DECK = """* base-node RC via junction caps
.MODEL qn NPN IS=1e-18 BF=100 CJE=0.6n CJC=0.4n
V1 in 0 DC 0 AC 1
Rb in b 1k
Q1 0 b 0 qn
.AC lin 1 159.155 159.155
.TRAN 2e-8 4e-6
.end
"""


def node_eq(sim, name):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index


def test_ac_pole_from_junction_caps():
    # C = 1 nF, R = 1 kOhm -> f3dB = 1/(2 pi RC) = 159.155 kHz; at
    # f = f3dB/1000 the response is ~1; at f3dB it is 1/sqrt(2).
    sim = Simulator.from_text(RC_DECK)
    res = sim.ac(freqs=np.asarray([159.155e3]))
    v = np.asarray(res.xs)[0, node_eq(sim, "b")]
    assert abs(v) == pytest.approx(1.0 / np.sqrt(2.0), rel=1e-3)


def test_tran_charges_with_rc_time_constant():
    # step Vin 0->0.3 charges the 1 nF through 1 kOhm: tau = 1 us (0.3 V
    # keeps the B-E junction off; at ~0.85 V it would clamp the node)
    sim = Simulator.from_text(RC_DECK.replace(
        "V1 in 0 DC 0 AC 1", "V1 in 0 PULSE(0 0.3 0 1e-12 1e-12 1 1)"))
    res = sim.transient()
    vb = np.asarray(res.xs)[:, node_eq(sim, "b")]
    t = np.asarray(res.times)
    want = 0.3 * (1.0 - np.exp(-t / 1e-6))
    # BE at dt = tau/50 carries a ~1% local error
    assert np.abs(vb - want).max() < 0.01


def test_dc_unaffected_by_caps():
    base = """.MODEL qn NPN IS=1e-15 BF=100{caps}
Vcc vcc 0 DC 5
Vb b 0 DC 0.65
Rc vcc c 1k
Q1 c b 0 qn
.op
"""
    x0 = Simulator.from_text(base.replace("{caps}", "")).dc(polish=True)
    x1 = Simulator.from_text(base.replace("{caps}",
                                          " CJE=1p CJC=1p")).dc(polish=True)
    assert np.abs(np.asarray(x0) - np.asarray(x1)).max() == 0.0


def test_native_parity_cj():
    from circuitsimulator_tpu import native
    if not native.available():
        pytest.skip("native frontend not built")
    import dataclasses
    ckt_py, _ = parse_netlist_text(RC_DECK)
    ckt_nat, _ = native.parse_netlist_text_native(RC_DECK)
    ckt_py.assign_equation_indices()
    ckt_nat.assign_equation_indices()
    for a, b in zip(ckt_nat.elements, ckt_py.elements):
        assert dataclasses.asdict(a) == dataclasses.asdict(b), (a, b)
    q = next(e for e in ckt_py.elements if e.kind == "Q")
    assert (q.cje, q.cjc) == (pytest.approx(0.6e-9), pytest.approx(0.4e-9))
