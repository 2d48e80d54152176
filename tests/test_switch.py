"""S/W switches (extension): DC states, smooth transition, transient
chopping, W current control, frontend parity."""

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator
from circuitsimulator_tpu.netlist.parser import parse_netlist_text


def node_eq(sim, name):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index


SW_DC = """* switch divider
.MODEL swm SW RON=1 ROFF=1e9 VT=1.5 VH=0.5
Vc c 0 DC {vc}
V1 in 0 DC 10
R1 in out 1k
S1 out 0 c 0 swm
.PARAM vc=3
.op
"""


def test_switch_on_pulls_down():
    sim = Simulator.from_text(SW_DC)          # vc=3 > VT+VH -> ON (1 ohm)
    x = sim.dc()
    vout = float(x[node_eq(sim, "out")])
    assert vout == pytest.approx(10 * 1 / 1001.0, rel=1e-6)


def test_switch_off_open():
    sim = Simulator.from_text(SW_DC.replace("{vc}", "0"))
    x = sim.dc()
    vout = float(x[node_eq(sim, "out")])
    assert vout == pytest.approx(10.0, rel=1e-3)   # ROFF=1e9 >> 1k


def test_switch_transition_is_monotonic_log():
    # halfway through the window the conductance is the log-midpoint
    from circuitsimulator_tpu.models.switch import switch_conductance
    import jax.numpy as jnp
    ron, roff, vt, vh = 1.0, 1e6, 1.5, 0.5
    vcs = jnp.linspace(0.0, 3.0, 31)
    G, dG = switch_conductance(ron, roff, vt, vh, vcs)
    g = np.asarray(G)
    assert np.all(np.diff(g) >= -1e-18)            # monotone
    gmid = float(switch_conductance(ron, roff, vt, vh,
                                    jnp.asarray(1.5))[0])
    assert gmid == pytest.approx(np.sqrt(1.0 * 1e-6), rel=1e-9)
    assert g[0] == pytest.approx(1e-6) and g[-1] == pytest.approx(1.0)


def test_switch_chopper_transient():
    sim = Simulator.from_text("""* chopper
.MODEL swm SW RON=0.1 ROFF=1e9 VT=0.5 VH=0.1
Vc c 0 PULSE(0 1 0 1n 1n 0.5u 1u)
V1 in 0 DC 5
R1 in out 1k
S1 out 0 c 0 swm
.TRAN 5n 3u
""")
    res = sim.transient()
    t = np.asarray(res.times)
    v = np.asarray(res.xs)[:, node_eq(sim, "out")]
    on = v[(t % 1e-6 > 0.1e-6) & (t % 1e-6 < 0.4e-6)]
    off = v[(t % 1e-6 > 0.6e-6) & (t % 1e-6 < 0.9e-6)]
    assert np.allclose(on, 5 * 0.1 / 1000.1, rtol=1e-3)
    assert np.allclose(off, 5.0, rtol=1e-3)


def test_wswitch_current_controlled():
    # control current 2A > IT -> ON
    sim = Simulator.from_text("""* w switch
.MODEL cswm CSW RON=1 ROFF=1e9 IT=1 IH=0.1
V1 a 0 DC 2
Vsen a b 0
R0 b 0 1
V2 in 0 DC 10
R2 in out 1k
W1 out 0 Vsen cswm
.op
""")
    x = sim.dc()
    vout = float(x[node_eq(sim, "out")])
    # branch current through Vsen = 2A (flowing a->b), MNA sign: +2
    assert vout == pytest.approx(10 / 1001.0, rel=1e-3)


def test_switch_native_frontend_parity():
    from circuitsimulator_tpu import native
    if not native.available():
        pytest.skip("native frontend not built")
    import dataclasses
    text = """* switches
.MODEL swm SW(RON=0.5 ROFF=1meg VT=1 VH=0.2)
.MODEL cswm CSW IT=1m IH=0.1m RON=2
V1 a 0 DC 1
Vs a b 0
R1 b 0 1k
S1 a 0 b 0 swm
S2 a b b 0 swm ON
W1 a 0 Vs cswm OFF
"""
    ckt_py, _ = parse_netlist_text(text)
    ckt_nat, _ = native.parse_netlist_text_native(text)
    ckt_py.assign_equation_indices()
    ckt_nat.assign_equation_indices()
    assert len(ckt_nat.elements) == len(ckt_py.elements)
    for a, b in zip(ckt_nat.elements, ckt_py.elements):
        assert dataclasses.asdict(a) == dataclasses.asdict(b), (a, b)


def test_switch_in_ac():
    # AC small-signal at the DC operating point: ON switch shorts the
    # output (voltage divider ron/(r1+ron))
    sim = Simulator.from_text("""* ac switch
.MODEL swm SW RON=10 ROFF=1e12 VT=0.5 VH=0.1
Vc c 0 DC 2
V1 in 0 DC 0 AC 1
R1 in out 1k
S1 out 0 c 0 swm
.AC lin 1 1e3 1e3
""")
    acres = sim.ac()
    vout = np.abs(np.asarray(acres.xs)[0, node_eq(sim, "out")])
    assert vout == pytest.approx(10 / 1010.0, rel=1e-6)
