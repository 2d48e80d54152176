"""Diode reverse breakdown (BV/IBV keys, extension) — zener-style clamps."""

import math

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator


def node_eq(sim, name):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index


def test_zener_clamp_dc():
    # 10 V through 1k into a reverse-biased BV=5 diode: out clamps near
    # 5 V + vt*ln(I/IBV)
    sim = Simulator.from_text("""* zener regulator
V1 in 0 DC 10
R1 in out 1k
D1 0 out BV=5 IBV=1e-3
.op
""")
    x = sim.dc(polish=True)
    vout = float(x[node_eq(sim, "out")])
    i = (10.0 - vout) / 1000.0
    want = 5.0 + 0.025852 * math.log(i / 1e-3)
    assert vout == pytest.approx(want, abs=1e-5)
    assert 5.0 < vout < 5.1


def test_no_breakdown_below_bv():
    # 3 V supply: the BV=5 diode stays off, out floats at the rail
    sim = Simulator.from_text("""* below bv
V1 in 0 DC 3
R1 in out 1k
D1 0 out BV=5 IBV=1e-3
.op
""")
    x = sim.dc(polish=True)
    assert float(x[node_eq(sim, "out")]) == pytest.approx(3.0, abs=1e-4)


def test_forward_behavior_unchanged_by_bv():
    base = """* fwd
V1 in 0 DC 5
R1 in out 1k
D1 out 0 IS=1e-14{bv}
.op
"""
    x0 = Simulator.from_text(base.replace("{bv}", "")).dc(polish=True)
    x1 = Simulator.from_text(base.replace("{bv}", " BV=50")).dc(polish=True)
    # forward drop identical to float precision (breakdown term ~ e^-1700)
    assert np.abs(np.asarray(x0) - np.asarray(x1)).max() < 1e-12


def test_zener_transient_clips_sine():
    sim = Simulator.from_text("""* clipper
V1 in 0 SIN 0 8 1e3
R1 in out 1k
D1 0 out BV=5 IBV=1e-3
.TRAN 1e-5 1e-3
.MEASURE TRAN vmax MAX V(out)
.MEASURE TRAN vmin MIN V(out)
.end
""")
    res = sim.transient()
    vals = dict(sim.measure(res))
    vmax = float(vals["vmax"])
    vmin = float(vals["vmin"])
    assert 5.0 < vmax < 5.15          # positive peak clamped by breakdown
    assert -0.9 < vmin < -0.5         # negative peak clamped by forward drop


def test_native_parity_bv():
    from circuitsimulator_tpu import native
    if not native.available():
        pytest.skip("native frontend not built")
    import dataclasses
    from circuitsimulator_tpu.netlist.parser import parse_netlist_text
    text = "D1 a 0 IS=2e-15 BV=6.2 IBV=5m\nR1 a 0 1k\n.op\n"
    ckt_py, _ = parse_netlist_text(text)
    ckt_nat, _ = native.parse_netlist_text_native(text)
    ckt_py.assign_equation_indices()
    ckt_nat.assign_equation_indices()
    for a, b in zip(ckt_nat.elements, ckt_py.elements):
        assert dataclasses.asdict(a) == dataclasses.asdict(b), (a, b)
    d = next(e for e in ckt_py.elements if e.kind == "D")
    assert (d.d_bv, d.d_ibv) == (pytest.approx(6.2), pytest.approx(5e-3))
