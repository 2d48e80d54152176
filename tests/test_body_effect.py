"""MOS body effect (GAMMA/PHI, extension): source-follower threshold
shift vs a host-side self-consistent solution; gamma=0 keeps the
reference parity bit-for-bit."""

import math

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator
from circuitsimulator_tpu.netlist.parser import parse_netlist_text


def follower(gamma):
    return f"""* nmos source follower
.MODEL nm vt 0.7 mu 350u cox 2.3m GAMMA {gamma} PHI 0.6
Vdd vdd 0 DC 5
Vg g 0 DC 3
M1 vdd g s nm 1000u 1u
Rs s 0 1k
.op
"""


def _solve_follower(gamma, phi=0.6, vt=0.7, kk=350e-6 * 2.3e-3 * 1000,
                    vg=3.0, r=1e3):
    vs = 1.0
    for _ in range(200):
        vte = vt + gamma * (math.sqrt(phi + vs) - math.sqrt(phi))
        vov = vg - vs - vte
        f = 0.5 * kk * vov * vov - vs / r
        df = -kk * vov * (1 + gamma / (2 * math.sqrt(phi + vs))) - 1 / r
        vs -= f / df
    return vs


def node_eq(sim, name):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index


def test_follower_without_body_effect():
    sim = Simulator.from_text(follower(0))
    vs = float(sim.dc(polish=True)[node_eq(sim, "s")])
    assert vs == pytest.approx(_solve_follower(0.0), rel=1e-9)


def test_follower_body_effect_raises_threshold():
    sim0 = Simulator.from_text(follower(0))
    sim1 = Simulator.from_text(follower(0.5))
    vs0 = float(sim0.dc(polish=True)[node_eq(sim0, "s")])
    vs1 = float(sim1.dc(polish=True)[node_eq(sim1, "s")])
    assert vs1 == pytest.approx(_solve_follower(0.5), rel=1e-7)
    # body effect raises Vth -> lower source voltage
    assert vs1 < vs0 - 0.05


def test_body_effect_transient_woodbury_matches_lu():
    import jax.numpy as jnp
    from circuitsimulator_tpu import DEFAULT_OPTIONS
    net = follower(0.4).replace(".op", ".TRAN 1n 100n") \
                       .replace("Vg g 0 DC 3", "Vg g 0 SIN 3 0.2 5e7")
    a = np.asarray(Simulator.from_text(net).transient().xs)
    opts = DEFAULT_OPTIONS.replace(dtype=jnp.float64, tran_solver="lu")
    b = np.asarray(Simulator.from_text(net, opts=opts).transient().xs)
    np.testing.assert_allclose(a, b, atol=1e-9)


def test_body_effect_native_parity():
    from circuitsimulator_tpu import native
    if not native.available():
        pytest.skip("native frontend not built")
    import dataclasses
    text = follower(0.37)
    ckt_py, _ = parse_netlist_text(text)
    ckt_nat, _ = native.parse_netlist_text_native(text)
    ckt_py.assign_equation_indices()
    ckt_nat.assign_equation_indices()
    for a, b in zip(ckt_nat.elements, ckt_py.elements):
        assert dataclasses.asdict(a) == dataclasses.asdict(b), (a, b)
    m = next(e for e in ckt_py.elements if e.kind == "M")
    assert m.gamma == pytest.approx(0.37) and m.phi == pytest.approx(0.6)
