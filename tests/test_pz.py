"""Pole-zero analysis (.PZ, analysis/pz.py) against closed forms."""

import numpy as np
import jax.numpy as jnp
import pytest

from circuitsimulator_tpu.api import Simulator
from circuitsimulator_tpu.utils.options import DEFAULT_OPTIONS

F64 = DEFAULT_OPTIONS.replace(dtype=jnp.float64)


def test_rc_single_pole():
    R, C = 1e3, 1e-9
    net = f"V1 in 0 DC 0 AC 1\nR1 in out {R}\nC1 out 0 {C}\n.PZ V(out) V1\n"
    sim = Simulator.from_text(net, opts=F64)
    res = sim.pole_zero()
    np.testing.assert_allclose(res.poles, [-1.0 / (R * C)], rtol=1e-9)
    assert len(res.zeros) == 0  # all-pole transfer


def test_rc_lead_network_pole_and_zero():
    # R1 || C1 in series, then R2 to ground:
    # zero at -1/(R1 C1), pole at -1/((R1||R2) C1) ... times R-ratio layout
    R1, R2, C1 = 10e3, 2e3, 1e-9
    net = f"""\
V1 in 0 DC 0 AC 1
R1 in out {R1}
C1 in out {C1}
R2 out 0 {R2}
.PZ V(out) V1
"""
    sim = Simulator.from_text(net, opts=F64)
    res = sim.pole_zero()
    z = -1.0 / (R1 * C1)
    p = -(R1 + R2) / (R1 * R2 * C1)
    np.testing.assert_allclose(res.poles, [p], rtol=1e-9)
    np.testing.assert_allclose(res.zeros, [z], rtol=1e-9)


def test_rlc_complex_pole_pair():
    R, L, C = 10.0, 1e-6, 1e-9
    net = f"""\
V1 in 0 DC 0 AC 1
R1 in a {R}
L1 a out {L}
C1 out 0 {C}
.PZ V(out) V1
"""
    sim = Simulator.from_text(net, opts=F64)
    res = sim.pole_zero()
    # s^2 LC + s RC + 1 = 0
    disc = complex((R * C) ** 2 - 4 * L * C)
    s1 = (-R * C + np.sqrt(disc)) / (2 * L * C)
    s2 = (-R * C - np.sqrt(disc)) / (2 * L * C)
    np.testing.assert_allclose(np.sort_complex(res.poles),
                               np.sort_complex(np.array([s1, s2])),
                               rtol=1e-8)


def test_mos_amp_pole_from_junction_caps():
    # common-source stage: dominant pole ~ -1/(Rout*Cout) with
    # Cout = Cgd + Cdb = 0.5*CJ0 + CJ0, Rout = RL || ro
    net = """\
VDD vdd 0 5
VIN in 0 2
M1 out in 0 n 2u 1u 1
RL vdd out 10k
.MODEL 1 VT 0.7 MU 5e-2 COX 2e-3 LAMBDA 0.0 CJ0 1e-12
.PZ V(out) VIN
"""
    sim = Simulator.from_text(net, opts=F64)
    res = sim.pole_zero()
    cout = 1.5e-12
    expect = -1.0 / (1e4 * cout)
    # gate-side caps add a second (far) pole; find the dominant one
    dom = res.poles[np.argmin(np.abs(res.poles - expect))]
    np.testing.assert_allclose(dom.real, expect, rtol=0.05)


def test_pz_errors():
    sim = Simulator.from_text("V1 a 0 1\nR1 a 0 1k\n", opts=F64)
    with pytest.raises(ValueError, match=".PZ card missing"):
        sim.pole_zero()
    res = sim.pole_zero(out_node="a")   # resistive circuit: no poles
    assert len(res.poles) == 0
