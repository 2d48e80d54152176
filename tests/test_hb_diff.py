"""HB sensitivities by implicit differentiation (analysis/hb_diff.py):
closed-form cubic checks + finite differences through full re-solves."""

import math

import numpy as np
import pytest
import jax.numpy as jnp

from circuitsimulator_tpu import Simulator
from circuitsimulator_tpu.analysis.hb_diff import (hb_gradient,
                                                   fundamental_metric)


A = 0.2
A3 = 0.1


def _deck():
    return Simulator.from_text(f"""* differentiable compressor
.PARAM a3={A3}
V1 x 0 SIN 0 {A} 1.0e6
B1 out 0 V=v(x) - a3*v(x)^3
RO out 0 1k
.hb 1.0e6 5
.end
""")


def _eq(sim, name):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index


def test_hb_gradient_closed_form():
    sim = _deck()
    m = fundamental_metric(_eq(sim, "out"))
    val, grads = hb_gradient(sim.engine, sim.params, 1.0e6, 5, m)
    # fundamental: A - (3/4) a3 A^3
    assert val == pytest.approx(A - 0.75 * A3 * A ** 3, rel=1e-6)
    # d fund / d a3 = -(3/4) A^3: a3 is the B-source's .PARAM constant
    bs = sim.lowered.b_sources[0]
    g_a3 = float(np.asarray(grads["b_consts"])[bs.const_off])
    assert g_a3 == pytest.approx(-0.75 * A ** 3, rel=1e-6)
    # d fund / d A = 1 - (9/4) a3 A^2 at the SIN amplitude slot
    g_amp = float(np.asarray(grads["vs_sin"])[0, 1])
    assert g_amp == pytest.approx(1.0 - 2.25 * A3 * A * A, rel=1e-6)


def test_hb_gradient_matches_fd_resolve():
    # cross-check the adjoint against finite differences of FULL HB
    # re-solves on the load resistor (enters through the static stamps)
    sim = _deck()
    m = fundamental_metric(_eq(sim, "out"))
    val, grads = hb_gradient(sim.engine, sim.params, 1.0e6, 5, m)
    from circuitsimulator_tpu.analysis.hb import harmonic_balance

    def fund_of(p):
        res = harmonic_balance(sim.engine, p, 1.0e6, n_harm=5)
        return float(np.abs(res.spectrum[1][_eq(sim, "out")]))

    h = 1e-3
    p1 = dict(sim.params)
    p1["b_consts"] = sim.params["b_consts"] + h
    p2 = dict(sim.params)
    p2["b_consts"] = sim.params["b_consts"] - h
    fd = (fund_of(p1) - fund_of(p2)) / (2 * h)
    bs = sim.lowered.b_sources[0]
    g_a3 = float(np.asarray(grads["b_consts"])[bs.const_off])
    assert g_a3 == pytest.approx(fd, rel=1e-4)


def test_hbmulti_gradient_im3():
    # multi-tone twin: d IM3 / d a3 = (3/4) A^3 exactly for the cubic
    # (two equal tones), and IM3 itself matches the closed form
    sim = Simulator.from_text(f"""* two-tone cubic
.PARAM a3={A3}
V1 m 0 SIN 0 {A} 1.0e6
V2 x m SIN 0 {A} 1.3e6
B1 out 0 V=v(x) + a3*v(x)^3
RO out 0 1k
.hb 1.0e6 3 1.3e6 3
.end
""")
    from circuitsimulator_tpu.analysis.hb_diff import (
        hbmulti_gradient, mixed_harmonic_metric)
    tones = sim.config.hb.tones
    m = mixed_harmonic_metric(_eq(sim, "out"), (2, -1))
    val, grads = hbmulti_gradient(sim.engine, sim.params, tones, m)
    assert val == pytest.approx(0.75 * A3 * A ** 3, rel=1e-4)
    bs = sim.lowered.b_sources[0]
    g_a3 = float(np.asarray(grads["b_consts"])[bs.const_off])
    assert g_a3 == pytest.approx(0.75 * A ** 3, rel=1e-4)
    # IM3 = (3/4) a3 A1^2 A2: d/dA1 = (3/2) a3 A^2 (tone 1 enters
    # squared), d/dA2 = (3/4) a3 A^2
    g_a1 = float(np.asarray(grads["vs_sin"])[0, 1])
    g_a2 = float(np.asarray(grads["vs_sin"])[1, 1])
    assert g_a1 == pytest.approx(1.5 * A3 * A * A, rel=1e-3)
    assert g_a2 == pytest.approx(0.75 * A3 * A * A, rel=1e-3)
