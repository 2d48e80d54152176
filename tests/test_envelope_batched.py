"""Batched (Monte-Carlo) envelope transient
(analysis/envelope.envelope_transient_batched): the whole two-timescale
run — warm-up, t1=0 PSS, every BE envelope step — as ONE jitted program
vmapped over the lane axis, same batching contract as
hb.harmonic_balance_batched.

Anchors: identical lanes reproduce the host envelope_transient (same
math, fixed-iteration vs polled Newton both converge below tol); the
AM-step-into-RC closed form holds on every lane; perturbed lanes track
their own per-lane host re-runs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from circuitsimulator_tpu import Simulator

F0 = 1e6

R, C = 1e3, 1.0 / (2.0 * np.pi * 1e9)    # w0*R*C = 1 exactly at F0
V1, V2 = 0.5, 1.0
AM_RC = f"""* AM step into RC (test_envelope.py closed-form deck)
Vc carr 0 SIN 0 1 {F0}
Rc carr 0 1k
Vb base 0 PULSE({V1} {V2} 0 1e-9 1e-9 1 1)
Rb base 0 1k
Bm m 0 V=v(base)*v(carr)
Rr m out {R}
Cc out 0 {C}
.op
"""


def _eq(sim, node):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[node]].eq_index


def _stack(params, n):
    return jax.tree.map(lambda x: jnp.stack([jnp.asarray(x)] * n), params)


def test_batched_matches_host_identical_lanes():
    from circuitsimulator_tpu.analysis.envelope import (
        envelope_transient, envelope_transient_batched)
    sim = Simulator.from_text(AM_RC)
    dt = 1e-7
    host = envelope_transient(sim.engine, sim.params, F0, t_stop=2e-6,
                              dt_env=dt, n_harm=3)
    assert host.converged.all()
    bp = _stack(dict(sim.params), 2)
    bres = envelope_transient_batched(sim.engine, bp, F0, t_stop=2e-6,
                                      dt_env=dt, n_harm=3)
    assert bres.converged.all()
    assert bres.xs.shape == (2,) + host.xs.shape
    for lane in range(2):
        np.testing.assert_allclose(bres.xs[lane], host.xs,
                                   rtol=1e-6, atol=1e-9)


def test_batched_closed_form_every_lane():
    """The decoupled-fundamental BE recurrence holds exactly per lane,
    including a lane with a perturbed RC pole."""
    from circuitsimulator_tpu.analysis.envelope import (
        envelope_transient_batched)
    sim = Simulator.from_text(AM_RC)
    dt = 5e-8
    bp = _stack(dict(sim.params), 2)
    # lane 1: scale the envelope cap by 1.5 (slower pole)
    bp["cap_c"] = bp["cap_c"].at[1].multiply(1.5)
    bres = envelope_transient_batched(sim.engine, bp, F0, t_stop=2e-6,
                                      dt_env=dt, n_harm=3)
    assert bres.converged.all()
    eq = _eq(sim, "out")
    for lane, cmul in ((0, 1.0), (1, 1.5)):
        rc = R * C * cmul
        pole = 1.0 + 1j * 2.0 * np.pi * F0 * rc
        y0 = -1j * V1 / pole
        y = bres.coeffs[lane, :, 1, eq]
        assert y[0] == pytest.approx(y0, rel=1e-6)
        a = rc / dt
        yd = y0
        for n in range(1, len(bres.t1)):
            yd = (a * yd - 1j * V2) / (a + pole)
            assert y[n] == pytest.approx(yd, rel=1e-6)
    # the two lanes are measurably different trajectories
    d = np.abs(bres.coeffs[0, :, 1, eq] - bres.coeffs[1, :, 1, eq])
    assert d.max() > 1e-3


def test_monte_carlo_envelope_api():
    deck = AM_RC.replace(f"Cc out 0 {C}", f"Cc out 0 {C} DEV=10%")
    sim = Simulator.from_text(deck)
    bp, res = sim.monte_carlo_envelope(4, t_stop=1e-6, dt_env=1e-7,
                                       f0=F0, n_harm=3, seed=2)
    assert res.xs.shape[0] == 4
    assert res.converged.all()
    eq = _eq(sim, "out")
    finals = np.abs(res.coeffs[:, -1, 1, eq])
    assert np.std(finals) > 1e-5          # the DEV= spread is visible
