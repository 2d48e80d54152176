"""Reverse-mode transient adjoint (analysis/adjoint.py): gradients of
waveform losses wrt all parameters, cross-checked against forward JVP and
finite differences."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from circuitsimulator_tpu.api import Simulator
from circuitsimulator_tpu.analysis.adjoint import (
    diff_transient, transient_adjoint_gradient)
from circuitsimulator_tpu.utils.options import DEFAULT_OPTIONS

F64 = DEFAULT_OPTIONS.replace(dtype=jnp.float64, tran_solver="lu")

NET = """\
V1 in 0 SIN 0.4 0.3 2e6
R1 in a 1k
C1 a 0 100p
D1 a 0 IS=1e-13 N=1
RL a 0 5k
.TRAN 5e-9 5e-7
"""


def veq(sim, name):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index


def test_diff_transient_matches_plain_run():
    sim = Simulator.from_text(NET, opts=F64)
    times, xs = jax.jit(
        lambda p: diff_transient(sim.engine, p, 5e-9, 5e-7))(sim.params)
    ref = sim.transient()
    np.testing.assert_allclose(np.asarray(xs), np.asarray(ref.xs),
                               rtol=0, atol=5e-4)


def test_adjoint_gradient_vs_fd_and_jvp():
    sim = Simulator.from_text(NET, opts=F64)
    a_eq = veq(sim, "a")

    def loss(times, xs):
        return jnp.sum(xs[:, a_eq] ** 2) * 1e3   # energy-like objective

    val, grads = transient_adjoint_gradient(sim.engine, sim.params,
                                            5e-9, 5e-7, loss)
    assert np.isfinite(float(val))

    # finite differences on a representative parameter set
    def loss_of(p):
        t, xs = diff_transient(sim.engine, p, 5e-9, 5e-7)
        return float(loss(t, xs))

    for key, idx in [("res_r", 0), ("cap_c", 0), ("dio_is", 0),
                     ("res_r", 1)]:
        v0 = float(np.asarray(sim.params[key])[idx])
        h = abs(v0) * 1e-6
        p1 = dict(sim.params); p1[key] = sim.params[key].at[idx].add(h)
        p2 = dict(sim.params); p2[key] = sim.params[key].at[idx].add(-h)
        fd = (loss_of(p1) - loss_of(p2)) / (2 * h)
        adj = float(np.asarray(grads[key])[idx])
        np.testing.assert_allclose(adj, fd, rtol=2e-4, err_msg=key)

    # cross-check against the forward-JVP path (plain run_transient;
    # jax.jvp cannot pass through custom_vjp, and the two solver paths
    # converge to slightly different tol-level iterates -> loose rtol)
    from circuitsimulator_tpu.analysis.sensitivity import (
        transient_sensitivity, unit_tangent)
    tan = unit_tangent(sim.params, "cap_c", 0)
    xs, dxs = transient_sensitivity(sim.engine, sim.params, tan, 5e-9, 5e-7)
    jvp_val = float(jnp.sum(2e3 * xs[:, a_eq] * dxs[:, a_eq]))
    np.testing.assert_allclose(float(np.asarray(grads["cap_c"])[0]),
                               jvp_val, rtol=5e-3)


def test_adjoint_gradient_sine_amplitude():
    """Gradient wrt a waveform parameter (SIN amplitude va) — flows through
    the per-step RHS assembly."""
    sim = Simulator.from_text(NET, opts=F64)
    a_eq = veq(sim, "a")

    def loss(times, xs):
        return jnp.mean(xs[:, a_eq])

    _, grads = transient_adjoint_gradient(sim.engine, sim.params,
                                          5e-9, 5e-7, loss)
    g_va = float(np.asarray(grads["vs_sin"])[0, 1])
    # FD
    def loss_of(p):
        t, xs = diff_transient(sim.engine, p, 5e-9, 5e-7)
        return float(loss(t, xs))
    h = 1e-6
    p1 = dict(sim.params); p1["vs_sin"] = sim.params["vs_sin"].at[0, 1].add(h)
    p2 = dict(sim.params); p2["vs_sin"] = sim.params["vs_sin"].at[0, 1].add(-h)
    fd = (loss_of(p1) - loss_of(p2)) / (2 * h)
    np.testing.assert_allclose(g_va, fd, rtol=1e-5)
    assert abs(g_va) > 1e-4      # the amplitude genuinely matters


TL_NET = """\
V1 in 0 SIN 0 1 5e6
RS in a 50
T1 a 0 b 0 Z0=50 TD=5e-9
RL b 0 75
.TRAN 1e-9 2e-7
"""


def test_adjoint_gradient_through_tline_ring():
    """T-line decks: cotangents flow back through the Branin delay ring
    (scan reverse sweep differentiates the ring push; the custom_vjp
    step pulls through the delayed-wave reads)."""
    sim = Simulator.from_text(TL_NET, opts=F64)
    assert sim.engine.n_tl == 1
    b_eq = veq(sim, "b")

    def loss(times, xs):
        return jnp.sum(xs[:, b_eq] ** 2)

    val, grads = transient_adjoint_gradient(sim.engine, sim.params,
                                            1e-9, 2e-7, loss)
    assert np.isfinite(float(val)) and float(val) > 0

    def loss_of(p):
        t, xs = diff_transient(sim.engine, p, 1e-9, 2e-7)
        return float(loss(t, xs))

    for key, idx in [("res_r", 0), ("res_r", 1), ("tl_z0", 0)]:
        v0 = float(np.asarray(sim.params[key]).ravel()[idx])
        h = abs(v0) * 1e-6
        p1 = dict(sim.params); p1[key] = sim.params[key].at[idx].add(h)
        p2 = dict(sim.params); p2[key] = sim.params[key].at[idx].add(-h)
        fd = (loss_of(p1) - loss_of(p2)) / (2 * h)
        adj = float(np.asarray(grads[key]).ravel()[idx])
        np.testing.assert_allclose(adj, fd, rtol=5e-4, err_msg=key)
        assert abs(adj) > 1e-12, key      # every knob genuinely matters


BTIME_NET = """\
V1 in 0 DC 1
R1 in a 1k
B1 a 0 I=1m*v(a)*sin(6.283e6*time)
C1 a 0 1n
.TRAN 1e-8 1e-6
"""


def test_adjoint_gradient_time_dependent_bsource():
    """Time-dependent behavioral expressions: t threads into the
    nonlinear tier of the custom_vjp step, so the adjoint linearizes
    (and differentiates) the expression at the right time."""
    sim = Simulator.from_text(BTIME_NET, opts=F64)
    assert sim.engine.b_uses_time
    a_eq = veq(sim, "a")

    def loss(times, xs):
        return jnp.sum(xs[:, a_eq] ** 2)

    val, grads = transient_adjoint_gradient(sim.engine, sim.params,
                                            1e-8, 1e-6, loss)
    assert np.isfinite(float(val)) and float(val) > 0

    def loss_of(p):
        t, xs = diff_transient(sim.engine, p, 1e-8, 1e-6)
        return float(loss(t, xs))

    for key, idx in [("res_r", 0), ("cap_c", 0)]:
        v0 = float(np.asarray(sim.params[key]).ravel()[idx])
        h = abs(v0) * 1e-6
        p1 = dict(sim.params); p1[key] = sim.params[key].at[idx].add(h)
        p2 = dict(sim.params); p2[key] = sim.params[key].at[idx].add(-h)
        fd = (loss_of(p1) - loss_of(p2)) / (2 * h)
        adj = float(np.asarray(grads[key]).ravel()[idx])
        np.testing.assert_allclose(adj, fd, rtol=5e-4, err_msg=key)
        assert abs(adj) > 1e-12, key
