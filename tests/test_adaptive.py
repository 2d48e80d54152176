"""Adaptive (LTE-controlled) transient: accuracy, controller behavior,
backend equivalence, and vmap safety (analysis/adaptive.py)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from circuitsimulator_tpu.api import Simulator
from circuitsimulator_tpu.analysis.adaptive import run_transient_adaptive
from circuitsimulator_tpu.utils.options import DEFAULT_OPTIONS

F64 = DEFAULT_OPTIONS.replace(dtype=jnp.float64)


def node_eq(sim, name):
    ckt = sim.circuit
    return ckt.nodes[ckt.node_name_to_id[name]].eq_index

RC_NET = """\
V1 1 0 PULSE 0 1 0 1e-12 1e-12 1 2
R1 1 2 1k
C1 2 0 1u
.TRAN 2e-4 4e-3
"""
# tau = 1 ms; tstep = 0.2*tau is far too coarse for accurate fixed-step BE


def rc_exact(ts):
    return 1.0 - np.exp(-np.asarray(ts) / 1e-3)


def test_adaptive_beats_fixed_on_coarse_grid():
    sim = Simulator.from_text(RC_NET, opts=F64.replace(tran_solver="lu"))
    node = node_eq(sim, "2")
    fixed = sim.transient()
    adap = sim.transient(adaptive=True)
    exact = rc_exact(np.asarray(adap.times))
    err_fixed = np.abs(np.asarray(fixed.xs)[:, node] - exact).max()
    err_adap = np.abs(np.asarray(adap.xs)[:, node] - exact).max()
    assert not bool(adap.failed)
    assert err_adap < err_fixed / 4
    assert err_adap < 1e-2
    # it actually refined, but nowhere near the full 2**L blowup
    assert int(adap.n_substeps) > adap.n_steps
    assert int(adap.n_substeps) < adap.n_steps * 2 ** 8 / 4

    # the LTE controller's defining property: global error shrinks with the
    # requested tolerance.  Error-per-step control of an order-1 method
    # gives global ~ sqrt(rtol), i.e. ~3.2x per rtol decade.
    tight = Simulator.from_text(RC_NET, opts=F64.replace(
        tran_solver="lu", tran_lte_rtol=1e-4, tran_lte_atol=1e-7))
    adap_t = tight.transient(adaptive=True)
    err_tight = np.abs(np.asarray(adap_t.xs)[:, node] - exact).max()
    assert err_tight < err_adap / 2
    assert int(adap_t.n_substeps) > int(adap.n_substeps)


def test_controller_grows_back_on_smooth_signal():
    # smooth low-frequency sine: after the initial transient the controller
    # should coarsen back toward the output grid
    net = """\
V1 1 0 SIN 0 1 100
R1 1 2 1k
C1 2 0 1n
.TRAN 1e-4 1e-2
"""
    sim = Simulator.from_text(net, opts=F64.replace(tran_solver="lu"))
    res = sim.transient(adaptive=True)
    assert not bool(res.failed)
    # tau = 1us << tstep; signal resolved by the grid -> nearly no refinement
    assert int(res.n_substeps) <= res.n_steps * 4


def test_adaptive_backends_agree():
    net = """\
V1 vdd 0 5
VIN in 0 SIN 2.5 0.5 2e6
M1 out in vss n 20u 1u 1
Rl vdd out 10k
Rs vss 0 1k
C1 out 0 0.5p
.MODEL 1 VT 0.7 MU 5e-2 COX 2e-3 LAMBDA 0.02 CJ0 1e-14
.TRAN 5e-8 2e-6
"""
    o = F64
    s_lu = Simulator.from_text(net, opts=o.replace(tran_solver="lu"))
    s_wb = Simulator.from_text(net, opts=o.replace(tran_solver="woodbury"))
    r_lu = s_lu.transient(adaptive=True)
    r_wb = s_wb.transient(adaptive=True)
    assert not bool(r_lu.failed) and not bool(r_wb.failed)
    np.testing.assert_allclose(np.asarray(r_wb.xs), np.asarray(r_lu.xs),
                               rtol=0, atol=1e-8)


def test_adaptive_converges_to_fine_fixed_solution():
    sim = Simulator.from_text(RC_NET, opts=F64.replace(tran_solver="lu"))
    node = node_eq(sim, "2")
    adap = sim.transient(adaptive=True)
    # fixed run on a 64x finer grid, compared at the coarse output points
    fine = sim.transient(tstep=2e-4 / 64, tstop=4e-3)
    fine_at_coarse = np.asarray(fine.xs)[::64, node]
    np.testing.assert_allclose(np.asarray(adap.xs)[:, node], fine_at_coarse,
                               atol=8e-3)


def test_adaptive_vmap_matches_single():
    sim = Simulator.from_text(RC_NET, opts=F64.replace(tran_solver="lu"))
    params = sim.params

    def stack(leaf):
        return jnp.stack([leaf, leaf * 1.5])

    # scale C -> two different time constants -> different refinement paths
    batched = dict(params)
    batched = jax.tree_util.tree_map(lambda v: jnp.stack([v, v]), params)
    batched["cap_c"] = stack(params["cap_c"])

    runner = lambda p: run_transient_adaptive(sim.engine, p, 2e-4, 4e-3)
    rb = jax.jit(jax.vmap(runner))(batched)
    r0 = jax.jit(runner)(params)
    p1 = dict(params)
    p1["cap_c"] = params["cap_c"] * 1.5
    r1 = jax.jit(runner)(p1)
    np.testing.assert_allclose(np.asarray(rb.xs)[0], np.asarray(r0.xs),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(rb.xs)[1], np.asarray(r1.xs),
                               rtol=0, atol=1e-12)
    assert rb.n_substeps.shape == (2,)


def test_adaptive_trapezoidal():
    sim = Simulator.from_text(
        RC_NET, opts=F64.replace(tran_solver="lu", tran_method="trap"))
    node = node_eq(sim, "2")
    res = sim.transient(adaptive=True)
    exact = rc_exact(np.asarray(res.times))
    assert not bool(res.failed)
    err = np.abs(np.asarray(res.xs)[:, node] - exact).max()
    assert err < 1e-3


def test_adaptive_tridiag_ladder():
    """Adaptive integrator on the O(n) bordered-tridiagonal ladder backend:
    agrees with the fixed fine-grid run and with the dense-LU adaptive."""
    from circuitsimulator_tpu.synthetic import rc_ladder_netlist
    net = rc_ladder_netlist(300, tstep=2e-11, tstop=1e-9)
    o = F64.replace(tran_lte_rtol=1e-4, tran_lte_atol=1e-7)
    s_tri = Simulator.from_text(net, opts=o)
    assert s_tri.opts.tran_solver == "tridiag"
    s_lu = Simulator.from_text(net, opts=o.replace(auto_backend=False,
                                                   tran_solver="lu"))
    r_tri = s_tri.transient(adaptive=True)
    r_lu = s_lu.transient(adaptive=True)
    assert not bool(r_tri.failed)
    np.testing.assert_allclose(np.asarray(r_tri.xs), np.asarray(r_lu.xs),
                               rtol=0, atol=1e-7)
    fine = s_tri.transient(tstep=2e-11 / 32, tstop=1e-9)
    np.testing.assert_allclose(np.asarray(r_tri.xs)[:, :300],
                               np.asarray(fine.xs)[::32, :300], atol=2e-3)


TIME_B_NET = """\
B1 a 0 V=sin(2*pi*1e3*time)
R1 a b 1k
C1 b 0 1u
B2 b 0 I=0.1m*v(b)+0.05m*sin(2*pi*2e3*time)
.TRAN 1e-4 3e-3
"""


def test_adaptive_time_dependent_bsources():
    # time-dependent behavioral expressions evaluate at each substep's own
    # t in EVERY Newton tier (woodbury rank-k rows and the dense LU path) —
    # the old guard rejected these decks outright
    for solver in ("woodbury", "lu"):
        sim = Simulator.from_text(TIME_B_NET,
                                  opts=F64.replace(tran_solver=solver))
        node = node_eq(sim, "b")
        adap = sim.transient(adaptive=True)
        assert not bool(adap.failed)
        fine = sim.transient(tstep=1e-4 / 64, tstop=3e-3)
        fine_at_coarse = np.asarray(fine.xs)[::64, node]
        # same bound as test_adaptive_converges_to_fine_fixed_solution:
        # the LTE controller holds per-step error, the global gap to the
        # 64x-fine run is a few e-3 on this 10-samples-per-period drive
        np.testing.assert_allclose(np.asarray(adap.xs)[:, node],
                                   fine_at_coarse, atol=8e-3,
                                   err_msg=solver)
        # the drive really is time-dependent (not the t=0 freeze: the old
        # broken evaluation would hold sin(0) = 0 and the node would stay
        # flat)
        assert np.abs(np.asarray(adap.xs)[:, node]).max() > 0.05
