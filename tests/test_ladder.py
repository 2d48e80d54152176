"""Large ladder circuits: bordered-tridiagonal CR backend vs the dense
backend, and the 10k-node synthetic stress config."""

import numpy as np
import jax.numpy as jnp
import pytest

from circuitsimulator_tpu.api import Simulator
from circuitsimulator_tpu.synthetic import rc_ladder_netlist
from circuitsimulator_tpu.ops.tridiag import cr_solve, bordered_solve
from circuitsimulator_tpu.ops.banded import is_ladder
from circuitsimulator_tpu.utils.options import DEFAULT_OPTIONS


def test_cr_solve_matches_dense():
    rng = np.random.default_rng(1)
    for N in (1, 2, 3, 7, 64, 1000):
        b = 4 + rng.random(N)
        a = rng.random(N)
        c = rng.random(N)
        a[0] = 0.0
        c[-1] = 0.0
        d = rng.standard_normal(N)
        T = np.diag(b) + np.diag(a[1:], -1) + np.diag(c[:-1], 1)
        x = np.asarray(cr_solve(a, b, c, d))
        np.testing.assert_allclose(x, np.linalg.solve(T, d),
                                   rtol=1e-10, atol=1e-12)


def test_bordered_solve_matches_dense():
    rng = np.random.default_rng(2)
    N, m = 33, 3
    b = 4 + rng.random(N)
    a = rng.random(N)
    c = rng.random(N)
    a[0] = c[-1] = 0.0
    T = np.diag(b) + np.diag(a[1:], -1) + np.diag(c[:-1], 1)
    U = rng.standard_normal((N, m))
    W = rng.standard_normal((m, N))
    D = rng.standard_normal((m, m)) + 4 * np.eye(m)
    f = rng.standard_normal(N)
    g = rng.standard_normal(m)
    A = np.block([[T, U], [W, D]])
    ref = np.linalg.solve(A, np.concatenate([f, g]))
    x, y = bordered_solve(*map(jnp.asarray, (a, b, c, U, W, D, f, g)))
    np.testing.assert_allclose(np.concatenate([np.asarray(x), np.asarray(y)]),
                               ref, rtol=1e-9, atol=1e-11)


def test_ladder_detection():
    sim = Simulator.from_text(rc_ladder_netlist(50))
    assert is_ladder(sim.engine)
    # a non-chain circuit (R jumping across) must not qualify
    sim2 = Simulator.from_text(
        "V1 1 0 1\nR1 1 2 1\nR2 2 3 1\nR3 3 0 1\nRX 1 3 1\n.op\n")
    assert not is_ladder(sim2.engine)
    # MOS circuits don't qualify
    sim3 = Simulator.from_file("tests/netlists/buffer.sp")
    assert not is_ladder(sim3.engine)


def test_auto_backend_switches():
    sim = Simulator.from_text(rc_ladder_netlist(200))
    assert sim.opts.tran_solver == "tridiag"
    small = Simulator.from_text(rc_ladder_netlist(20))
    assert small.opts.tran_solver == "woodbury"


def test_ladder_dc_and_transient_match_dense_backend():
    text = rc_ladder_netlist(200, tstop=2e-10)
    dense_opts = DEFAULT_OPTIONS.replace(dtype=jnp.float64,
                                         auto_backend=False)
    s_tri = Simulator.from_text(text)
    s_den = Simulator.from_text(text, opts=dense_opts)
    assert s_tri.opts.dc_solver == "tridiag"
    x_tri = np.asarray(s_tri.dc())
    x_den = np.asarray(s_den.dc())
    np.testing.assert_allclose(x_tri, x_den, rtol=1e-8, atol=1e-10)

    r_tri = s_tri.transient()
    r_den = s_den.transient()
    assert not bool(r_tri.failed) and not bool(r_den.failed)
    np.testing.assert_allclose(np.asarray(r_tri.xs), np.asarray(r_den.xs),
                               rtol=1e-7, atol=1e-9)


def test_ladder_dc_analytic_no_diode_current():
    # pure RC ladder at DC: no path to ground once C are open -> the whole
    # chain floats at the drive voltage (gmin leak is ~1e-6 relative)
    sim = Simulator.from_text(rc_ladder_netlist(300, diode_every=10**9,
                                                drive="dc"))
    x = np.asarray(sim.dc())
    np.testing.assert_allclose(x[:300], 0.5, rtol=1e-3)


def test_10k_node_ladder_smoke():
    n = 10000
    sim = Simulator.from_text(rc_ladder_netlist(n, tstep=1e-11, tstop=5e-11))
    assert sim.topo.n_unknowns == n + 1
    assert sim.opts.tran_solver == "tridiag"
    x = np.asarray(sim.dc())
    assert np.all(np.isfinite(x))
    # PULSE drive contributes 0 at DC (evalDC uses dcValue only) -> the
    # whole ladder sits at 0
    np.testing.assert_allclose(x, 0.0, atol=1e-12)
    res = sim.transient(save_xs=False)
    assert not bool(res.failed)
    xf = np.asarray(res.x_final)
    assert np.all(np.isfinite(xf))
    # 5 steps of 10 ps on a 100-ohm/1-pF ladder: the wavefront cannot have
    # reached the far end yet
    assert abs(xf[-2]) < 1e-6
    assert xf[0] > 0.01


def test_full_newton_predictor_matches_damped_trajectory():
    """tran_alpha=1 + tran_predictor change only the Newton *path*, not the
    per-step fixed point: trajectories agree to ~tolerance, with far fewer
    iterations (the fast configuration used by benchmarks/bench_ladder.py)."""
    net = rc_ladder_netlist(400, tstep=1e-11, tstop=2e-9)
    o_ref = DEFAULT_OPTIONS.replace(dtype=jnp.float64)
    o_fast = o_ref.replace(tran_alpha=1.0, tran_predictor=True)
    s_ref = Simulator.from_text(net, opts=o_ref)
    s_fast = Simulator.from_text(net, opts=o_fast)
    assert s_ref.opts.tran_solver == "tridiag"
    r_ref = s_ref.transient()
    r_fast = s_fast.transient()
    assert not bool(r_ref.failed) and not bool(r_fast.failed)
    np.testing.assert_allclose(np.asarray(r_fast.xs), np.asarray(r_ref.xs),
                               rtol=0, atol=5e-5)
    assert float(r_fast.newton_iters.sum()) < 0.5 * float(
        r_ref.newton_iters.sum())


def test_predictor_dense_backends():
    """Predictor works identically across lu/woodbury dense backends."""
    net = rc_ladder_netlist(40, tstep=1e-11, tstop=5e-10)
    o = DEFAULT_OPTIONS.replace(dtype=jnp.float64, tran_alpha=1.0,
                                tran_predictor=True)
    r = {}
    for solver in ("lu", "woodbury"):
        s = Simulator.from_text(net, opts=o.replace(tran_solver=solver,
                                                    auto_backend=False))
        r[solver] = np.asarray(s.transient().xs)
    np.testing.assert_allclose(r["woodbury"], r["lu"], rtol=0, atol=1e-9)


def test_cr_dense_cutoff_path():
    """The hybrid dense-cutoff CR variant (kept for non-TPU hardware; the
    v5e default is pure CR) matches the dense solution."""
    from circuitsimulator_tpu.ops.tridiag import cr_solve
    rng = np.random.default_rng(3)
    N = 1000
    b = 4 + rng.random(N)
    a = rng.random(N); a[0] = 0.0
    c = rng.random(N); c[-1] = 0.0
    d = rng.standard_normal(N)
    T = np.diag(b) + np.diag(a[1:], -1) + np.diag(c[:-1], 1)
    ref = np.linalg.solve(T, d)
    for cutoff in (64, 256):
        x = np.asarray(cr_solve(a, b, c, d, cutoff=cutoff))
        np.testing.assert_allclose(x, ref, rtol=1e-9, atol=1e-11)
