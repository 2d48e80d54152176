"""Block-banded (RCM + bordered block-tridiagonal) solver path: the
general large-circuit backend (ops/blockband.py, ops/blockcr.py) must agree
with the dense reference-algorithm path on non-ladder topologies.

Replaces the reference's dense per-iteration LU (solver.hpp:30-80) for
large circuits; correctness is pinned against the dense path at small N."""

import numpy as np
import jax.numpy as jnp
import pytest

from circuitsimulator_tpu import Simulator, DEFAULT_OPTIONS
from circuitsimulator_tpu.ops.blockcr import block_cr_solve, bordered_block_solve
from circuitsimulator_tpu.synthetic import rc_grid_netlist


def _dense_from_blocks(L, D, U):
    nb, k, _ = D.shape
    N = nb * k
    A = np.zeros((N, N))
    for i in range(nb):
        A[i * k:(i + 1) * k, i * k:(i + 1) * k] = D[i]
        if i > 0:
            A[i * k:(i + 1) * k, (i - 1) * k:i * k] = L[i]
        if i < nb - 1:
            A[i * k:(i + 1) * k, (i + 1) * k:(i + 2) * k] = U[i]
    return A


@pytest.mark.parametrize("nb,k,q", [(1, 3, 2), (5, 4, 1), (8, 3, 3),
                                    (13, 5, 2), (16, 1, 1)])
def test_block_cr_matches_dense(nb, k, q):
    rng = np.random.default_rng(nb * 100 + k)
    L = rng.normal(size=(nb, k, k))
    L[0] = 0
    U = rng.normal(size=(nb, k, k))
    U[-1] = 0
    D = rng.normal(size=(nb, k, k)) + 10 * np.eye(k)
    F = rng.normal(size=(nb, k, q))
    X = np.asarray(block_cr_solve(*map(jnp.asarray, (L, D, U, F))))
    want = np.linalg.solve(_dense_from_blocks(L, D, U), F.reshape(nb * k, q))
    np.testing.assert_allclose(X.reshape(nb * k, q), want, atol=1e-9)


def test_bordered_block_solve_with_batch():
    rng = np.random.default_rng(7)
    nb, k, mb, B = 6, 4, 3, 4
    N = nb * k
    L = rng.normal(size=(nb, k, k))
    L[0] = 0
    U = rng.normal(size=(nb, k, k))
    U[-1] = 0
    D = rng.normal(size=(nb, k, k)) + 10 * np.eye(k)
    Ub = rng.normal(size=(N, mb))
    Wb = rng.normal(size=(mb, N))
    Db = rng.normal(size=(mb, mb)) + 5 * np.eye(mb)
    A = np.zeros((N + mb, N + mb))
    A[:N, :N] = _dense_from_blocks(L, D, U)
    A[:N, N:] = Ub
    A[N:, :N] = Wb
    A[N:, N:] = Db
    fB = rng.normal(size=(B, N))
    gB = rng.normal(size=(B, mb))
    x, y = bordered_block_solve(*map(jnp.asarray, (L, D, U, Ub, Wb, Db)),
                                jnp.asarray(fB), jnp.asarray(gB))
    for b in range(B):
        want = np.linalg.solve(A, np.concatenate([fB[b], gB[b]]))
        np.testing.assert_allclose(np.asarray(x[b]), want[:N], atol=1e-9)
        np.testing.assert_allclose(np.asarray(y[b]), want[N:], atol=1e-9)


def _dense_sim(txt):
    return Simulator.from_text(txt, opts=DEFAULT_OPTIONS.replace(
        auto_backend=False, tran_solver="lu"))


def test_grid_auto_selects_blockband_and_matches_dense():
    """12x12 RC grid + diodes: not a ladder (bandwidth ~12); the blockband
    backend is auto-selected and must reproduce the dense trajectory."""
    txt = rc_grid_netlist(12, 12, diode_every=7, tstep=1e-12, tstop=30e-12)
    sim_b = Simulator.from_text(txt)
    assert sim_b.opts.tran_solver == "blockband"
    assert sim_b.opts.dc_solver == "blockband"
    lay = sim_b.engine._blockband_layout
    assert lay.nb >= 4 and lay.k <= 16
    sim_d = _dense_sim(txt)
    np.testing.assert_allclose(np.asarray(sim_b.dc()), np.asarray(sim_d.dc()),
                               atol=1e-10)
    rb, rd = sim_b.transient(), sim_d.transient()
    assert not bool(np.asarray(rb.failed).any())
    np.testing.assert_allclose(np.asarray(rb.xs), np.asarray(rd.xs),
                               atol=1e-10)


def test_grid_rail_hub_goes_to_border():
    """A global rail node strapped to every row head has degree ~n_rows;
    without border extraction it blows the RCM bandwidth.  The layout must
    pull it into the dense border and still match the dense path."""
    txt = rc_grid_netlist(18, 10, diode_every=7, rail=True,
                          tstep=1e-12, tstop=20e-12)
    sim_b = Simulator.from_text(txt)
    assert sim_b.opts.tran_solver == "blockband"
    lay = sim_b.engine._blockband_layout
    assert len(lay.hubs) >= 1, "rail hub not extracted into the border"
    assert lay.k <= 12   # bandwidth ~n_cols once the hub is out
    sim_d = _dense_sim(txt)
    np.testing.assert_allclose(np.asarray(sim_b.dc()), np.asarray(sim_d.dc()),
                               atol=1e-10)
    rb, rd = sim_b.transient(), sim_d.transient()
    np.testing.assert_allclose(np.asarray(rb.xs), np.asarray(rd.xs),
                               atol=1e-10)


def test_linear_grid_dc_blockband():
    """Grid with no diodes: the linear single-solve DC path through
    dc_linear_blockband must match the dense dc_linear."""
    txt = rc_grid_netlist(13, 11, diode_every=10 ** 9, drive="dc",
                          tstep=1e-12, tstop=10e-12)
    sim_b = Simulator.from_text(txt)
    assert sim_b.opts.dc_solver == "blockband"
    assert not sim_b.topo.has_nonlinear
    sim_d = _dense_sim(txt)
    np.testing.assert_allclose(np.asarray(sim_b.dc()), np.asarray(sim_d.dc()),
                               atol=1e-10)


def test_grid_scale_20k_smoke():
    """Scale smoke: a 140x140 (19.6k-node) 2-D grid lowers, DC-solves,
    and advances transient steps through the auto-selected RCM
    block-banded backend — the general large-circuit path holds well
    beyond the 10k-node benchmark config (50k verified manually; this
    size keeps suite time sane)."""
    import time
    from circuitsimulator_tpu.synthetic import rc_grid_netlist
    sim = Simulator.from_text(rc_grid_netlist(140, 140))
    assert sim.topo.n_unknowns > 19_000
    x = np.asarray(sim.dc())
    assert np.isfinite(x).all()
    # passive resistive grid driven by a single source: every node
    # voltage is bounded by the drive amplitude
    assert float(np.nanmax(np.abs(x))) <= 0.5 + 1e-6
    res = sim.transient(tstep=1e-11, tstop=3e-11, save_xs=False)
    assert not bool(np.asarray(res.failed).any())
