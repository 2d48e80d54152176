"""Pre-factored block-CR + Woodbury transient backend
(tran_solver="blockwb"; ops/blockcr.block_cr_factor / bordered_block_
factor + ops/woodbury.WoodburySolver solve_op).

The BE companion base matrix is constant over a fixed-dt transient, so
it is block-CR-factored ONCE and each Newton iteration applies the
cached elimination (O(nb k^2) matmuls) with the nonlinear devices as
Woodbury rank-1 rows — same fixpoint as the re-eliminating "blockband"
backend and the dense LU, to machine epsilon.
"""

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator, DEFAULT_OPTIONS
from circuitsimulator_tpu.synthetic import rc_grid_netlist


def _run(net, solver, **okw):
    opts = DEFAULT_OPTIONS.replace(tran_solver=solver, dc_solver="lu",
                                   auto_backend=False, **okw)
    sim = Simulator.from_text(net, opts=opts)
    res = sim.transient()
    return np.asarray(res.xs)


def test_factor_apply_matches_solve():
    """block_cr_apply(block_cr_factor(T), F) == block_cr_solve(T, F)."""
    import jax
    jax.config.update("jax_enable_x64", True)
    from circuitsimulator_tpu.ops.blockcr import (
        block_cr_factor, block_cr_apply, block_cr_solve)
    rng = np.random.default_rng(0)
    nb, k, q = 6, 4, 3          # deliberately not a power of two
    D = rng.normal(size=(nb, k, k)) + 6.0 * np.eye(k)   # diag dominant
    L = 0.3 * rng.normal(size=(nb, k, k))
    U = 0.3 * rng.normal(size=(nb, k, k))
    L[0] = U[-1] = 0.0
    F = rng.normal(size=(nb, k, q))
    ref = np.asarray(block_cr_solve(L, D, U, F))
    fac = block_cr_factor(L, D, U)
    out = np.asarray(block_cr_apply(fac, F))
    np.testing.assert_allclose(out, ref, rtol=1e-10, atol=1e-12)


def test_blockwb_matches_blockband_and_dense():
    net = rc_grid_netlist(20, 12, diode_every=7, tstep=1e-12,
                          tstop=30e-12)
    x_wb = _run(net, "blockwb")
    x_bb = _run(net, "blockband")
    x_lu = _run(net, "lu")
    assert np.isfinite(x_wb).all()
    np.testing.assert_allclose(x_wb, x_bb, atol=5e-13)
    np.testing.assert_allclose(x_wb, x_lu, atol=5e-13)


def test_blockwb_with_border_rows():
    """V-source branch rows + a rail hub land in the dense border; the
    pre-factored Schur pieces must reproduce the dense solve."""
    net = rc_grid_netlist(16, 10, diode_every=5, rail=True,
                          tstep=1e-12, tstop=20e-12)
    x_wb = _run(net, "blockwb")
    x_lu = _run(net, "lu")
    np.testing.assert_allclose(x_wb, x_lu, atol=5e-13)


def test_blockwb_mesh_falls_back_to_spike():
    """A mesh means SPIKE domain decomposition: blockwb silently uses
    the re-eliminating blockband solve it shards, same trajectory."""
    import numpy as _np
    import jax
    from jax.sharding import Mesh
    from circuitsimulator_tpu.analysis.transient import run_transient
    from circuitsimulator_tpu.parallel.spike import PART_AXIS
    net = rc_grid_netlist(16, 10, diode_every=5, tstep=1e-12,
                          tstop=10e-12)
    opts = DEFAULT_OPTIONS.replace(tran_solver="blockwb", dc_solver="lu",
                                   auto_backend=False)
    sim = Simulator.from_text(net, opts=opts)
    r1 = sim.transient()
    mesh = Mesh(_np.array(jax.devices()[:2]), (PART_AXIS,))
    r2 = run_transient(sim.engine, sim.params, 1e-12, 10e-12, mesh=mesh)
    assert not bool(np.asarray(r2.failed).any())
    np.testing.assert_allclose(np.asarray(r2.xs), np.asarray(r1.xs),
                               atol=1e-11)


def test_auto_backend_rank_heuristic():
    """auto_backend picks blockwb when the Woodbury rank is small vs the
    network (measured crossover ~N/16 on the 10k grid) and keeps the
    re-eliminating blockband above it."""
    # 20x12 = 240 unknowns+, diode_every=97 -> 3 diodes: rank << N/16
    lo = Simulator.from_text(rc_grid_netlist(20, 12, diode_every=97,
                                             tstep=1e-12, tstop=5e-12))
    assert lo.opts.tran_solver == "blockwb"
    # diode_every=7 -> ~35 diodes > 240/16: stays blockband
    hi = Simulator.from_text(rc_grid_netlist(20, 12, diode_every=7,
                                             tstep=1e-12, tstop=5e-12))
    assert hi.opts.tran_solver == "blockband"
    # the auto-picked blockwb run matches the dense oracle
    ra = lo.transient()
    dense = Simulator.from_text(
        rc_grid_netlist(20, 12, diode_every=97, tstep=1e-12,
                        tstop=5e-12),
        opts=DEFAULT_OPTIONS.replace(tran_solver="lu", dc_solver="lu",
                                     auto_backend=False))
    rd = dense.transient()
    np.testing.assert_allclose(np.asarray(ra.xs), np.asarray(rd.xs),
                               atol=1e-9)
