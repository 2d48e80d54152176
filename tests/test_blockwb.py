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


def test_blockwb_rejects_mesh():
    import numpy as _np
    import jax
    from jax.sharding import Mesh
    from circuitsimulator_tpu.analysis.transient import run_transient
    net = rc_grid_netlist(16, 10, tstep=1e-12, tstop=5e-12)
    opts = DEFAULT_OPTIONS.replace(tran_solver="blockwb", dc_solver="lu",
                                   auto_backend=False)
    sim = Simulator.from_text(net, opts=opts)
    mesh = Mesh(_np.array(jax.devices()[:1]), ("spike_parts",))
    with pytest.raises(NotImplementedError, match="single-device"):
        run_transient(sim.engine, sim.params, 1e-12, 5e-12, mesh=mesh)
