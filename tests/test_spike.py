"""Giant-circuit multi-chip: ONE circuit's block-tridiagonal MNA solve
domain-decomposed over an 8-device mesh with the SPIKE algorithm
(parallel/spike.py).  The distributed result must match the single-device
block-CR solve to machine precision — SURVEY.md §2's stretch axis (the
reference, solver.hpp:30-80, is single-threaded dense LU)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh
import pytest

from circuitsimulator_tpu import Simulator
from circuitsimulator_tpu.analysis.transient import run_transient
from circuitsimulator_tpu.ops.blockcr import (block_cr_solve,
                                              bordered_block_solve)
from circuitsimulator_tpu.parallel.spike import (PART_AXIS,
                                                 spike_block_solve,
                                                 bordered_spike_solve)
from circuitsimulator_tpu.synthetic import rc_grid_netlist


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    return Mesh(np.array(devs[:8]), (PART_AXIS,))


@pytest.mark.parametrize("nb,k,q", [(16, 5, 2), (29, 4, 1), (8, 3, 3)])
def test_spike_matches_single_device(mesh, nb, k, q):
    rng = np.random.default_rng(nb)
    L = rng.normal(size=(nb, k, k))
    L[0] = 0
    U = rng.normal(size=(nb, k, k))
    U[-1] = 0
    D = rng.normal(size=(nb, k, k)) + 10 * np.eye(k)
    F = rng.normal(size=(nb, k, q))
    X = np.asarray(spike_block_solve(mesh, *map(jnp.asarray, (L, D, U, F))))
    Xr = np.asarray(block_cr_solve(*map(jnp.asarray, (L, D, U, F))))
    np.testing.assert_allclose(X, Xr, atol=1e-12)


def test_bordered_spike_matches_single_device(mesh):
    rng = np.random.default_rng(42)
    nb, k, mb = 29, 4, 3
    N = nb * k
    L = rng.normal(size=(nb, k, k))
    L[0] = 0
    U = rng.normal(size=(nb, k, k))
    U[-1] = 0
    D = rng.normal(size=(nb, k, k)) + 10 * np.eye(k)
    Ub = rng.normal(size=(N, mb))
    Wb = rng.normal(size=(mb, N))
    Db = rng.normal(size=(mb, mb)) + 5 * np.eye(mb)
    f = rng.normal(size=N)
    g = rng.normal(size=mb)
    x, y = bordered_spike_solve(mesh, *map(jnp.asarray,
                                           (L, D, U, Ub, Wb, Db, f, g)))
    xr, yr = bordered_block_solve(*map(jnp.asarray,
                                       (L, D, U, Ub, Wb, Db, f, g)))
    np.testing.assert_allclose(np.asarray(x), np.asarray(xr), atol=1e-12)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=1e-12)


def test_distributed_grid_transient(mesh):
    """Whole nonlinear transient of one 192-node grid with every Newton
    solve SPIKE-decomposed across 8 devices == the single-device run."""
    txt = rc_grid_netlist(24, 8, diode_every=9, tstep=1e-12, tstop=20e-12)
    sim = Simulator.from_text(txt)
    assert sim.opts.tran_solver == "blockband"
    r1 = sim.transient()
    r2 = jax.jit(lambda p: run_transient(sim.engine, p, 1e-12, 20e-12,
                                         mesh=mesh))(sim.params)
    assert not bool(np.asarray(r2.failed).any())
    np.testing.assert_allclose(np.asarray(r2.xs), np.asarray(r1.xs),
                               atol=1e-12)
