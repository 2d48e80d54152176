"""Pallas batched LU kernel vs the reference jnp solver (interpret mode on
CPU; the same kernel compiles with Mosaic on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from circuitsimulator_tpu.ops.pallas_lu import lu_solve_pallas_batched
from circuitsimulator_tpu.ops.lu import lu_solve_batched


def systems(B, n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((B, n, n))
    b = rng.standard_normal((B, n))
    return jnp.asarray(A), jnp.asarray(b)


@pytest.mark.parametrize("B,n", [(1, 4), (7, 13), (130, 31), (64, 8)])
def test_pallas_lu_matches_reference(B, n):
    A, b = systems(B, n, seed=n)
    x = np.asarray(lu_solve_pallas_batched(A, b, interpret=True,
                                           lane_block=64))
    ref = np.asarray(lu_solve_batched(A, b, 1e-15))
    np.testing.assert_allclose(x, ref, rtol=1e-9, atol=1e-10)


def test_pallas_lu_needs_pivoting():
    A = jnp.asarray(np.array([[[0.0, 1.0], [1.0, 1.0]]] * 5))
    b = jnp.asarray(np.tile([2.0, 3.0], (5, 1)))
    x = np.asarray(lu_solve_pallas_batched(A, b, interpret=True))
    np.testing.assert_allclose(x, np.tile([1.0, 2.0], (5, 1)), rtol=1e-12)


def test_pallas_lu_singular_lane_zeroed():
    A, b = systems(4, 6, seed=1)
    A = A.at[2].set(0.0)  # one singular lane must not poison the others
    x = np.asarray(lu_solve_pallas_batched(A, b, interpret=True))
    ref = np.asarray(lu_solve_batched(A, b, 1e-15))
    np.testing.assert_allclose(x, ref, rtol=1e-9, atol=1e-10)
    np.testing.assert_array_equal(x[2], np.zeros(6))


def test_pallas_lu_mna_matrices():
    # realistic MNA systems from the dbmixer circuit (zero diagonals on
    # V-source branch rows -> pivoting is actually exercised)
    from circuitsimulator_tpu.api import Simulator
    import jax
    sim = Simulator.from_file("tests/netlists/dbmixer.sp")
    eng = sim.engine
    N = eng.N
    G, I = eng.dc_static(sim.params, jnp.asarray(1.0, eng.dtype))
    x = jnp.zeros((N,), eng.dtype)
    G, I = eng.assemble_dc_iter(G, I, sim.params, x,
                                jnp.asarray(1e-6, eng.dtype))
    A = jnp.broadcast_to(G[:N, :N], (9, N, N))
    b = jnp.broadcast_to(I[:N], (9, N))
    xs = np.asarray(lu_solve_pallas_batched(A, b, interpret=True,
                                            lane_block=8))
    ref = np.linalg.solve(np.asarray(G[:N, :N]), np.asarray(I[:N]))
    for i in range(9):
        np.testing.assert_allclose(xs[i], ref, rtol=1e-8, atol=1e-10)
