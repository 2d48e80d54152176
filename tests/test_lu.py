"""Batched LU and Gauss-Seidel solver tests (reference: include/solver.hpp)."""

import numpy as np
import jax
import jax.numpy as jnp

from circuitsimulator_tpu.ops.lu import lu_solve, lu_solve_batched
from circuitsimulator_tpu.ops.gauss_seidel import gauss_seidel_solve


def random_system(n, seed, cond_boost=0.0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n)) + np.eye(n) * cond_boost
    b = rng.standard_normal(n)
    return A, b


def test_lu_matches_numpy():
    for n in (1, 2, 5, 13, 31, 64):
        A, b = random_system(n, seed=n)
        x = np.asarray(lu_solve(jnp.asarray(A), jnp.asarray(b)))
        np.testing.assert_allclose(x, np.linalg.solve(A, b), rtol=1e-9, atol=1e-10)


def test_lu_needs_pivoting():
    # zero diagonal forces a row swap (V-source branch rows look like this)
    A = np.array([[0.0, 1.0], [1.0, 1.0]])
    b = np.array([2.0, 3.0])
    x = np.asarray(lu_solve(jnp.asarray(A), jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(A, b), rtol=1e-12)


def test_lu_singular_returns_zeros():
    # reference returns the zero vector on decomposition failure
    # (solver.hpp:94-97)
    A = np.zeros((3, 3))
    b = np.ones(3)
    x = np.asarray(lu_solve(jnp.asarray(A), jnp.asarray(b)))
    np.testing.assert_array_equal(x, np.zeros(3))

    A2 = np.array([[1.0, 2.0], [2.0, 4.0]])  # rank 1
    x2 = np.asarray(lu_solve(jnp.asarray(A2), jnp.asarray(b[:2])))
    np.testing.assert_array_equal(x2, np.zeros(2))


def test_lu_batched_vmap():
    B, n = 17, 8
    rng = np.random.default_rng(0)
    A = rng.standard_normal((B, n, n))
    b = rng.standard_normal((B, n))
    x = np.asarray(lu_solve_batched(jnp.asarray(A), jnp.asarray(b), 1e-15))
    ref = np.stack([np.linalg.solve(A[i], b[i]) for i in range(B)])
    np.testing.assert_allclose(x, ref, rtol=1e-8, atol=1e-9)


def test_lu_jit_under_vmap_under_jit():
    n = 6
    A, b = random_system(n, seed=3)
    f = jax.jit(lambda A, b: lu_solve(A, b))
    np.testing.assert_allclose(np.asarray(f(A, b)), np.linalg.solve(A, b),
                               rtol=1e-9, atol=1e-10)


def test_gauss_seidel_diag_dominant():
    n = 12
    rng = np.random.default_rng(7)
    A = rng.standard_normal((n, n)) * 0.05 + np.eye(n) * 3.0
    b = rng.standard_normal(n)
    x = np.asarray(gauss_seidel_solve(jnp.asarray(A), jnp.asarray(b),
                                      max_iters=2000, tol=1e-12))
    np.testing.assert_allclose(x, np.linalg.solve(A, b), rtol=1e-8, atol=1e-9)


def test_gauss_seidel_warm_start():
    n = 5
    A = np.eye(n) * 2.0
    b = np.ones(n)
    x0 = jnp.asarray(np.full(n, 0.5))
    x = np.asarray(gauss_seidel_solve(jnp.asarray(A), jnp.asarray(b), x0=x0))
    np.testing.assert_allclose(x, 0.5 * np.ones(n), rtol=1e-12)


def test_pcr_matches_cr():
    import numpy as np
    import jax.numpy as jnp
    from circuitsimulator_tpu.ops.tridiag import cr_solve, pcr_solve
    rng = np.random.default_rng(7)
    for n in (1, 2, 3, 17, 100, 1000):
        b = 4.0 + rng.random(n)
        a = rng.random(n) * 0.5
        c = rng.random(n) * 0.5
        a[0] = c[-1] = 0.0
        d = rng.standard_normal(n)
        x_cr = np.asarray(cr_solve(a, b, c, d))
        x_pcr = np.asarray(pcr_solve(a, b, c, d))
        np.testing.assert_allclose(x_pcr, x_cr, rtol=1e-10, atol=1e-12)
        # and against the dense ground truth
        A = np.diag(b) + np.diag(a[1:], -1) + np.diag(c[:-1], 1)
        np.testing.assert_allclose(x_pcr, np.linalg.solve(A, d),
                                   rtol=1e-9, atol=1e-11)
