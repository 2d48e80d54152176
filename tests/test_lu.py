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


def test_lu_auto_vmap_rule():
    """make_lu_solve_auto: the custom_vmap rule must match per-lane
    lu_solve for every in_axes combination (batched/broadcast A and b)."""
    from circuitsimulator_tpu.ops.lu import make_lu_solve_auto
    solve = make_lu_solve_auto(1e-15)
    B, n = 13, 7
    rng = np.random.default_rng(11)
    A = jnp.asarray(rng.standard_normal((B, n, n)))
    b = jnp.asarray(rng.standard_normal((B, n)))
    ref = lu_solve_batched(A, b, 1e-15)
    # both batched
    np.testing.assert_allclose(np.asarray(jax.vmap(solve)(A, b)),
                               np.asarray(ref), rtol=1e-12, atol=1e-13)
    # unbatched call == plain lu_solve
    np.testing.assert_allclose(np.asarray(solve(A[0], b[0])),
                               np.asarray(lu_solve(A[0], b[0], 1e-15)),
                               rtol=1e-12)
    # broadcast A, batched b
    xa = jax.vmap(solve, in_axes=(None, 0))(A[0], b)
    refa = lu_solve_batched(jnp.broadcast_to(A[0], (B, n, n)), b, 1e-15)
    np.testing.assert_allclose(np.asarray(xa), np.asarray(refa), rtol=1e-12,
                               atol=1e-13)
    # batched A, broadcast b
    xb = jax.vmap(solve, in_axes=(0, None))(A, b[0])
    refb = lu_solve_batched(A, jnp.broadcast_to(b[0], (B, n)), 1e-15)
    np.testing.assert_allclose(np.asarray(xb), np.asarray(refb), rtol=1e-12,
                               atol=1e-13)
    # under jit + nested in a scan body (the transient hot-loop shape)
    f = jax.jit(lambda A, b: jax.vmap(solve)(A, b))
    np.testing.assert_allclose(np.asarray(f(A, b)), np.asarray(ref),
                               rtol=1e-12, atol=1e-13)


def test_lu_auto_singular_lane():
    """A singular lane must zero out, matching reference solver.hpp:94-97,
    through the custom_vmap path."""
    from circuitsimulator_tpu.ops.lu import make_lu_solve_auto
    solve = make_lu_solve_auto(1e-15)
    n = 5
    rng = np.random.default_rng(3)
    A = rng.standard_normal((4, n, n))
    A[2] = 0.0
    b = rng.standard_normal((4, n))
    x = np.asarray(jax.vmap(solve)(jnp.asarray(A), jnp.asarray(b)))
    np.testing.assert_array_equal(x[2], np.zeros(n))
    for i in (0, 1, 3):
        np.testing.assert_allclose(x[i], np.linalg.solve(A[i], b[i]),
                                   rtol=1e-9, atol=1e-10)
