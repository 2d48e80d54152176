"""Gauss-Seidel iterative solve, vmap-safe.

Behavioral contract (reference: include/solver.hpp:139-204):
- warm-startable (x0), |diag| < 1e-12 replaced by sign-preserving 1e-12
  (a non-negative zero counts as positive),
- one sweep updates x in place (j<i uses new values, j>i old values),
- stops when the sweep-to-sweep 2-norm delta < tol or maxIters reached.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def gauss_seidel_solve(A, b, x0=None, max_iters=1000, tol=1e-10, diag_eps=1e-12):
    N = A.shape[-1]
    if N == 0:
        return b
    x0 = jnp.zeros_like(b) if x0 is None else x0

    diag = jnp.diagonal(A, axis1=-2, axis2=-1)
    sign = jnp.where(diag >= 0.0, 1.0, -1.0)
    diag_reg = jnp.where(jnp.abs(diag) < diag_eps, sign * diag_eps, diag)

    def sweep_row(i, x):
        s = b[i] - (jnp.dot(A[i], x) - A[i, i] * x[i])
        return x.at[i].set(s / diag_reg[i])

    def cond(c):
        x, err, it = c
        return (it < max_iters) & (err >= tol)

    def body(c):
        x, _, it = c
        x_new = lax.fori_loop(0, N, sweep_row, x)
        err = jnp.linalg.norm(x_new - x)
        return x_new, err, it + 1

    inf = jnp.asarray(jnp.inf, dtype=b.dtype)
    x, _, _ = lax.while_loop(cond, body, (x0, inf, jnp.int32(0)))
    return x
