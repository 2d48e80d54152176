"""Dense LU solve with partial pivoting, expressed as vmap-safe jnp.

Behavioral contract (reference: include/solver.hpp:30-131):
- Doolittle elimination with partial (row) pivoting.
- If the best available pivot in some column has |pivot| < 1e-15 the whole
  decomposition "fails" and the solve returns the zero vector
  (solver.hpp:58-61, 94-97).
- Back-substitution maps a tiny diagonal (|d| < 1e-15) to x_i = 0
  (solver.hpp:121-127).

The elimination is formulated as N masked rank-1 updates over the full
matrix so every shape is static; under vmap the updates become (B, N, N)
elementwise ops that map well onto the TPU VPU.  A Pallas lane-major variant
for large batches lives in ops/pallas_lu.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def lu_solve(A, b, pivot_floor=1e-15):
    """Solve A x = b (single system; vmap for batches).

    A: (N, N), b: (N,).  Returns x: (N,).
    """
    N = A.shape[-1]
    if N == 0:
        return b
    idx = jnp.arange(N)

    def elim(k, carry):
        A, b, minpiv = carry
        col = A[:, k]
        abscol = jnp.where(idx >= k, jnp.abs(col), -1.0)
        p = jnp.argmax(abscol)
        maxabs = abscol[p]
        minpiv = jnp.minimum(minpiv, maxabs)
        # swap rows k and p of A and b
        rowk, rowp = A[k], A[p]
        A = A.at[k].set(rowp).at[p].set(rowk)
        bk, bp = b[k], b[p]
        b = b.at[k].set(bp).at[p].set(bk)
        pivot = A[k, k]
        safe_pivot = jnp.where(pivot != 0.0, pivot, 1.0)
        factors = jnp.where(idx > k, A[:, k] / safe_pivot, 0.0)
        A = A - factors[:, None] * A[k][None, :]
        b = b - factors * b[k]
        return A, b, minpiv

    minpiv0 = jnp.asarray(jnp.inf, dtype=A.dtype)
    A, b, minpiv = lax.fori_loop(0, N, elim, (A, b, minpiv0))

    def back(i, x):
        j = N - 1 - i
        s = b[j] - jnp.dot(A[j], x)
        d = A[j, j]
        xi = jnp.where(jnp.abs(d) < pivot_floor, 0.0,
                       s / jnp.where(d != 0.0, d, 1.0))
        return x.at[j].set(xi)

    x = lax.fori_loop(0, N, back, jnp.zeros_like(b))
    # decomposition "failed": reference returns the zero vector
    return jnp.where(minpiv < pivot_floor, jnp.zeros_like(x), x)


lu_solve_batched = jax.vmap(lu_solve, in_axes=(0, 0, None))
