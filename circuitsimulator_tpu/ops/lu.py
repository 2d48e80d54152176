"""Dense LU solve with partial pivoting, expressed as vmap-safe jnp.

Behavioral contract (reference: include/solver.hpp:30-131):
- Doolittle elimination with partial (row) pivoting.
- If the best available pivot in some column has |pivot| < 1e-15 the whole
  decomposition "fails" and the solve returns the zero vector
  (solver.hpp:58-61, 94-97).
- Back-substitution maps a tiny diagonal (|d| < 1e-15) to x_i = 0
  (solver.hpp:121-127).

Two lowerings of the same algorithm:
- N <= UNROLL_LIMIT (the common SPICE case): the elimination is a *static*
  Python loop — every index is a compile-time constant, each column step is
  a masked argmax + where-select row swap + rank-1 update on full-size
  tensors.  No `fori_loop`, no dynamic slices: under vmap this compiles to
  straight-line vector code with zero loop overhead per TPU step.
- larger N: `lax.fori_loop` with dynamic indexing (compile-size bound).

Complex dtypes are supported (pivot magnitudes are real); used by the AC
analysis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

UNROLL_LIMIT = 16


def _lu_solve_unrolled(A, b, pivot_floor):
    """Static-index elimination; A: (N, N), b: (N,).

    NO dynamic-update-slices anywhere: row writes at the static index k use
    constant-mask where-selects, and the traced pivot row is extracted with
    a masked reduction.  Profiling the transient hot loop (B=8192 dbmixer)
    showed the former `.at[k].set` writes lowering to dynamic-update-slice
    + copy pairs that cost ~47% of the whole timestep; constant-predicate
    selects fuse into the surrounding elementwise work instead."""
    N = A.shape[-1]
    rdt = jnp.real(A).dtype
    idx = jnp.arange(N)
    minpiv = jnp.asarray(jnp.inf, dtype=rdt)
    neg1 = jnp.asarray(-1.0, rdt)
    for k in range(N):
        abscol = jnp.where(idx >= k, jnp.abs(A[:, k]), neg1)
        p = jnp.argmax(abscol)
        minpiv = jnp.minimum(minpiv, jnp.max(abscol))
        # swap rows k <-> p.  p is traced, so row p is extracted with a
        # masked reduction instead of a dynamic gather (gathers are slow
        # inside TPU loop bodies); both write sides are where-selects.
        onehot_p = (idx == p)
        is_k = idx == k                       # compile-time constant mask
        rowk = A[k]
        rowp = jnp.sum(A * onehot_p[:, None].astype(A.dtype), axis=0)
        A = jnp.where(onehot_p[:, None], rowk[None, :], A)
        A = jnp.where(is_k[:, None], rowp[None, :], A)
        bk = b[k]
        bp = jnp.sum(b * onehot_p.astype(b.dtype))
        b = jnp.where(onehot_p, bk, b)
        b = jnp.where(is_k, bp, b)
        pivot = rowp[k]                       # == A[k, k] after the swap
        safe = jnp.where(pivot != 0.0, pivot, 1.0)
        factors = jnp.where(idx > k, A[:, k] / safe, 0.0)
        A = A - factors[:, None] * rowp[None, :]
        b = b - factors * bp
    x = jnp.zeros_like(b)
    for j in range(N - 1, -1, -1):
        s = b[j] - jnp.dot(A[j], x)
        d = A[j, j]
        xj = jnp.where(jnp.abs(d) < pivot_floor, 0.0,
                       s / jnp.where(d != 0.0, d, 1.0))
        x = jnp.where(idx == j, xj, x)
    return jnp.where(minpiv < pivot_floor, jnp.zeros_like(x), x)


def _lu_solve_looped(A, b, pivot_floor):
    N = A.shape[-1]
    idx = jnp.arange(N)
    rdt = jnp.real(A).dtype

    def elim(k, carry):
        A, b, minpiv = carry
        abscol = jnp.where(idx >= k, jnp.abs(A[:, k]),
                           jnp.asarray(-1.0, rdt))
        p = jnp.argmax(abscol)
        minpiv = jnp.minimum(minpiv, abscol[p])
        rowk, rowp = A[k], A[p]
        A = A.at[k].set(rowp).at[p].set(rowk)
        bk, bp = b[k], b[p]
        b = b.at[k].set(bp).at[p].set(bk)
        pivot = A[k, k]
        safe = jnp.where(pivot != 0.0, pivot, 1.0)
        factors = jnp.where(idx > k, A[:, k] / safe, 0.0)
        A = A - factors[:, None] * A[k][None, :]
        b = b - factors * b[k]
        return A, b, minpiv

    # Seed the pivot tracker FROM the data (inf + 0*A[0,0] == inf): under
    # shard_map a literal-constant carry is axis-invariant while the loop
    # output is varying, which trips the vma check when A is sharded
    # (the SPIKE distributed-PCR interface solve hits this path)
    minpiv0 = (jnp.asarray(jnp.inf, dtype=rdt)
               + jnp.real(A[0, 0]) * jnp.asarray(0.0, rdt))
    A, b, minpiv = lax.fori_loop(0, N, elim, (A, b, minpiv0))

    def back(i, x):
        j = N - 1 - i
        s = b[j] - jnp.dot(A[j], x)
        d = A[j, j]
        xj = jnp.where(jnp.abs(d) < pivot_floor, 0.0,
                       s / jnp.where(d != 0.0, d, 1.0))
        return x.at[j].set(xj)

    x = lax.fori_loop(0, N, back, jnp.zeros_like(b))
    return jnp.where(minpiv < pivot_floor, jnp.zeros_like(x), x)


def lu_solve(A, b, pivot_floor=1e-15):
    """Solve A x = b (single system; vmap for batches).  A: (N, N), b: (N,)."""
    N = A.shape[-1]
    if N == 0:
        return b
    if N <= UNROLL_LIMIT:
        return _lu_solve_unrolled(A, b, pivot_floor)
    return _lu_solve_looped(A, b, pivot_floor)


lu_solve_batched = jax.vmap(lu_solve, in_axes=(0, 0, None))


def _solve_batched_dispatch(A, b, pivot_floor):
    """(B..., N, N) x (B..., N): route big f32 TPU batches to the Pallas
    VMEM-resident kernel, everything else to the vmapped XLA solver."""
    lead = A.shape[:-2]
    N = A.shape[-1]
    Af = A.reshape((-1,) + A.shape[-2:])
    bf = jnp.broadcast_to(b, lead + (N,)).reshape(-1, N)
    # N cap: the Pallas kernel unrolls the elimination statically — compile
    # time and VMEM both scale with N, so only small MNA systems qualify.
    if (jax.default_backend() == "tpu" and A.dtype == jnp.float32
            and Af.shape[0] >= 256 and 0 < N <= 64):
        from .pallas_lu import lu_solve_pallas_batched
        x = lu_solve_pallas_batched(Af, bf, pivot_floor)
    else:
        x = jax.vmap(lu_solve, in_axes=(0, 0, None))(Af, bf, pivot_floor)
    return x.reshape(lead + (N,))


def make_lu_solve_auto(pivot_floor: float):
    """A drop-in lu_solve(A, b) whose VMAPPED form dispatches the whole
    batch to the Pallas kernel (ops/pallas_lu.py) on TPU.

    Motivation (profiled on the B=8192 dbmixer hot loop): under plain vmap
    the unrolled elimination streams the (B, k, k) matrix through HBM ~3
    times per column step — the dominant cost of the whole timestep.  The
    Pallas kernel keeps each 128-lane block resident in VMEM for the full
    factorization, reading A from HBM exactly once."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def solve(A, b):
        return lu_solve(A, b, pivot_floor)

    @solve.def_vmap
    def _rule(axis_size, in_batched, A, b):  # noqa: ANN001
        a_b, b_b = in_batched
        if not a_b:
            A2 = jnp.broadcast_to(A, (axis_size,) + A.shape)
        else:
            A2 = A
        if not b_b:
            b2 = jnp.broadcast_to(b, (axis_size,) + b.shape)
        else:
            b2 = b
        return _solve_batched_dispatch(A2, b2, pivot_floor), True

    return solve
