"""Pallas TPU kernel: batched dense LU solve with partial pivoting.

The MNA systems are tiny (N ~ 13-64) but there are thousands of them (one
per Monte-Carlo lane, every Newton iteration).  The XLA path (ops/lu.py
under vmap) streams the (B, N, N) batch through HBM once per elimination
step; this kernel instead keeps a *block of lanes resident in VMEM* for the
whole factorization + solve, reading A and b from HBM exactly once.

Layout: lane-minor (N, N, TB) blocks — the batch dimension sits in the
128-wide lane axis of the VPU, so every elimination step is a full-width
vector op across TB lanes; per-lane pivoting is a masked argmax + one-hot
masked reduction (no gathers).

Numerics match ops/lu.py: |pivot| < pivot_floor in any column fails the
whole lane to the zero vector (reference solver.hpp:58-61, 94-97
semantics); tiny back-substitution diagonals zero that component.

The kernel is interpret-mode tested in CI (no TPU needed) and used on
hardware via `lu_solve_pallas_batched`.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_LANE_BLOCK = 128


def _lu_kernel(a_ref, b_ref, x_ref, *, n: int, pivot_floor: float):
    A = a_ref[:]          # (n, n, TB)
    b = b_ref[:]          # (n, TB)
    TB = b.shape[-1]
    dtype = A.dtype
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, TB), 0)
    ok = jnp.ones((TB,), dtype=jnp.bool_)

    for k in range(n):
        col = A[:, k, :]                                   # (n, TB)
        abscol = jnp.where(row_ids >= k, jnp.abs(col),
                           jnp.asarray(-1.0, dtype))
        # explicit int32 index dtype: under jax_enable_x64 jnp.argmax would
        # pick int64, which Mosaic's reduce-index lowering rejects
        p = jax.lax.argmax(abscol, 0, jnp.int32)           # (TB,)
        maxabs = jnp.max(abscol, axis=0)                   # (TB,)
        ok = ok & (maxabs >= pivot_floor)
        onehot_p = (row_ids == p[None, :]).astype(dtype)   # (n, TB)
        # extract row p per lane (masked reduction), write rows k/p swapped
        rowp = jnp.sum(A * onehot_p[:, None, :], axis=0)   # (n, TB)
        rowk = A[k, :, :]                                  # (n, TB)
        is_p = (row_ids == p[None, :])[:, None, :]
        is_k = (row_ids == k)[:, None, :]
        A = jnp.where(is_p, rowk[None, :, :], A)
        A = jnp.where(is_k, rowp[None, :, :], A)
        bp = jnp.sum(b * onehot_p, axis=0)
        bk = b[k, :]
        b = jnp.where(row_ids == p[None, :], bk[None, :], b)
        b = jnp.where(row_ids == k, bp[None, :], b)
        pivot = A[k, k, :]
        safe = jnp.where(pivot != 0.0, pivot, 1.0)
        factors = jnp.where(row_ids > k, A[:, k, :] / safe[None, :], 0.0)
        A = A - factors[:, None, :] * A[k, :, :][None, :, :]
        b = b - factors * b[k, :][None, :]

    x = jnp.zeros_like(b)
    for j in range(n - 1, -1, -1):
        s = b[j, :] - jnp.sum(A[j, :, :] * x, axis=0)
        d = A[j, j, :]
        xj = jnp.where(jnp.abs(d) < pivot_floor, 0.0,
                       s / jnp.where(d != 0.0, d, 1.0))
        x = jnp.where(row_ids == j, xj[None, :], x)

    x_ref[:] = jnp.where(ok[None, :], x, 0.0)


def lu_solve_pallas_batched(A, b, pivot_floor: float = 1e-15,
                            lane_block: int = DEFAULT_LANE_BLOCK,
                            interpret: bool = False):
    """Solve B independent systems.  A: (B, N, N), b: (B, N) -> (B, N).

    Lanes are re-laid out lane-minor, processed in VMEM-resident blocks of
    `lane_block`, and transposed back.  B is padded to a multiple of
    lane_block with identity systems.
    """
    B, n, _ = A.shape
    tb = min(lane_block, max(B, 1))
    pad = (-B) % tb
    if pad:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), (pad, n, n))
        A = jnp.concatenate([A, eye], axis=0)
        b = jnp.concatenate([b, jnp.zeros((pad, n), b.dtype)], axis=0)
    Bp = A.shape[0]
    At = jnp.moveaxis(A, 0, -1)        # (n, n, Bp)
    bt = jnp.moveaxis(b, 0, -1)        # (n, Bp)

    kernel = functools.partial(_lu_kernel, n=n,
                               pivot_floor=float(pivot_floor))
    grid = (Bp // tb,)
    x = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, Bp), A.dtype),
        grid=grid,
        in_specs=[
            # jnp.int32 zeros: Python ints trace as i64 under
            # jax_enable_x64 and Mosaic rejects i64 index maps
            pl.BlockSpec((n, n, tb),
                         lambda i: (jnp.int32(0), jnp.int32(0), i)),
            pl.BlockSpec((n, tb), lambda i: (jnp.int32(0), i)),
        ],
        out_specs=pl.BlockSpec((n, tb), lambda i: (jnp.int32(0), i)),
        interpret=interpret,
    )(At, bt)
    x = jnp.moveaxis(x, -1, 0)         # (Bp, n)
    return x[:B]
