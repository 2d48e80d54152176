"""Tridiagonal and bordered-tridiagonal solvers via cyclic reduction.

For the synthetic large-circuit stress config (BASELINE.md: 10k-node RC
ladder + diode chain) the MNA node block is tridiagonal: node i couples only
to nodes i-1 / i+1 and ground.  Dense LU is O(N^3) and unusable at N=10^4;
the TPU-native solve is cyclic reduction — O(N) work in O(log N) *depth*,
built entirely from strided slices and elementwise ops, so it vectorizes
over batch lanes and keeps the sequential chain at ~14 levels instead of
10,000 scan steps.

V-source / inductor branch equations attach as a thin border:

    [ T   U ] [x]   [f]        T: (N,N) tridiagonal, m = #branches (small)
    [ W   D ] [y] = [g]

solved by the Schur complement on the m x m corner: m+1 CR solves with T,
one tiny dense solve.

Stability: plain CR (no pivoting) — exact for the diagonally dominant
systems the ladder produces (C/dt + 1/R + gmin + diode conductance on the
diagonal).  Not a general pivoted solver; callers choose it only for
detected ladder topologies (see ir/band.py).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _pad_pow2(a, b, c, d):
    """Pad the system to a power-of-two size with decoupled identity rows."""
    N = a.shape[-1]
    M = 1 << max(int(np.ceil(np.log2(max(N, 1)))), 0)
    if M == N:
        return a, b, c, d, N
    pad = M - N

    def padded(x, fill):
        extra = jnp.full(x.shape[:-1] + (pad,), fill, x.dtype)
        return jnp.concatenate([x, extra], -1)

    return padded(a, 0.0), padded(b, 1.0), padded(c, 0.0), padded(d, 0.0), N


# Hybrid cutoff: stop the reduction at `cutoff` unknowns and solve the
# remainder densely (matrix from three broadcast masks, one XLA LU).
# MEASURED SLOWER on the v5e at n=10k — the late CR levels are cheap
# (small arrays) while XLA's TPU LU is row-sequential: 1.28 ms (pure CR)
# vs 1.33/1.40/1.59/2.15 ms at cutoff 128/256/512/1024.  Default stays
# pure CR; the parameter remains for other hardware where dense solves
# win.
CR_DENSE_CUTOFF = 1


def _dense_tridiag_solve(a, b, c, d):
    """Direct solve of a small tridiagonal system via a dense LU."""
    k = a.shape[-1]
    eye = jnp.eye(k, dtype=b.dtype)
    dn = jnp.eye(k, k=-1, dtype=b.dtype)     # subdiagonal mask
    up = jnp.eye(k, k=1, dtype=b.dtype)      # superdiagonal mask
    A = (b[..., :, None] * eye + a[..., :, None] * dn
         + c[..., :, None] * up)
    batch = jnp.broadcast_shapes(A.shape[:-2], d.shape[:-1])
    A = jnp.broadcast_to(A, batch + (k, k))
    dd = jnp.broadcast_to(d, batch + (k,))
    return jnp.linalg.solve(A, dd[..., None])[..., 0]


def cr_solve(a, b, c, d, cutoff: int = CR_DENSE_CUTOFF):
    """Solve the tridiagonal system
        a[i] x[i-1] + b[i] x[i] + c[i] x[i+1] = d[i]   (a[0] = c[N-1] = 0)
    by cyclic reduction.  All arrays (..., N); batch dims broadcast.
    """
    a, b, c, d, N = _pad_pow2(jnp.asarray(a), jnp.asarray(b),
                              jnp.asarray(c), jnp.asarray(d))
    levels = []
    while a.shape[-1] > max(cutoff, 1):
        # split into even (kept) and odd (eliminated) equations
        ae, be, ce, de = a[..., ::2], b[..., ::2], c[..., ::2], d[..., ::2]
        ao, bo, co, do = a[..., 1::2], b[..., 1::2], c[..., 1::2], d[..., 1::2]
        levels.append((ao, bo, co, do))
        inv_bo = 1.0 / bo

        # even equation i uses odd neighbors i-1 (left) and i+1 (right):
        # left neighbor of even k is odd k-1  -> shift odd arrays right
        def shift_r(x, fill):
            pad = jnp.full(x.shape[:-1] + (1,), fill, x.dtype)
            return jnp.concatenate([pad, x[..., :-1]], -1)

        a_l = shift_r(ao, 0.0)
        b_l = shift_r(bo, 1.0)
        c_l = shift_r(co, 0.0)
        d_l = shift_r(do, 0.0)
        inv_bl = 1.0 / b_l
        # right neighbor of even k is odd k (same index in the odd subset)
        alpha = ae * inv_bl            # couples to x_{k-1 odd}
        gamma = ce * inv_bo            # couples to x_{k odd} (right)
        a_new = -alpha * a_l
        b_new = be - alpha * c_l - gamma * ao
        c_new = -gamma * co
        d_new = de - alpha * d_l - gamma * do
        a, b, c, d = a_new, b_new, c_new, d_new
    if a.shape[-1] > 1:
        x = _dense_tridiag_solve(a, b, c, d)
    else:
        x = d / b   # single remaining unknown
    for (ao, bo, co, do) in reversed(levels):
        # interleave: given even solutions x, recover odd:
        # x_odd[k] = (d_o[k] - a_o[k] x_even[k] - c_o[k] x_even[k+1]) / b_o[k]
        zr = jnp.zeros(x.shape[:-1] + (1,), x.dtype)
        x_right = jnp.concatenate([x[..., 1:], zr], -1)
        x_odd = (do - ao * x - co * x_right) / bo
        # even/odd halves are equal-length at every level (power-of-two
        # padding), so the interleave is a stack+reshape — strided
        # .at[::2].set scatters are slow on TPU
        b_shape = jnp.broadcast_shapes(x.shape, x_odd.shape)
        xb = jnp.broadcast_to(x, b_shape)
        ob = jnp.broadcast_to(x_odd, b_shape)
        x = jnp.stack([xb, ob], axis=-1).reshape(*b_shape[:-1],
                                                 2 * b_shape[-1])
    return x[..., :N]


def pcr_solve(a, b, c, d):
    """Parallel cyclic reduction: same system as cr_solve, but BOTH
    neighbors are eliminated from every equation at every level, so there
    is no back-substitution sweep — ~log2(N) sequential stages instead of
    CR's 2*log2(N), each a fixed-size elementwise pass.  O(N log N) work
    (vs CR's O(N)), which is irrelevant on the VPU at these sizes; what
    matters on TPU is the halved sequential-dispatch depth.  Same
    diagonal-dominance caveat as cr_solve."""
    a, b, c, d, N = _pad_pow2(jnp.asarray(a), jnp.asarray(b),
                              jnp.asarray(c), jnp.asarray(d))
    M = a.shape[-1]

    def shift_r(x, s, fill):      # value of neighbor i-s, at position i
        pad = jnp.full(x.shape[:-1] + (s,), fill, x.dtype)
        return jnp.concatenate([pad, x[..., :-s]], -1)

    def shift_l(x, s, fill):      # value of neighbor i+s, at position i
        pad = jnp.full(x.shape[:-1] + (s,), fill, x.dtype)
        return jnp.concatenate([x[..., s:], pad], -1)

    s = 1
    while s < M:
        am, bm, cm, dm = (shift_r(a, s, 0.0), shift_r(b, s, 1.0),
                          shift_r(c, s, 0.0), shift_r(d, s, 0.0))
        ap, bp, cp, dp = (shift_l(a, s, 0.0), shift_l(b, s, 1.0),
                          shift_l(c, s, 0.0), shift_l(d, s, 0.0))
        alpha = -a / bm
        gamma = -c / bp
        b = b + alpha * cm + gamma * ap
        d = d + alpha * dm + gamma * dp
        a = alpha * am
        c = gamma * cp
        s *= 2
    return (d / b)[..., :N]


def bordered_solve(a, b, c, U, W, D, f, g, algo: str = "cr"):
    """Solve the bordered system [[T, U], [W, D]] [x; y] = [f; g].

    T tridiagonal via (a, b, c) of length N; U: (N, m), W: (m, N),
    D: (m, m), f: (N,), g: (m,).  m is expected to be tiny (V/L branches).
    Returns (x, y).
    """
    solve = pcr_solve if algo == "pcr" else cr_solve
    m = D.shape[-1]
    if m == 0:
        return solve(a, b, c, f), g[..., :0]
    # solve T [z0 | Z] = [f | U]  with m+1 stacked CR solves
    rhs = jnp.concatenate([f[..., None], U], axis=-1)      # (N, m+1)
    sols = solve(a[..., None, :], b[..., None, :], c[..., None, :],
                 jnp.moveaxis(rhs, -1, -2))                # (m+1, N)
    z0 = sols[..., 0, :]
    Z = jnp.moveaxis(sols[..., 1:, :], -2, -1)             # (N, m)
    S = D - W @ Z                                          # (m, m)
    from .lu import lu_solve
    y = lu_solve(S, g - jnp.einsum("...mn,...n->...m", W, z0))
    x = z0 - jnp.einsum("...nm,...m->...n", Z, y)
    return x, y
