"""Block cyclic reduction for bordered block-tridiagonal systems.

The block generalization of ops/tridiag.py: the system

    L[i] X[i-1] + D[i] X[i] + U[i] X[i+1] = F[i]     (L[0] = U[nb-1] = 0)

with dense k x k blocks is reduced level-by-level — every level eliminates
the odd-indexed blocks with batched k x k solves and k x k matmuls (both
MXU shapes), halving the block count — so an nb-block system is solved in
O(log2 nb) sequential stages of O(nb k^3) total work, instead of the
reference's dense O((nb k)^3) LU per Newton iteration (solver.hpp:30-80).

Within-block partial pivoting comes from jnp.linalg.solve; across blocks
there is no pivoting (same contract as cyclic reduction), which is exact
for the diagonally dominant systems MNA produces (C/dt + 1/R + gmin on the
diagonal).  Callers select this path only for detected block-banded
topologies (ops/blockband.py).

The border (V-source/inductor branch rows + hub nodes) attaches as

    [ T   Ub ] [x]   [f]       T block-tridiagonal, mb small
    [ Wb  Db ] [y] = [g]

eliminated by a Schur complement: mb+1 extra right-hand sides ride the same
block-CR solve, then one tiny dense mb x mb solve.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _shift_dn(X, fill_eye: bool = False):
    """Value of block neighbor i-1 at position i (block axis -3)."""
    pad_shape = X.shape[:-3] + (1,) + X.shape[-2:]
    if fill_eye:
        pad = jnp.broadcast_to(jnp.eye(X.shape[-1], dtype=X.dtype), pad_shape)
    else:
        pad = jnp.zeros(pad_shape, X.dtype)
    return jnp.concatenate([pad, X[..., :-1, :, :]], axis=-3)


def _shift_up(X):
    """Value of block neighbor i+1 at position i (block axis -3)."""
    pad = jnp.zeros(X.shape[:-3] + (1,) + X.shape[-2:], X.dtype)
    return jnp.concatenate([X[..., 1:, :, :], pad], axis=-3)


def _rsolve(B, A):
    """A @ B^{-1} via a batched (partially pivoted) solve."""
    return jnp.swapaxes(
        jnp.linalg.solve(jnp.swapaxes(B, -1, -2), jnp.swapaxes(A, -1, -2)),
        -1, -2)


def _pad_pow2_blocks(L, D, U, F):
    nb = D.shape[-3]
    M = 1 << max(int(np.ceil(np.log2(max(nb, 1)))), 0)
    if M == nb:
        return L, D, U, F, nb
    pad = M - nb
    k = D.shape[-1]

    def zpad(X):
        return jnp.concatenate(
            [X, jnp.zeros(X.shape[:-3] + (pad,) + X.shape[-2:], X.dtype)],
            axis=-3)

    eye = jnp.broadcast_to(jnp.eye(k, dtype=D.dtype),
                           D.shape[:-3] + (pad, k, k))
    D = jnp.concatenate([D, eye], axis=-3)
    return zpad(L), D, zpad(U), zpad(F), nb


def block_cr_solve(L, D, U, F):
    """Solve the block-tridiagonal system.  L/D/U: (..., nb, k, k);
    F: (..., nb, k, q) — q right-hand sides solved together."""
    L, D, U, F, nb = _pad_pow2_blocks(jnp.asarray(L), jnp.asarray(D),
                                      jnp.asarray(U), jnp.asarray(F))
    levels = []
    while D.shape[-3] > 1:
        Le, De, Ue, Fe = (L[..., ::2, :, :], D[..., ::2, :, :],
                          U[..., ::2, :, :], F[..., ::2, :, :])
        Lo, Do, Uo, Fo = (L[..., 1::2, :, :], D[..., 1::2, :, :],
                          U[..., 1::2, :, :], F[..., 1::2, :, :])
        levels.append((Lo, Do, Uo, Fo))
        # left odd neighbor of even block e is odd block e-1 -> shift down
        Ll, Dl = _shift_dn(Lo), _shift_dn(Do, fill_eye=True)
        Ul, Fl = _shift_dn(Uo), _shift_dn(Fo)
        alpha = _rsolve(Dl, Le)          # couples to X_{e-1, odd}
        gamma = _rsolve(Do, Ue)          # couples to X_{e, odd} (right)
        L = -alpha @ Ll
        D = De - alpha @ Ul - gamma @ Lo
        U = -gamma @ Uo
        F = Fe - alpha @ Fl - gamma @ Fo
    X = jnp.linalg.solve(D, F)
    for (Lo, Do, Uo, Fo) in reversed(levels):
        # X_odd[e] = D_o[e]^-1 (F_o[e] - L_o[e] X_even[e] - U_o[e] X_even[e+1])
        Xo = jnp.linalg.solve(Do, Fo - Lo @ X - Uo @ _shift_up(X))
        # equal halves at every level (power-of-two padding): interleave by
        # stack + reshape (strided scatters are slow on TPU)
        shape = jnp.broadcast_shapes(X.shape, Xo.shape)
        Xb, Ob = jnp.broadcast_to(X, shape), jnp.broadcast_to(Xo, shape)
        X = jnp.stack([Xb, Ob], axis=-3).reshape(
            *shape[:-3], 2 * shape[-3], *shape[-2:])
    return X[..., :nb, :, :]


def bordered_block_solve(L, D, U, Ub, Wb, Db, f, g,
                         pivot_floor: float = 1e-15):
    """Solve [[T, Ub], [Wb, Db]] [x; y] = [f; g] with T block-tridiagonal.

    L/D/U: (..., nb, k, k); Ub: (..., n_pad, mb); Wb: (..., mb, n_pad);
    Db: (..., mb, mb); f: (..., n_pad); g: (..., mb).  Returns (x, y) with
    x (..., n_pad) in interior-slot order and y (..., mb)."""
    nb, k = D.shape[-3], D.shape[-1]
    mb = Db.shape[-1]
    batch = jnp.broadcast_shapes(D.shape[:-3], f.shape[:-1], Ub.shape[:-2])
    fb = jnp.broadcast_to(f, batch + f.shape[-1:])
    if mb == 0:
        F = fb.reshape(*batch, nb, k, 1)
        x = block_cr_solve(L, D, U, F).reshape(*batch, nb * k)
        return x, g[..., :0]
    Ubb = jnp.broadcast_to(Ub, batch + Ub.shape[-2:])
    rhs = jnp.concatenate([fb[..., None], Ubb], axis=-1)
    F = rhs.reshape(*batch, nb, k, mb + 1)
    sols = block_cr_solve(L, D, U, F).reshape(*batch, nb * k, mb + 1)
    z0 = sols[..., 0]                       # (..., n_pad)
    Z = sols[..., 1:]                       # (..., n_pad, mb)
    S = Db - Wb @ Z                         # (..., mb, mb)
    from .lu import lu_solve
    rhs_y = g - jnp.einsum("...mn,...n->...m", Wb, z0)
    bdims = jnp.broadcast_shapes(S.shape[:-2], rhs_y.shape[:-1])
    if bdims:
        import jax
        Sf = jnp.broadcast_to(S, bdims + S.shape[-2:]).reshape(-1, mb, mb)
        rf = jnp.broadcast_to(rhs_y, bdims + (mb,)).reshape(-1, mb)
        y = jax.vmap(lu_solve, in_axes=(0, 0, None))(
            Sf, rf, pivot_floor).reshape(*bdims, mb)
    else:
        y = lu_solve(S, rhs_y, pivot_floor)
    x = z0 - jnp.einsum("...nm,...m->...n", Z, y)
    return x, y


# ---------------------------------------------------------------------
# Pre-factored form: factor T once per transient (the BE companion
# matrix is constant while dt is fixed), then every Newton iteration's
# solve is O(nb k^2) matmul work instead of the O(nb k^3)
# re-elimination of block_cr_solve.  The nonlinear devices ride rank-1
# Woodbury rows over this base (ops/woodbury.py solve_op).
# ---------------------------------------------------------------------

def block_cr_factor(L, D, U):
    """Factor the block-tridiagonal T: returns factors for
    block_cr_apply.  Per CR level stores (alpha, gamma, Lo, Uo, invDo) —
    the explicit odd-block inverses make the back-substitution pure
    batched matmuls (MXU work, no per-apply factorizations).  Explicit
    inverses are safe here for the same reason cross-block non-pivoting
    is (diagonal dominance of the MNA companion form)."""
    L, D, U = jnp.asarray(L), jnp.asarray(D), jnp.asarray(U)
    k = D.shape[-1]
    F0 = jnp.zeros(D.shape[:-2] + (k, 0), D.dtype)
    L, D, U, _, nb = _pad_pow2_blocks(L, D, U, F0)
    levels = []
    while D.shape[-3] > 1:
        Le, De, Ue = (L[..., ::2, :, :], D[..., ::2, :, :],
                      U[..., ::2, :, :])
        Lo, Do, Uo = (L[..., 1::2, :, :], D[..., 1::2, :, :],
                      U[..., 1::2, :, :])
        Ll, Dl = _shift_dn(Lo), _shift_dn(Do, fill_eye=True)
        Ul = _shift_dn(Uo)
        alpha = _rsolve(Dl, Le)
        gamma = _rsolve(Do, Ue)
        levels.append((alpha, gamma, Lo, Uo, jnp.linalg.inv(Do)))
        L = -alpha @ Ll
        D = De - alpha @ Ul - gamma @ Lo
        U = -gamma @ Uo
    return {"levels": levels, "invD_root": jnp.linalg.inv(D), "nb": nb}


def block_cr_apply(fac, F):
    """Solve T X = F with block_cr_factor's output.  F: (..., nb, k, q).
    Matmul-only (the factorization's inverses are applied, not redone)."""
    nb = fac["nb"]
    F = jnp.asarray(F)
    M = fac["invD_root"].shape[-3] * (2 ** len(fac["levels"]))
    pad = M - F.shape[-3]
    if pad:
        F = jnp.concatenate(
            [F, jnp.zeros(F.shape[:-3] + (pad,) + F.shape[-2:], F.dtype)],
            axis=-3)
    saved = []
    for (alpha, gamma, _, _, _) in fac["levels"]:
        Fe, Fo = F[..., ::2, :, :], F[..., 1::2, :, :]
        saved.append(Fo)
        F = Fe - alpha @ _shift_dn(Fo) - gamma @ Fo
    X = fac["invD_root"] @ F
    for (alpha, gamma, Lo, Uo, invDo), Fo in zip(reversed(fac["levels"]),
                                                 reversed(saved)):
        Xo = invDo @ (Fo - Lo @ X - Uo @ _shift_up(X))
        shape = jnp.broadcast_shapes(X.shape, Xo.shape)
        Xb, Ob = jnp.broadcast_to(X, shape), jnp.broadcast_to(Xo, shape)
        X = jnp.stack([Xb, Ob], axis=-3).reshape(
            *shape[:-3], 2 * shape[-3], *shape[-2:])
    return X[..., :nb, :, :]


def bordered_block_factor(L, D, U, Ub, Wb, Db,
                          pivot_floor: float = 1e-15):
    """Factor [[T, Ub], [Wb, Db]]: block-CR factors for T plus the
    border's Schur pieces Z = T^{-1} Ub and S = Db - Wb Z (stored as an
    explicit inverse; mb is tiny)."""
    nb, k = D.shape[-3], D.shape[-1]
    mb = Db.shape[-1]
    fac = block_cr_factor(L, D, U)
    out = {"cr": fac, "nb": nb, "k": k, "mb": mb, "Wb": Wb}
    if mb:
        Z = block_cr_apply(
            fac, Ub.reshape(*Ub.shape[:-2], nb, k, mb)
        ).reshape(*Ub.shape[:-2], nb * k, mb)
        S = Db - Wb @ Z
        from .woodbury import lu_inverse
        out["Z"] = Z
        out["Sinv"] = lu_inverse(S, pivot_floor)
    return out


def bordered_block_apply(bfac, f, g):
    """Solve with bordered_block_factor's output.  f: (..., n_pad);
    g: (..., mb).  Returns (x interior-slot order, y)."""
    nb, k, mb = bfac["nb"], bfac["k"], bfac["mb"]
    z0 = block_cr_apply(bfac["cr"],
                        f.reshape(*f.shape[:-1], nb, k, 1)
                        ).reshape(*f.shape[:-1], nb * k)
    if mb == 0:
        return z0, g[..., :0]
    rhs_y = g - jnp.einsum("...mn,...n->...m", bfac["Wb"], z0)
    y = jnp.einsum("...mn,...n->...m", bfac["Sinv"], rhs_y)
    x = z0 - jnp.einsum("...nm,...m->...n", bfac["Z"], y)
    return x, y
