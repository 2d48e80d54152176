"""Giant-circuit multi-chip solve: ONE circuit's MNA system domain-
decomposed across the device mesh (SURVEY.md §2 stretch axis — the
reference has no distributed anything; its dense LU, solver.hpp:30-80,
is single-threaded).

The block-tridiagonal interior produced by ops/blockband.py (or a plain
ladder promoted to k=1 blocks) is split into D contiguous partitions, one
per device, and solved with the SPIKE algorithm expressed in shard_map:

1. locally (zero communication) each device solves its partition
       A_p [G_p | V_p | W_p] = [F_p | C_hat_p | B_hat_p]
   by block cyclic reduction (ops/blockcr.py), where C_hat/B_hat carry the
   partition-coupling blocks L_p[0] / U_p[-1];
2. only the spike TIPS (first/last block rows of G/V/W — O(k^2) data) ride
   an all_gather over ICI;
3. the reduced interface system — block-tridiagonal with D blocks of size
   2k, unknowns u_p = [x_p^first; x_p^last] —
       u_p + [[0, V_p^f],[0, V_p^l]] u_{p-1}
           + [[W_p^f, 0],[W_p^l, 0]] u_{p+1} = [G_p^f; G_p^l]
   is solved redundantly on every device (it is tiny);
4. each device applies its local correction
       x_p = G_p - V_p b_{p-1} - W_p t_{p+1}.

Communication per solve: one all_gather of ~6 k*k*(q+2k)/… tips — O(D k^2)
— versus O(nb k^2) state that stays resident per device.  The bordered
(V-source / hub) Schur complement rides the same solve as mb extra RHS,
with its mb x mb reduction psum-assembled across the mesh.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.blockcr import block_cr_solve

PART_AXIS = "part"


def _pad_blocks_to(L, D, U, F, nb_pad: int):
    """Append decoupled identity blocks so the block count divides D."""
    nb = D.shape[-3]
    if nb_pad == nb:
        return L, D, U, F
    pad = nb_pad - nb
    k = D.shape[-1]

    def zpad(X):
        return jnp.concatenate(
            [X, jnp.zeros(X.shape[:-3] + (pad,) + X.shape[-2:], X.dtype)],
            axis=-3)

    eye = jnp.broadcast_to(jnp.eye(k, dtype=D.dtype),
                           D.shape[:-3] + (pad, k, k))
    return zpad(L), jnp.concatenate([D, eye], axis=-3), zpad(U), zpad(F)


def _shift_from(x, d: int, Dn: int):
    """Value of x on the device d positions BELOW (index p-d), zeros
    where p-d < 0 (ppermute zero-fills missing edges)."""
    if d >= Dn:
        return jnp.zeros_like(x)
    perm = [(j, j + d) for j in range(Dn - d)]
    return lax.ppermute(x, PART_AXIS, perm)


def _shift_to(x, d: int, Dn: int):
    """Value of x on the device d positions ABOVE (index p+d), zeros
    where p+d >= Dn."""
    if d >= Dn:
        return jnp.zeros_like(x)
    perm = [(j, j - d) for j in range(d, Dn)]
    return lax.ppermute(x, PART_AXIS, perm)


def _pcr_one_block(sub, diag, sup, F, Dn: int, pivot_floor: float):
    """Distributed block-tridiagonal solve with ONE block row per device
    (parallel cyclic reduction over ppermute): row p couples p-1/p+1
    via sub/sup; after ceil(log2(Dn)) halving levels every row is
    decoupled and solves locally.

    This replaces the old redundant reduced-system solve: gathering all
    D interface rows and running block-CR on EVERY device cost
    O(D^2 (2k)^3) total work — the dominant weak-scaling overhead
    (measured 2.2x total work at D=8, bench_spike_scaling.py).  PCR is
    O(D log D (2k)^3) total, communicates only with distance-2^l
    neighbors, and needs no all_gather at all."""
    m = diag.shape[-1]
    eye = jnp.eye(m, dtype=diag.dtype)
    p_idx = lax.axis_index(PART_AXIS)
    d = 1
    while d < Dn:
        sub_m = _shift_from(sub, d, Dn)
        diag_m = _shift_from(diag, d, Dn)
        sup_m = _shift_from(sup, d, Dn)
        F_m = _shift_from(F, d, Dn)
        sub_p = _shift_to(sub, d, Dn)
        diag_p = _shift_to(diag, d, Dn)
        sup_p = _shift_to(sup, d, Dn)
        F_p = _shift_to(F, d, Dn)
        # virtual identity rows outside the range (zero-filled ppermute
        # edges): D=I so the inverse is well-defined; L/U/F stay zero
        diag_m = jnp.where(p_idx >= d, diag_m, eye)
        diag_p = jnp.where(p_idx < Dn - d, diag_p, eye)
        # alpha = -sub @ inv(diag_m), beta = -sup @ inv(diag_p)
        alpha = -jnp.linalg.solve(
            jnp.swapaxes(diag_m, -1, -2), jnp.swapaxes(sub, -1, -2))
        alpha = jnp.swapaxes(alpha, -1, -2)
        beta = -jnp.linalg.solve(
            jnp.swapaxes(diag_p, -1, -2), jnp.swapaxes(sup, -1, -2))
        beta = jnp.swapaxes(beta, -1, -2)
        diag = diag + alpha @ sup_m + beta @ sub_p
        F = F + alpha @ F_m + beta @ F_p
        sub = alpha @ sub_m
        sup = beta @ sup_p
        d *= 2
    from ..ops.lu import lu_solve
    return jax.vmap(lambda b: lu_solve(diag, b, pivot_floor),
                    in_axes=-1, out_axes=-1)(F)


def _spike_local(Lp, Dp, Up, Fp, Dn: int, pivot_floor: float = 1e-15):
    """Per-device stage 1+2+3+4.  Shapes: Lp/Dp/Up (np, k, k),
    Fp (np, k, q).  Runs inside shard_map over PART_AXIS."""
    k = Dp.shape[-1]
    q = Fp.shape[-1]
    npb = Dp.shape[0]
    Cp, Bp = Lp[0], Up[-1]
    Lloc = Lp.at[0].set(0.0)
    Uloc = Up.at[-1].set(0.0)
    Vrhs = jnp.zeros((npb, k, k), Dp.dtype).at[0].set(Cp)
    Wrhs = jnp.zeros((npb, k, k), Dp.dtype).at[-1].set(Bp)
    rhs = jnp.concatenate([Fp, Vrhs, Wrhs], axis=-1)
    sols = block_cr_solve(Lloc, Dp, Uloc, rhs)       # (np, k, q+2k)
    G, V, W = sols[..., :q], sols[..., q:q + k], sols[..., q + k:]

    # distributed reduced interface system: THIS device's block row
    # u_p = [t_p; b_p] with identity diagonal,
    #   sub_p = [[0, Vf], [0, Vl]], sup_p = [[Wf, 0], [Wl, 0]]
    # (tips are local — no all_gather; PCR exchanges only neighbors)
    z = jnp.zeros((k, k), Dp.dtype)
    subI = jnp.concatenate([
        jnp.concatenate([z, V[0]], axis=-1),
        jnp.concatenate([z, V[-1]], axis=-1)], axis=-2)   # (2k, 2k)
    supI = jnp.concatenate([
        jnp.concatenate([W[0], z], axis=-1),
        jnp.concatenate([W[-1], z], axis=-1)], axis=-2)
    diagI = jnp.eye(2 * k, dtype=Dp.dtype)
    FI = jnp.concatenate([G[0], G[-1]], axis=-2)          # (2k, q)
    u = _pcr_one_block(subI, diagI, supI, FI, Dn, pivot_floor)
    t_loc, b_loc = u[:k, :], u[k:, :]

    # local correction: x_p = G_p - V_p b_{p-1} - W_p t_{p+1}
    b_prev = _shift_from(b_loc, 1, Dn)
    t_next = _shift_to(t_loc, 1, Dn)
    return G - V @ b_prev - W @ t_next


def spike_block_solve(mesh: Mesh, L, D, U, F):
    """Distributed block-tridiagonal solve: L/D/U (nb, k, k), F (nb, k, q),
    sharded over `mesh`'s single axis on the block dimension.  Returns X
    (nb, k, q) with the same sharding."""
    Dn = mesh.devices.size
    nb = D.shape[-3]
    nb_pad = -(-nb // Dn) * Dn
    L, D, U, F = _pad_blocks_to(L, D, U, F, nb_pad)
    spec = P(PART_AXIS)
    fn = jax.shard_map(partial(_spike_local, Dn=Dn), mesh=mesh,
                       in_specs=(spec, spec, spec, spec), out_specs=spec)
    return fn(L, D, U, F)[..., :nb, :, :]


def bordered_spike_solve(mesh: Mesh, L, D, U, Ub, Wb, Db, f, g,
                         pivot_floor: float = 1e-15):
    """Distributed solve of [[T, Ub], [Wb, Db]] [x; y] = [f; g] with T
    block-tridiagonal sharded over the mesh.  The mb border right-hand
    sides ride the same SPIKE solve; the mb x mb Schur system is assembled
    with one more (replicated-output) contraction and solved everywhere.

    f: (n_pad,), Ub: (n_pad, mb), Wb: (mb, n_pad), Db/g replicated.
    Returns (x (n_pad,), y (mb,))."""
    nb, k = D.shape[-3], D.shape[-1]
    mb = Db.shape[-1]
    n_orig = nb * k
    # pad so the partition axis divides the mesh (decoupled identity rows)
    Dn = mesh.devices.size
    nb_pad = -(-nb // Dn) * Dn
    rhs = jnp.concatenate([f[:, None], Ub], axis=-1)   # (nb*k, mb+1)
    F = rhs.reshape(nb, k, mb + 1)
    L, D, U, F = _pad_blocks_to(L, D, U, F, nb_pad)
    nb = nb_pad
    Wb = jnp.concatenate(
        [Wb, jnp.zeros((mb, nb * k - n_orig), Wb.dtype)], axis=-1)
    sols = spike_block_solve(mesh, L, D, U, F)         # (nb, k, mb+1)
    sols_flat = sols.reshape(nb * k, mb + 1)
    z0, Z = sols_flat[:, 0], sols_flat[:, 1:]
    if mb == 0:
        return z0[:n_orig], g[:0]

    # S = Db - Wb @ Z and Wb @ z0: contract the sharded n axis -> psum
    def _schur(Wb_p, Z_p, z0_p):
        S_part = Wb_p @ Z_p                            # (mb, mb)
        r_part = Wb_p @ z0_p                           # (mb,)
        return (lax.psum(S_part, PART_AXIS),
                lax.psum(r_part, PART_AXIS))

    spec_n = P(None, PART_AXIS)
    Z2 = Z.reshape(nb, k, mb)
    S_sum, r_sum = jax.shard_map(
        lambda W_p, Z_p, z_p: _schur(W_p.reshape(mb, -1),
                                     Z_p.reshape(-1, mb),
                                     z_p.reshape(-1)),
        mesh=mesh,
        in_specs=(spec_n, P(PART_AXIS), P(PART_AXIS)),
        out_specs=(P(), P()))(Wb.reshape(mb, nb, k), Z2,
                              z0.reshape(nb, k))
    from ..ops.lu import lu_solve
    S = Db - S_sum
    y = lu_solve(S, g - r_sum, pivot_floor)
    x = z0 - Z @ y
    return x[:n_orig], y
