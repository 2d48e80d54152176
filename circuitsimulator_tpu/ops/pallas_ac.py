"""Pallas TPU kernel: fused batched AC frequency sweep.

The batched AC Monte-Carlo sweep (analysis/ac.py) was stuck at ~6.3k
solves/s at B=4096 x F=64 across two rounds of attacks (HARDWARE_CHECKLIST
items 11/13): the XLA path materializes a real 2N x 2N block system
[[G, -wB], [wB, G]] per (lane, freq) in HBM and eliminates it in 2N
dependent fori_loop steps, each streaming the whole (lanes, 2N, 2N) tile.

This kernel attacks all three bounds at once:

- **fused assembly**: each lane's frequency-independent G and
  unit-omega susceptance B1 (every reactive entry is linear in omega for
  T-line-free decks — see analysis/ac._make_solve_sweep) are read from
  HBM once per lane block and the per-frequency system A(w) = G + j w B1
  is formed directly in VMEM; no per-(lane, freq) matrix ever exists in
  HBM.
- **complex N x N elimination** instead of real 2N x 2N: half the
  dependent steps (N vs 2N) and half the real multiplies
  (4N^3/3 vs 8N^3/3).
- **VMEM residency, lane-minor layout** (the ops/pallas_lu.py pattern):
  (N, N, TB) blocks with the Monte-Carlo lane axis on the 128-wide VPU
  lane dimension; per-lane partial pivoting by |.|^2 magnitude with
  masked one-hot row swaps, no gathers.

Grid = (lane_blocks, F) with the frequency axis innermost: consecutive
grid steps share the lane-block index, so Pallas's pipeline revisiting
skips the G/B1/rhs re-fetch and only the (1, N, TB) result block moves
per step.

Numerics: same contract as ops/lu.py (reference solver.hpp:58-61 fail
semantics) — any column whose best pivot magnitude falls below
pivot_floor zeroes that lane's solution; pivoting is by complex
magnitude, so results agree with the real-2N path to dtype resolution
(pivot ORDER may differ; both are valid pivoted factorizations).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_MAX = 64


def _ac_kernel(om_ref, g_ref, b1_ref, br_ref, bi_ref, xr_ref, xi_ref, *,
               n: int, pivot_floor: float):
    w = om_ref[pl.program_id(1)]
    G = g_ref[:]                     # (n, n, TB)
    B1 = b1_ref[:]
    TB = G.shape[-1]
    dtype = G.dtype
    floor2 = jnp.asarray(float(pivot_floor) ** 2, dtype)

    Ar = G
    Ai = w.astype(dtype) * B1
    br = br_ref[:]                   # (n, TB)
    bi = bi_ref[:]

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, TB), 0)
    ok = jnp.ones((TB,), dtype=jnp.bool_)

    for k in range(n):
        cr = Ar[:, k, :]
        ci = Ai[:, k, :]
        mag = jnp.where(row_ids >= k, cr * cr + ci * ci,
                        jnp.asarray(-1.0, dtype))
        p = jax.lax.argmax(mag, 0, jnp.int32)              # (TB,)
        ok = ok & (jnp.max(mag, axis=0) >= floor2)
        onehot = (row_ids == p[None, :]).astype(dtype)     # (n, TB)
        is_p = (row_ids == p[None, :])[:, None, :]
        is_k = (row_ids == k)[:, None, :]
        # swap rows k <-> p (masked reduction extract, where-select write)
        rowp_r = jnp.sum(Ar * onehot[:, None, :], axis=0)  # (n, TB)
        rowp_i = jnp.sum(Ai * onehot[:, None, :], axis=0)
        rowk_r = Ar[k, :, :]
        rowk_i = Ai[k, :, :]
        Ar = jnp.where(is_p, rowk_r[None], Ar)
        Ar = jnp.where(is_k, rowp_r[None], Ar)
        Ai = jnp.where(is_p, rowk_i[None], Ai)
        Ai = jnp.where(is_k, rowp_i[None], Ai)
        bp_r = jnp.sum(br * onehot, axis=0)
        bp_i = jnp.sum(bi * onehot, axis=0)
        bk_r = br[k, :]
        bk_i = bi[k, :]
        swap = row_ids == p[None, :]
        keep = row_ids == k
        br = jnp.where(swap, bk_r[None], br)
        br = jnp.where(keep, bp_r[None], br)
        bi = jnp.where(swap, bk_i[None], bi)
        bi = jnp.where(keep, bp_i[None], bi)
        # complex factors f = A[:, k] / pivot for rows > k
        pr = rowp_r[k]                                     # (TB,)
        pi = rowp_i[k]
        den = pr * pr + pi * pi
        safe = jnp.where(den != 0.0, den, 1.0)
        below = row_ids > k
        fr = jnp.where(below, (Ar[:, k, :] * pr + Ai[:, k, :] * pi) / safe,
                       0.0)
        fi = jnp.where(below, (Ai[:, k, :] * pr - Ar[:, k, :] * pi) / safe,
                       0.0)
        # complex rank-1 update A -= f (outer) A[k], b -= f * b[k]
        akr = Ar[k, :, :][None]
        aki = Ai[k, :, :][None]
        Ar = Ar - (fr[:, None, :] * akr - fi[:, None, :] * aki)
        Ai = Ai - (fr[:, None, :] * aki + fi[:, None, :] * akr)
        br = br - (fr * bp_r[None] - fi * bp_i[None])
        bi = bi - (fr * bp_i[None] + fi * bp_r[None])

    xr = jnp.zeros_like(br)
    xi = jnp.zeros_like(bi)
    for j in range(n - 1, -1, -1):
        sr = br[j, :] - jnp.sum(Ar[j] * xr - Ai[j] * xi, axis=0)
        si = bi[j, :] - jnp.sum(Ar[j] * xi + Ai[j] * xr, axis=0)
        dr = Ar[j, j, :]
        di = Ai[j, j, :]
        den = dr * dr + di * di
        safe = jnp.where(den != 0.0, den, 1.0)
        good = den >= floor2
        xj_r = jnp.where(good, (sr * dr + si * di) / safe, 0.0)
        xj_i = jnp.where(good, (si * dr - sr * di) / safe, 0.0)
        keep = row_ids == j
        xr = jnp.where(keep, xj_r[None], xr)
        xi = jnp.where(keep, xj_i[None], xi)

    xr_ref[0] = jnp.where(ok[None, :], xr, 0.0)
    xi_ref[0] = jnp.where(ok[None, :], xi, 0.0)


def lane_block_for(n: int) -> int:
    """VMEM budget: ~5 live (n, n, TB) f32 arrays (G, B1, Ar, Ai +
    pipeline double-buffering) must fit the ~16 MB scoped VMEM."""
    return 128 if n <= 40 else 64


def ac_sweep_pallas(G, B1, br, bi, omegas, pivot_floor: float = 1e-15,
                    lane_block: int | None = None,
                    interpret: bool = False):
    """Fused batched AC sweep.

    G, B1: (B, N, N) per-lane conductance / unit-omega susceptance;
    br, bi: (B, N) RHS (frequency-independent); omegas: (F,).
    Returns (xr, xi) each (B, F, N): solutions of
    (G + j w B1)(xr + j xi) = br + j bi for every (lane, frequency).
    """
    B, n, _ = G.shape
    F = int(omegas.shape[0])
    if n > N_MAX:
        raise ValueError(f"ac_sweep_pallas: N={n} > {N_MAX}")
    tb = lane_block or lane_block_for(n)
    tb = min(tb, max(B, 1))
    pad = (-B) % tb
    if pad:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=G.dtype), (pad, n, n))
        G = jnp.concatenate([G, eye], axis=0)
        B1 = jnp.concatenate([B1, jnp.zeros_like(eye)], axis=0)
        br = jnp.concatenate([br, jnp.zeros((pad, n), br.dtype)], axis=0)
        bi = jnp.concatenate([bi, jnp.zeros((pad, n), bi.dtype)], axis=0)
    Bp = G.shape[0]
    Gt = jnp.moveaxis(G, 0, -1)        # (n, n, Bp)
    B1t = jnp.moveaxis(B1, 0, -1)
    brt = jnp.moveaxis(br, 0, -1)      # (n, Bp)
    bit = jnp.moveaxis(bi, 0, -1)
    om = jnp.asarray(omegas, G.dtype)

    kernel = functools.partial(_ac_kernel, n=n,
                               pivot_floor=float(pivot_floor))
    grid = (Bp // tb, F)
    # jnp.int32(0) INSIDE each lambda: index maps may not capture traced
    # constants, and Python ints trace as i64 under jax_enable_x64
    xr, xi = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((F, n, Bp), G.dtype),
                   jax.ShapeDtypeStruct((F, n, Bp), G.dtype)),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # omegas, whole array
            pl.BlockSpec((n, n, tb),
                         lambda i, f: (jnp.int32(0), jnp.int32(0), i)),
            pl.BlockSpec((n, n, tb),
                         lambda i, f: (jnp.int32(0), jnp.int32(0), i)),
            pl.BlockSpec((n, tb), lambda i, f: (jnp.int32(0), i)),
            pl.BlockSpec((n, tb), lambda i, f: (jnp.int32(0), i)),
        ],
        out_specs=(pl.BlockSpec((1, n, tb),
                                lambda i, f: (f, jnp.int32(0), i)),
                   pl.BlockSpec((1, n, tb),
                                lambda i, f: (f, jnp.int32(0), i))),
        interpret=interpret,
    )(om, Gt, B1t, brt, bit)
    xr = jnp.moveaxis(xr, -1, 0)[:B]   # (B, F, n)
    xi = jnp.moveaxis(xi, -1, 0)[:B]
    return xr, xi
