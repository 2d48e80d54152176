"""Bordered-tridiagonal assembly for ladder-structured circuits.

Classifies the engine's precomputed COO stamp entries into the
bordered-tridiagonal layout solved by ops/tridiag.py:

    [ T   U ]   T: (n, n) tridiagonal over the node equations
    [ W   D ]   border: m = #branch equations (V sources / inductors)

A circuit qualifies ("is a ladder") iff every node-node coupling lands on
the tridiagonal band |r - c| <= 1 — true for RC ladders / transmission-line
meshes whose nodes were created in chain order, with any number of
to-ground elements (C, diodes) and a handful of branch elements.  MOSFETs
(3-node couplings) disqualify unless they happen to be band-1.

Classification is static (numpy, at plan build); per-iteration work is a
handful of scatter-adds into length-n vectors — O(n) memory instead of the
dense engine's O(n^2).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# entry targets
_DIAG, _SUB, _SUP, _U, _W, _D, _DROP = range(7)


class BandedPlan:
    """Static classification of COO (rows, cols) into bordered-tridiag
    targets for a circuit with n node equations and m branch equations."""

    def __init__(self, n: int, m: int, rows: np.ndarray, cols: np.ndarray):
        self.n, self.m = n, m
        N = n + m
        r = np.asarray(rows).astype(np.int64)
        c = np.asarray(cols).astype(np.int64)
        tgt = np.full(r.shape, _DROP)
        node_node = (r < n) & (c < n)
        tgt[node_node & (r == c)] = _DIAG
        tgt[node_node & (r == c + 1)] = _SUB
        tgt[node_node & (c == r + 1)] = _SUP
        self.off_band = node_node & (np.abs(r - c) > 1)
        tgt[(r < n) & (c >= n) & (c < N)] = _U
        tgt[(r >= n) & (r < N) & (c < n)] = _W
        tgt[(r >= n) & (r < N) & (c >= n) & (c < N)] = _D
        self.ok = not bool(self.off_band.any())

        def sel(t):
            return np.nonzero(tgt == t)[0]

        self.i_diag, self.i_sub, self.i_sup = sel(_DIAG), sel(_SUB), sel(_SUP)
        self.i_u, self.i_w, self.i_d = sel(_U), sel(_W), sel(_D)
        self.diag_idx = r[self.i_diag]
        self.sub_idx = r[self.i_sub]
        self.sup_idx = r[self.i_sup]
        self.u_idx = (r[self.i_u], c[self.i_u] - n)
        self.w_idx = (r[self.i_w] - n, c[self.i_w])
        self.d_idx = (r[self.i_d] - n, c[self.i_d] - n)

    def scatter(self, vals, base=None):
        """vals: (..., nnz) entry values aligned with the plan's rows/cols.
        Returns dict(sub, diag, sup, U, W, D); adds onto `base` if given."""
        n, m = self.n, self.m
        dtype = vals.dtype
        batch = vals.shape[:-1]
        if base is None:
            out = {
                "diag": jnp.zeros(batch + (n,), dtype),
                "sub": jnp.zeros(batch + (n,), dtype),
                "sup": jnp.zeros(batch + (n,), dtype),
                "U": jnp.zeros(batch + (n, m), dtype),
                "W": jnp.zeros(batch + (m, n), dtype),
                "D": jnp.zeros(batch + (m, m), dtype),
            }
        else:
            out = dict(base)
        out["diag"] = out["diag"].at[..., self.diag_idx].add(vals[..., self.i_diag])
        out["sub"] = out["sub"].at[..., self.sub_idx].add(vals[..., self.i_sub])
        out["sup"] = out["sup"].at[..., self.sup_idx].add(vals[..., self.i_sup])
        if len(self.i_u):
            out["U"] = out["U"].at[..., self.u_idx[0], self.u_idx[1]].add(
                vals[..., self.i_u])
        if len(self.i_w):
            out["W"] = out["W"].at[..., self.w_idx[0], self.w_idx[1]].add(
                vals[..., self.i_w])
        if len(self.i_d):
            out["D"] = out["D"].at[..., self.d_idx[0], self.d_idx[1]].add(
                vals[..., self.i_d])
        return out


def is_ladder(engine) -> bool:
    """Does the circuit's full stamp pattern fit the bordered band?  Checks
    the union of static DC, static transient, and nonlinear patterns."""
    t = engine.topo
    n = t.n_node_eq
    m = t.n_unknowns - n
    from .blockband import union_pattern
    rows, cols = union_pattern(engine)
    return BandedPlan(n, m, rows, cols).ok
