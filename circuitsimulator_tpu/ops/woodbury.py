"""Low-rank (Woodbury) Newton solve for the transient hot loop.

Key structural fact: the per-iteration MOSFET conduction stamp
(element.cpp:289-304) writes +v into row D and -v into row S, where v is the
same linearized row  v = gd*e_D + gg*e_G + gs*e_S  — i.e. each MOSFET is a
RANK-ONE update  (e_D - e_S) v^T  of the MNA matrix, and its RHS
contribution is  -(e_D - e_S) * cst.  Diodes likewise:
(e_P - e_M) * g * (e_P - e_M)^T.  Everything else in the transient system
matrix (R, V/L couplings, C/dt companion conductances, gmin) is CONSTANT for
the whole analysis (fixed dt).

So with G0 factored (inverted) once per transient:

    A   = G0 + U V^T          U : (N, k) static +/-1 pattern, k = nM + nD
    b   = b0 - U c            c : per-device Newton constants
    x   = z - Y (I_k + V^T Y)^{-1} V^T z,   z = G0^{-1} b = z0 - Y c
    Y   = G0^{-1} U           (precomputed once)
    z0  = G0^{-1} b0          (one matvec per timestep)

Per-Newton-iteration cost collapses from the reference's O(N^3) re-factor
(solver.hpp:46-77, ~20k flops at N=31) to O(N*k + k^3) (~1k flops), all of
it dense matvecs and a k x k solve — exactly the shapes the TPU VPU/MXU
like.  The solution is algebraically identical to the full LU solve, so the
Newton trajectory (and hence waveforms) match to floating-point resolution.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .lu import lu_solve, make_lu_solve_auto


def lu_inverse(A, pivot_floor=1e-15):
    """Dense inverse via the pivoted LU solver (columns of I as RHS)."""
    N = A.shape[-1]
    eye = jnp.eye(N, dtype=A.dtype)
    import jax
    cols = jax.vmap(lambda e: lu_solve(A, e, pivot_floor), in_axes=1,
                    out_axes=1)(eye)
    return cols


class WoodburyPlan:
    """Static index plan for the low-rank nonlinear update of one circuit.

    V^T row width W is 3 (MOS/JFET d,g,s; diode p,m,·; BJT c,b,e) unless
    switches are present: the switch Jacobian row couples its node pair to
    a DIFFERENT control pair (p, m, cp, cm) — a width-4 row, so every
    class pads to W = 4 with the dump column (zero coefficient).
    Behavioral B-sources are rank-1 too: the I-form row is
    sum_j grad_j (e_aj - e_bj) over its probe pairs (width 2m) applied at
    (e_p - e_m); the V-form's -f linearization sits on the branch row
    (U column = +e_k) with c = -cst, so W also covers 2*max(probe pairs).
    Decks without switches/B keep the exact width-3 layout (bitwise)."""

    def __init__(self, engine):
        t = engine.topo
        self.engine = engine
        self.N = engine.N
        nM, nD, nQ = len(t.mos_ed), len(t.dio_ep), len(t.bjt_ec)
        nJ = len(t.jf_ed)
        nS = len(t.sw_ep)
        self.nM, self.nD, self.nQ, self.nJ = nM, nD, nQ, nJ
        self.nS = nS
        self.b_sources = list(getattr(engine, "b_sources", []))
        nB = len(self.b_sources)
        self.nB = nB
        # charge cap model (extension): 5 injection rows per MOS
        # (i_d, i_g, i_s, i_sb, i_db), each a rank-1 node-to-ground
        # update with a width-3 coefficient row over (d, g, s)
        self.mcq = bool(getattr(engine, "mos_charge", False))
        nCq = 5 * nM if self.mcq else 0
        self.nCq = nCq
        # rank: 1 per MOS/JFET/diode/switch/B-source, 2 per BJT
        self.k = nM + nJ + nD + 2 * nQ + nS + nB + nCq
        self.W = 4 if nS else 3
        if nB:
            self.W = max(self.W,
                         max(2 * len(bs.pairs) for bs in self.b_sources))
        # U column j = e_pos[j] - e_neg[j] (dump-mapped entries vanish);
        # BJT contributes (e_C - e_E) then (e_B - e_E), interleaved per device
        bjt_pos = np.stack([t.bjt_ec, t.bjt_eb], 1).ravel() if nQ \
            else np.zeros((0,), np.int32)
        bjt_neg = np.stack([t.bjt_ee, t.bjt_ee], 1).ravel() if nQ \
            else np.zeros((0,), np.int32)
        b_pos = np.asarray([bs.k if bs.is_v else bs.ep
                            for bs in self.b_sources], np.int32)
        b_neg = np.asarray([self.N if bs.is_v else bs.em
                            for bs in self.b_sources], np.int32)
        mcq_pos = (np.stack([t.mos_ed, t.mos_eg, t.mos_es,
                             t.mos_es, t.mos_ed], 1).ravel()
                   if nCq else np.zeros((0,), np.int32))
        mcq_neg = np.full((nCq,), self.N, np.int32)
        self.u_pos = np.concatenate([t.mos_ed, t.jf_ed, t.dio_ep,
                                     bjt_pos, t.sw_ep,
                                     b_pos, mcq_pos]).astype(np.int32)
        self.u_neg = np.concatenate([t.mos_es, t.jf_es, t.dio_em,
                                     bjt_neg, t.sw_em,
                                     b_neg, mcq_neg]).astype(np.int32)
        # V^T row j has entries at these columns (width-3 layout; diodes pad
        # the third slot with the dump index)
        self.mos_cols = np.stack([t.mos_ed, t.mos_eg, t.mos_es], 1) \
            if nM else np.zeros((0, 3), np.int32)
        self.jf_cols = np.stack([t.jf_ed, t.jf_eg, t.jf_es], 1) \
            if nJ else np.zeros((0, 3), np.int32)
        self.dio_cols = np.concatenate(
            [np.stack([t.dio_ep, t.dio_em], 1),
             np.full((nD, 1), self.N, np.int32)], axis=1) \
            if nD else np.zeros((0, 3), np.int32)
        cbe = np.stack([t.bjt_ec, t.bjt_eb, t.bjt_ee], 1) if nQ \
            else np.zeros((0, 3), np.int32)
        self.bjt_cols = np.repeat(cbe, 2, axis=0)  # Ic row, Ib row per device
        self.sw_cols = np.stack([t.sw_ep, t.sw_em, t.sw_ecp, t.sw_ecm], 1) \
            if nS else np.zeros((0, 4), np.int32)
        # charge rows read (vd, vg, vs) — all five rows per device
        self.mcq_cols = (np.repeat(
            np.stack([t.mos_ed, t.mos_eg, t.mos_es], 1), 5, axis=0)
            .astype(np.int32) if nCq else np.zeros((0, 3), np.int32))

    def build_U(self, dtype):
        """(N, k) dense U (tiny; built once per compile)."""
        U = jnp.zeros((self.N + 1, self.k), dtype=dtype)
        U = U.at[self.u_pos, jnp.arange(self.k)].add(1.0)
        U = U.at[self.u_neg, jnp.arange(self.k)].add(-1.0)
        return U[: self.N]

    def col_idx(self) -> np.ndarray:
        """(k, W) column indices for the V^T coefficient rows."""
        W = self.W
        cols3 = np.concatenate([self.mos_cols, self.jf_cols, self.dio_cols,
                                self.bjt_cols], axis=0).astype(np.int32)
        if W == 3 and not self.nB and not self.nCq:
            return cols3

        def padW(arr):
            if arr.shape[1] == W:
                return arr
            pad = np.full((arr.shape[0], W - arr.shape[1]), self.N,
                          np.int32)
            return np.concatenate([arr, pad], axis=1)

        b_rows = [np.asarray(bs.pairs, np.int32).reshape(1, -1)
                  for bs in self.b_sources]
        blocks = [padW(cols3)]
        if self.nS:
            blocks.append(padW(self.sw_cols.astype(np.int32)))
        blocks += [padW(r) for r in b_rows]
        if self.nCq:
            blocks.append(padW(self.mcq_cols))
        return np.concatenate(blocks, axis=0)


class WoodburySolver:
    """Per-transient factorization state + the per-iteration solve."""

    def __init__(self, engine, params, G0=None, solve_op=None):
        """G0: (..., N, N) static transient system matrix
        (engine.tran_static_G sliced to the real unknowns) — factored
        to a dense inverse.  Alternatively pass solve_op(B) applying
        G0^{-1} to (..., N, q) multi-RHS WITHOUT a dense inverse (e.g.
        the pre-factored block-CR of ops/blockcr.bordered_block_factor
        for large banded circuits, where an N x N inverse would be
        N^2 memory)."""
        self.engine = engine
        self.plan = WoodburyPlan(engine)
        opts = engine.opts
        N = engine.N
        U = self.plan.build_U(engine.dtype)
        if solve_op is None:
            self.G0inv = lu_inverse(G0, opts.lu_pivot_floor)
            self._solve_op = None
            self.Y = self.G0inv @ U                   # (..., N, k)
        else:
            self.G0inv = None
            self._solve_op = solve_op
            self.Y = solve_op(U)                      # (..., N, k)
        # static gathers of Y rows at each device's column indices
        cols = self.plan.col_idx()                    # (k, 3)
        pad = jnp.zeros(self.Y.shape[:-2] + (1, self.plan.k),
                        dtype=self.Y.dtype)
        Y_ext = jnp.concatenate([self.Y, pad], axis=-2)   # dump row = 0
        self.Y_cols = Y_ext[..., cols, :]             # (..., k, 3, k)
        self.eye_k = jnp.eye(self.plan.k, dtype=engine.dtype)
        self.cols = cols
        # one-hot selection matrices: per-iteration terminal-voltage reads
        # become tiny matmuls instead of gathers (slow inside TPU loops).
        # Rows for grounded terminals (dump index) are all-zero, which
        # reproduces the x_ext ground convention.
        t = engine.topo
        nM, nD = self.plan.nM, self.plan.nD

        def onehot(idx_list):
            M = np.zeros((N, len(idx_list)))
            for j, r in enumerate(idx_list):
                if r < N:
                    M[r, j] = 1.0
            return jnp.asarray(M, engine.dtype)

        mos_terms = np.stack([t.mos_ed, t.mos_eg, t.mos_es], 1).ravel() \
            if nM else np.zeros((0,), np.int32)
        nJ = self.plan.nJ
        jf_terms = np.stack([t.jf_ed, t.jf_eg, t.jf_es], 1).ravel() \
            if nJ else np.zeros((0,), np.int32)
        dio_terms = np.stack([t.dio_ep, t.dio_em], 1).ravel() \
            if nD else np.zeros((0,), np.int32)
        nQ = self.plan.nQ
        bjt_terms = np.stack([t.bjt_ec, t.bjt_eb, t.bjt_ee], 1).ravel() \
            if nQ else np.zeros((0,), np.int32)
        nS = self.plan.nS
        sw_terms = np.stack([t.sw_ep, t.sw_em, t.sw_ecp, t.sw_ecm],
                            1).ravel() if nS else np.zeros((0,), np.int32)
        self.M_mos = onehot(mos_terms)                # (N, 3nM)
        self.M_jf = onehot(jf_terms)                  # (N, 3nJ)
        self.M_dio = onehot(dio_terms)                # (N, 2nD)
        self.M_bjt = onehot(bjt_terms)                # (N, 3nQ)
        self.M_sw = onehot(sw_terms)                  # (N, 4nS)
        self.M_cols = onehot(cols.ravel())            # (N, W*k)
        # behavioral sources: probe-pair reads + value_and_grad of each
        # compiled expression (mirror of Engine._nl_vals b segment)
        if self.plan.nB:
            import jax as _jax
            b_terms = np.concatenate(
                [np.asarray(bs.pairs, np.int64).ravel()
                 for bs in self.plan.b_sources])
            self.M_b = onehot(b_terms)                # (N, sum 2m_j)
            self._b_vg = [_jax.value_and_grad(bs.fn)
                          for bs in self.plan.b_sources]
        # k x k solver whose VMAPPED form routes the whole Monte-Carlo
        # batch to the VMEM-resident Pallas LU kernel on TPU (profiled:
        # under plain vmap this solve re-streams S through HBM every
        # elimination column — the dominant cost of the whole timestep)
        self._ksolve = make_lu_solve_auto(opts.lu_pivot_floor)

    def z0(self, b0):
        """G0^{-1} b0 — once per timestep (b0 = sources + history)."""
        if self._solve_op is not None:
            return self._solve_op(b0[..., None])[..., 0]
        return jnp.einsum("...ij,...j->...i", self.G0inv, b0)

    def nl_coeffs(self, params, x, t=0.0, qex=None):
        """Per-device V^T values and Newton constants at x, all terminal
        voltages read via one-hot matmuls (no gathers in the hot loop).
        `t` only matters for time-dependent behavioral expressions.
        qex: (qprev, inv_dt) for the charge cap model's injection rows."""
        from ..models.mosfet import mos_linearize as _mos
        from ..models.diode import diode_linearize as _dio
        plan = self.plan
        parts_v, parts_c = [], []

        def padW(v3):
            """Coefficient rows padded to the plan width (the padded
            slots map to the dump column — zero coefficient)."""
            short = plan.W - v3.shape[-1]
            if short == 0:
                return v3
            return jnp.concatenate(
                [v3, jnp.zeros(v3.shape[:-1] + (short,), v3.dtype)],
                axis=-1)
        if plan.nM:
            vm = jnp.einsum("...n,nj->...j", x, self.M_mos)
            vm = vm.reshape(*vm.shape[:-1], plan.nM, 3)
            gd, gg, gs, cst = _mos(
                params["mos_vth"], params["mos_k"], params["mos_lam"],
                params["mos_p"], vm[..., 0], vm[..., 1], vm[..., 2],
                self.engine.opts.mos_off_gds,
                self.engine.opts.mos_reverse_region,
                gamma=(params["mos_gamma"]
                       if self.engine.mos_body else None),
                phi=(params["mos_phi"]
                     if self.engine.mos_body else None))
            parts_v.append(padW(jnp.stack([gd, gg, gs], axis=-1)))
            parts_c.append(cst)
        if plan.nJ:
            vj = jnp.einsum("...n,nj->...j", x, self.M_jf)
            vj = vj.reshape(*vj.shape[:-1], plan.nJ, 3)
            gd, gg, gs, cst = _mos(
                params["jf_vto"], 2.0 * params["jf_beta"],
                params["jf_lam"], params["jf_p"],
                vj[..., 0], vj[..., 1], vj[..., 2],
                self.engine.opts.mos_off_gds,
                self.engine.opts.mos_reverse_region)
            parts_v.append(padW(jnp.stack([gd, gg, gs], axis=-1)))
            parts_c.append(cst)
        if plan.nD:
            vd2 = jnp.einsum("...n,nj->...j", x, self.M_dio)
            vd2 = vd2.reshape(*vd2.shape[:-1], plan.nD, 2)
            g, cst = _dio(params["dio_is"], params["dio_n"],
                          vd2[..., 0], vd2[..., 1],
                          vt=jnp.expand_dims(params["vt_thermal"], -1),
                          bv=(params["dio_bv"]
                              if self.engine.dio_bv else None),
                          ibv=(params["dio_ibv"]
                               if self.engine.dio_bv else None))
            zeros = jnp.zeros_like(g)
            parts_v.append(padW(jnp.stack([g, -g, zeros], axis=-1)))
            parts_c.append(cst)
        if plan.nQ:
            from ..models.bjt import bjt_linearize as _bjt
            vq = jnp.einsum("...n,nj->...j", x, self.M_bjt)
            vq = vq.reshape(*vq.shape[:-1], plan.nQ, 3)
            rc, rb = _bjt(params["bjt_is"], params["bjt_bf"],
                          params["bjt_br"], params["bjt_p"],
                          vq[..., 0], vq[..., 1], vq[..., 2],
                          vt=jnp.expand_dims(params["vt_thermal"], -1),
                          vaf=(params["bjt_vaf"]
                               if self.engine.bjt_early else None))
            # interleave (Ic row, Ib row) per device: (..., 2nQ, 3) / (..., 2nQ)
            vrows = jnp.stack(
                [jnp.stack(rc[:3], axis=-1), jnp.stack(rb[:3], axis=-1)],
                axis=-2).reshape(*vq.shape[:-2], 2 * plan.nQ, 3)
            crows = jnp.stack([rc[3], rb[3]],
                              axis=-1).reshape(*vq.shape[:-2], 2 * plan.nQ)
            parts_v.append(padW(vrows))
            parts_c.append(crows)
        if plan.nS:
            # smooth-transition switch (models/switch.py): i = G(vc)*vd,
            # width-4 row [gd, -gd, gc, -gc] at columns (p, m, cp, cm)
            from ..models.switch import switch_conductance as _swc
            vsw = jnp.einsum("...n,nj->...j", x, self.M_sw)
            vsw = vsw.reshape(*vsw.shape[:-1], plan.nS, 4)
            vd = vsw[..., 0] - vsw[..., 1]
            vc = vsw[..., 2] - vsw[..., 3]
            G, dG = _swc(params["sw_ron"], params["sw_roff"],
                         params["sw_vt"], params["sw_vh"], vc)
            gd = G
            gcc = dG * vd
            i0 = G * vd
            cst = i0 - gd * vd - gcc * vc
            parts_v.append(padW(jnp.stack([gd, -gd, gcc, -gcc], axis=-1)))
            parts_c.append(cst)
        if plan.nB:
            # behavioral sources: each is one rank-1 row over its probe
            # pairs.  I-form: row [g, -g, ...] at (a, b, ...), c = cst;
            # V-form (-f on the branch row, U column = +e_k):
            # row [-g, g, ...], c = -cst (Engine._nl_vals sign convention)
            import jax as _jax
            xb = jnp.einsum("...n,nj->...j", x, self.M_b)
            off = 0
            for bs, vg in zip(plan.b_sources, self._b_vg):
                m = len(bs.pairs)
                seg = xb[..., off:off + 2 * m]
                off += 2 * m
                vals = seg[..., 0::2] - seg[..., 1::2]
                consts = params["b_consts"][
                    ..., bs.const_off:bs.const_off + bs.n_consts]
                f_vg = vg
                for _ in range(vals.ndim - 1):
                    f_vg = _jax.vmap(f_vg, in_axes=(0, None, 0))
                e0, grads = f_vg(vals, jnp.asarray(t, x.dtype), consts)
                cst = e0 - jnp.sum(grads * vals, axis=-1)
                if bs.is_v:
                    row = jnp.stack([-grads, grads], axis=-1)
                    cb = -cst
                else:
                    row = jnp.stack([grads, -grads], axis=-1)
                    cb = cst
                row = row.reshape(*grads.shape[:-1], 2 * m)
                if 2 * m < plan.W:
                    row = jnp.concatenate(
                        [row, jnp.zeros(row.shape[:-1]
                                        + (plan.W - 2 * m,), row.dtype)],
                        axis=-1)
                parts_v.append(row[..., None, :])
                parts_c.append(cb[..., None])
        if plan.nCq:
            # charge cap model: reuse the MOS terminal reads (vm)
            assert qex is not None, "charge model needs qex=(qprev, 1/dt)"
            gq, cq = self.engine.mosq_linearize(params, vm, *qex)
            rows = gq.reshape(*gq.shape[:-3], plan.nCq, 3)
            parts_v.append(padW(rows))
            parts_c.append(cq.reshape(*cq.shape[:-2], plan.nCq))
        vcoef = jnp.concatenate(parts_v, axis=-2)
        c = jnp.concatenate(parts_c, axis=-1)
        return vcoef, c

    def solve(self, params, x, z0, t=0.0, qex=None):
        """One Newton linear solve: returns x_raw solving A(x) x_raw = b(x).
        `t` only matters for time-dependent behavioral expressions.
        qex: (qprev, inv_dt) for the charge cap model."""
        plan = self.plan
        if plan.k == 0:
            return z0
        vcoef, c = self.nl_coeffs(params, x, t, qex)   # (...,k,W), (...,k)
        z = z0 - jnp.einsum("...nk,...k->...n", self.Y, c)
        # S = I + V^T Y : S[j,l] = sum_s vcoef[j,s] * Y[cols[j,s], l]
        S = self.eye_k + jnp.einsum("...js,...jsl->...jl", vcoef, self.Y_cols)
        # V^T z, with z at each device's columns read via one-hot matmul
        zc = jnp.einsum("...n,nj->...j", z, self.M_cols)
        zc = zc.reshape(*zc.shape[:-1], plan.k, plan.W)
        vz = jnp.einsum("...js,...js->...j", vcoef, zc)
        w = self._ksolve(S, vz)
        return z - jnp.einsum("...nk,...k->...n", self.Y, w)
