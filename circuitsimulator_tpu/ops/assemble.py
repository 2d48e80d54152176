"""MNA assembly as precomputed scatter-adds.

The reference re-stamps every element through virtual dispatch on every
Newton iteration (src/dcanalysis.cpp:126-128, src/tanalisis.cpp:269-353).
Here the stamp *pattern* (row/col index lists) is precomputed per circuit at
lowering time and only the *values* are recomputed — and the values are split
by how often they change:

- static-per-analysis:   R, V/L ±1 couplings, C & MOS-junction-cap
                         conductances (C/dt), gmin diagonal        -> G_static
- static-per-timestep:   source values at time t, C/L/MOS-cap
                         history currents                          -> I_static
- per-Newton-iteration:  MOSFET conduction linearization, diodes   -> scatter
                         onto G_static/I_static

Ground is the dump slot N of an (N+1)-sized system (see ir/lower.py), so no
stamp needs a branch.  Everything is pure jnp and vmap-safe: `params`, `x`
and state carry the batch dimensions; index patterns are shared constants.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ir.lower import LoweredCircuit
from ..models import sources as srcmod
from ..models.mosfet import mos_stamp_vals
from ..models.diode import diode_stamp_vals
from ..utils.options import SolverOptions


def _two_terminal_pattern(a: np.ndarray, b: np.ndarray):
    """Conductance-like stamp pattern between node eqs a and b:
    rows [a,b,a,b], cols [a,b,b,a], value pattern [+g,+g,-g,-g]."""
    rows = np.stack([a, b, a, b], axis=1).ravel()
    cols = np.stack([a, b, b, a], axis=1).ravel()
    return rows.astype(np.int32), cols.astype(np.int32)


def _two_terminal_vals(g):
    return jnp.stack([g, g, -g, -g], axis=-1).reshape(*g.shape[:-1], -1)


def _branch_pattern(ep: np.ndarray, em: np.ndarray, k: np.ndarray):
    """V-source/inductor ±1 coupling pattern (element.cpp:115-121, 173-177):
    rows [ep,em,k,k], cols [k,k,ep,em], values [+1,-1,+1,-1]."""
    rows = np.stack([ep, em, k, k], axis=1).ravel()
    cols = np.stack([k, k, ep, em], axis=1).ravel()
    return rows.astype(np.int32), cols.astype(np.int32)


class Engine:
    """Per-circuit assembly engine: holds the static stamp patterns."""

    def __init__(self, low: LoweredCircuit, opts: SolverOptions):
        t = self.topo = low.topo
        self.opts = opts
        self.dtype = opts.dtype
        N = t.n_unknowns
        self.N = N
        nM = len(t.mos_ed)

        # ---- DC G pattern ----
        self.res_rows, self.res_cols = _two_terminal_pattern(t.res_e1, t.res_e2)
        vs_rows, vs_cols = _branch_pattern(t.vs_ep, t.vs_em, t.vs_k)
        ind_dc_rows, ind_dc_cols = _branch_pattern(t.ind_ep, t.ind_em, t.ind_k)
        self.dc_const_rows = np.concatenate([vs_rows, ind_dc_rows])
        self.dc_const_cols = np.concatenate([vs_cols, ind_dc_cols])
        npat = len(t.vs_ep) + len(t.ind_ep)
        self.dc_const_vals = jnp.asarray(
            np.tile(np.array([1.0, -1.0, 1.0, -1.0]), npat), self.dtype)

        # ---- transient-only patterns ----
        # inductor BE companion (tanalisis.cpp:294-319): the 4 ±1 couplings
        # plus the -L/dt branch diagonal
        self.ind_rows = np.concatenate(
            [np.stack([t.ind_ep, t.ind_em, t.ind_k, t.ind_k], 1).ravel(),
             t.ind_k]).astype(np.int32)
        self.ind_cols = np.concatenate(
            [np.stack([t.ind_k, t.ind_k, t.ind_ep, t.ind_em], 1).ravel(),
             t.ind_k]).astype(np.int32)

        # "cap-like" class: explicit capacitors followed by the 4 lumped MOS
        # junction caps per device, pair order (G,S),(G,D),(S,B),(D,B)
        # (tanalisis.cpp:321-353); state vector shares this layout.
        mc_a = np.stack([t.mos_eg, t.mos_eg, t.mos_es, t.mos_ed], 1).ravel()
        mc_b = np.stack([t.mos_es, t.mos_ed, t.mos_eb, t.mos_eb], 1).ravel()
        # diode junction caps (CJO, extension) follow the MOS caps, then the
        # BJT junction caps CJE (B-E) and CJC (B-C), interleaved per device
        nQ = len(t.bjt_ec)
        qc_a = np.stack([t.bjt_eb, t.bjt_eb], 1).ravel() if nQ \
            else np.zeros((0,), np.int32)
        qc_b = np.stack([t.bjt_ee, t.bjt_ec], 1).ravel() if nQ \
            else np.zeros((0,), np.int32)
        self.cap_a = np.concatenate([t.cap_e1, mc_a, t.dio_ep,
                                     qc_a]).astype(np.int32)
        self.cap_b = np.concatenate([t.cap_e2, mc_b, t.dio_em,
                                     qc_b]).astype(np.int32)
        self.cap_rows, self.cap_cols = _two_terminal_pattern(self.cap_a, self.cap_b)
        self.n_caplike = len(self.cap_a)

        # ---- charge-conserving MOS cap model (extension; opt-in via
        # .OPTIONS MOSCAP=CHARGE).  The fixed lumps above stay in the
        # cap-like layout with C=0 (_caplike_C) so every state shape is
        # unchanged; the bias-dependent charges ride 5 per-device
        # injection rows (i_d, i_g, i_s gate model; i_sb at S; i_db at D)
        # whose Jacobian is exactly dq/dv/dt (models/moscap.py).
        if opts.mos_cap_model not in ("fixed", "charge"):
            raise ValueError(f"unknown mos_cap_model "
                             f"{opts.mos_cap_model!r} (fixed|charge)")
        self.mos_charge = opts.mos_cap_model == "charge" and nM > 0
        if self.mos_charge:
            term = np.stack([t.mos_ed, t.mos_eg, t.mos_es], 1)   # (nM,3)
            inj = np.stack([t.mos_ed, t.mos_eg, t.mos_es,
                            t.mos_es, t.mos_ed], 1)              # (nM,5)
            self.mq_rows = np.repeat(inj, 3, axis=1).ravel().astype(np.int32)
            self.mq_cols = np.tile(term, (1, 5)).ravel().astype(np.int32)
            self.mq_rhs_rows = inj.ravel().astype(np.int32)      # (5nM,)

        # ---- mutual inductance (K card, extension) ----
        # branch-row cross terms: row k_a gets -M/dt at col k_b and vice
        # versa (BE companion of v_a = L_a di_a/dt + M di_b/dt)
        nK = len(t.mut_a)
        nL = len(t.ind_k)
        if nK:
            ka = t.ind_k[t.mut_a]
            kb = t.ind_k[t.mut_b]
            self.mut_rows = np.concatenate([ka, kb]).astype(np.int32)
            self.mut_cols = np.concatenate([kb, ka]).astype(np.int32)
            A = np.zeros((nK, nL))
            Bsel = np.zeros((nK, nL))
            A[np.arange(nK), t.mut_a] = 1.0
            Bsel[np.arange(nK), t.mut_b] = 1.0
            self.mut_sel_a = jnp.asarray(A, self.dtype)
            self.mut_sel_b = jnp.asarray(Bsel, self.dtype)
        else:
            self.mut_rows = np.zeros(0, np.int32)
            self.mut_cols = np.zeros(0, np.int32)
            self.mut_sel_a = self.mut_sel_b = None

        # ---- transmission lines (T card, extension) ----
        # Branin/method-of-characteristics: each port is a Thevenin branch
        #   V(p)-V(n) - Z0*i = E(t),  E = delayed wave of the OTHER port
        # (models note in netlist/parser.py _parse_tline).  Two branch
        # unknowns per line.  DC: the line degenerates to a short
        # (i1 = -i2, V1 = V2).
        nT = len(t.tl_k1)
        self.n_tl = nT
        # KCL couplings (shared by DC and transient): current leaves the
        # port's + node into the line
        self.tl_kcl_rows = np.stack(
            [t.tl_ep1, t.tl_em1, t.tl_ep2, t.tl_em2], 1).ravel().astype(np.int32)
        self.tl_kcl_cols = np.stack(
            [t.tl_k1, t.tl_k1, t.tl_k2, t.tl_k2], 1).ravel().astype(np.int32)
        # transient branch rows: (k1: p1,n1,k1) (k2: p2,n2,k2)
        self.tl_tran_rows = np.stack(
            [t.tl_k1, t.tl_k1, t.tl_k1, t.tl_k2, t.tl_k2, t.tl_k2],
            1).ravel().astype(np.int32)
        self.tl_tran_cols = np.stack(
            [t.tl_ep1, t.tl_em1, t.tl_k1, t.tl_ep2, t.tl_em2, t.tl_k2],
            1).ravel().astype(np.int32)
        # DC branch rows: k1: V(p1)-V(n1)-V(p2)+V(n2) = 0; k2: i1 + i2 = 0
        self.tl_dc_rows = np.stack(
            [t.tl_k1, t.tl_k1, t.tl_k1, t.tl_k1, t.tl_k2, t.tl_k2],
            1).ravel().astype(np.int32)
        self.tl_dc_cols = np.stack(
            [t.tl_ep1, t.tl_em1, t.tl_ep2, t.tl_em2, t.tl_k1, t.tl_k2],
            1).ravel().astype(np.int32)
        self.tl_dc_vals = jnp.asarray(
            np.tile(np.array([1.0, -1.0, -1.0, 1.0, 1.0, 1.0]), nT),
            self.dtype)
        self.tl_kcl_vals = jnp.asarray(
            np.tile(np.array([1.0, -1.0, 1.0, -1.0]), nT), self.dtype)

        # ---- behavioral B sources (extension) ----
        # static tier: V-form branch coupling (like a V source); nl tier:
        # expression Jacobian entries from jax.value_and_grad per device
        # (models note in utils/expr.py compile_jax)
        self.b_sources = list(getattr(low, "b_sources", []))
        b_static_rows, b_static_cols, b_static_vals = [], [], []
        b_nl_rows, b_nl_cols, b_rhs_rows = [], [], []
        import jax as _jax
        self._b_vg = []
        for bs in self.b_sources:
            m = len(bs.pairs)
            if bs.is_v:
                # KCL couplings + branch row V(p)-V(m) (the -E part is nl)
                b_static_rows += [bs.ep, bs.em, bs.k, bs.k]
                b_static_cols += [bs.k, bs.k, bs.ep, bs.em]
                b_static_vals += [1.0, -1.0, 1.0, -1.0]
                for a, b in bs.pairs:
                    b_nl_rows += [bs.k, bs.k]
                    b_nl_cols += [int(a), int(b)]
                b_rhs_rows.append(bs.k)
            else:
                for a, b in bs.pairs:
                    b_nl_rows += [bs.ep, bs.ep, bs.em, bs.em]
                    b_nl_cols += [int(a), int(b), int(a), int(b)]
                b_rhs_rows += [bs.ep, bs.em]
            self._b_vg.append(_jax.value_and_grad(bs.fn))
        self.b_static_rows = np.asarray(b_static_rows, np.int32)
        self.b_static_cols = np.asarray(b_static_cols, np.int32)
        self.b_static_vals = jnp.asarray(b_static_vals, self.dtype)
        self.b_nl_rows = np.asarray(b_nl_rows, np.int32)
        self.b_nl_cols = np.asarray(b_nl_cols, np.int32)
        self.b_rhs_rows = np.asarray(b_rhs_rows, np.int32)
        self.b_uses_time = any(bs.uses_time for bs in self.b_sources)
        # static body-effect flag: when every GAMMA is 0 the stamp math is
        # kept STRUCTURALLY identical to the reference path so batched
        # lanes stay bit-identical to unbatched runs (a tested invariant)
        self.mos_body = bool(np.any(np.asarray(low.params["mos_gamma"])))
        # TRNOISE(na nt [alpha namp]) sources present?  (static flags:
        # noise amplitudes are not MC knobs)
        _tnv = np.asarray(low.params["vs_tn"])
        _tni = np.asarray(low.params["is_tn"])
        self.vs_flicker = bool(np.any(_tnv[..., 3] > 0))
        self.is_flicker = bool(np.any(_tni[..., 3] > 0))
        self.has_trnoise = bool(
            np.any(_tnv[..., 0] > 0) or np.any(_tni[..., 0] > 0)
            or self.vs_flicker or self.is_flicker)
        # which sources actually carry noise (static index sets — the
        # fused-kernel path streams values only for these rows)
        _tnv2 = _tnv.reshape(-1, 4)
        _tni2 = _tni.reshape(-1, 4)
        self.vs_noisy = np.where((_tnv2[:, 0] > 0)
                                 | (_tnv2[:, 3] > 0))[0].astype(np.int32)
        self.is_noisy = np.where((_tni2[:, 0] > 0)
                                 | (_tni2[:, 3] > 0))[0].astype(np.int32)
        self.bjt_early = bool(np.any(np.asarray(low.params["bjt_vaf"])))
        self.res_tc = bool(np.any(np.asarray(low.params["res_tc1"]))
                           or np.any(np.asarray(low.params["res_tc2"])))
        self.dio_bv = bool(np.any(np.asarray(low.params["dio_bv"])))

        # ---- linear controlled sources (extension; static stamps) ----
        # VCCS: rows [p,p,m,m] x cols [cp,cm,cp,cm], vals [+g,-g,-g,+g]
        # CCCS: rows [p,m] x cols [kc,kc], vals [+gain,-gain]
        # VCVS: rows [p,m,k,k,k,k] x cols [k,k,p,m,cp,cm],
        #       vals [1,-1, 1,-1,-gain,+gain]
        # CCVS: rows [p,m,k,k,k] x cols [k,k,p,m,kc], vals [1,-1,1,-1,-r]
        self.ctrl_rows = np.concatenate([
            np.stack([t.vccs_ep, t.vccs_ep, t.vccs_em, t.vccs_em], 1).ravel(),
            np.stack([t.cccs_ep, t.cccs_em], 1).ravel(),
            np.stack([t.vcvs_ep, t.vcvs_em, t.vcvs_k, t.vcvs_k,
                      t.vcvs_k, t.vcvs_k], 1).ravel(),
            np.stack([t.ccvs_ep, t.ccvs_em, t.ccvs_k, t.ccvs_k,
                      t.ccvs_k], 1).ravel(),
        ]).astype(np.int32)
        self.ctrl_cols = np.concatenate([
            np.stack([t.vccs_ecp, t.vccs_ecm, t.vccs_ecp,
                      t.vccs_ecm], 1).ravel(),
            np.stack([t.cccs_kc, t.cccs_kc], 1).ravel(),
            np.stack([t.vcvs_k, t.vcvs_k, t.vcvs_ep, t.vcvs_em,
                      t.vcvs_ecp, t.vcvs_ecm], 1).ravel(),
            np.stack([t.ccvs_k, t.ccvs_k, t.ccvs_ep, t.ccvs_em,
                      t.ccvs_kc], 1).ravel(),
        ]).astype(np.int32)

        # ---- nonlinear (per-Newton-iteration) patterns ----
        self.mos_rows = np.stack(
            [t.mos_ed, t.mos_ed, t.mos_ed, t.mos_es, t.mos_es, t.mos_es],
            1).ravel().astype(np.int32)
        self.mos_cols = np.stack(
            [t.mos_ed, t.mos_eg, t.mos_es, t.mos_ed, t.mos_eg, t.mos_es],
            1).ravel().astype(np.int32)
        self.mos_rhs_rows = np.stack([t.mos_ed, t.mos_es], 1).ravel().astype(np.int32)
        self.dio_rows = np.stack(
            [t.dio_ep, t.dio_ep, t.dio_em, t.dio_em], 1).ravel().astype(np.int32)
        self.dio_cols = np.stack(
            [t.dio_ep, t.dio_em, t.dio_ep, t.dio_em], 1).ravel().astype(np.int32)
        self.dio_rhs_rows = np.stack([t.dio_ep, t.dio_em], 1).ravel().astype(np.int32)
        # BJT: rows [C,C,C, B,B,B, E,E,E] x cols [C,B,E]x3 (models/bjt.py)
        self.bjt_rows = np.stack(
            [t.bjt_ec] * 3 + [t.bjt_eb] * 3 + [t.bjt_ee] * 3,
            1).ravel().astype(np.int32)
        self.bjt_cols = np.stack(
            [t.bjt_ec, t.bjt_eb, t.bjt_ee] * 3, 1).ravel().astype(np.int32)
        self.bjt_rhs_rows = np.stack(
            [t.bjt_ec, t.bjt_eb, t.bjt_ee], 1).ravel().astype(np.int32)
        # JFETs (extension): same 3x3 block shape as the MOSFET stamp
        self.jf_rows = np.stack(
            [t.jf_ed, t.jf_ed, t.jf_ed, t.jf_es, t.jf_es, t.jf_es],
            1).ravel().astype(np.int32)
        self.jf_cols = np.stack(
            [t.jf_ed, t.jf_eg, t.jf_es, t.jf_ed, t.jf_eg, t.jf_es],
            1).ravel().astype(np.int32)
        self.jf_rhs_rows = np.stack([t.jf_ed, t.jf_es],
                                    1).ravel().astype(np.int32)
        # switches (S/W, extension): 2x2 conductance block + 2x2 control
        # coupling (models/switch.py)
        self.sw_rows = np.stack(
            [t.sw_ep, t.sw_ep, t.sw_em, t.sw_em,
             t.sw_ep, t.sw_ep, t.sw_em, t.sw_em], 1).ravel().astype(np.int32)
        self.sw_cols = np.stack(
            [t.sw_ep, t.sw_em, t.sw_ep, t.sw_em,
             t.sw_ecp, t.sw_ecm, t.sw_ecp, t.sw_ecm],
            1).ravel().astype(np.int32)
        self.sw_rhs_rows = np.stack([t.sw_ep, t.sw_em],
                                    1).ravel().astype(np.int32)
        self.nl_rows = np.concatenate([self.mos_rows, self.jf_rows,
                                       self.dio_rows, self.bjt_rows,
                                       self.sw_rows, self.b_nl_rows])
        self.nl_cols = np.concatenate([self.mos_cols, self.jf_cols,
                                       self.dio_cols, self.bjt_cols,
                                       self.sw_cols, self.b_nl_cols])
        self.nl_rhs_rows = np.concatenate([self.mos_rhs_rows,
                                           self.jf_rhs_rows,
                                           self.dio_rhs_rows,
                                           self.bjt_rhs_rows,
                                           self.sw_rhs_rows,
                                           self.b_rhs_rows])

        # ---- RHS patterns ----
        self.is_rhs_rows = np.stack([t.is_ep, t.is_em], 1).ravel().astype(np.int32)
        self.cap_rhs_rows = np.stack([self.cap_a, self.cap_b], 1).ravel().astype(np.int32)

        # ---- gather/scatter-free hot-path operators ----
        # Dynamic gathers/scatters are the dominant per-step cost inside TPU
        # loop bodies (each one breaks fusion and lowers to a slow op), so
        # the transient hot loop uses tiny one-hot matmuls instead:
        #   RHS assembly:  I = [vval | ival | vhist | cap_hist_currents] @ M
        #   state update:  [cap_hist | ind_i] = x @ S
        # The matmul form is O(N * nterms) per step — a huge win for small
        # circuits (where gathers dominate) but quadratic for big ladders;
        # beyond this size the scatter/gather fallback is used instead.
        nV, nI, nL = len(t.vs_ep), len(t.is_ep), len(t.ind_ep)
        ncap = self.n_caplike
        nterms = nV + nI + nL + ncap + 2 * nT
        self.use_matmul_hotpath = N * max(nterms, 1) <= 2_000_000
        if not self.use_matmul_hotpath:
            self.rhs_mat = None
            self.state_mat = None
            self.vs_kinds = np.asarray(low.params["vs_kind"])
            self.is_kinds = np.asarray(low.params["is_kind"])
            self.pwl_width = max(low.params["vs_pwl_t"].shape[-1],
                                 low.params["is_pwl_t"].shape[-1])
            return
        M = np.zeros((N, nterms))
        for j in range(nV):
            M[t.vs_k[j], j] += 1.0
        for j in range(nI):
            if t.is_ep[j] < N:
                M[t.is_ep[j], nV + j] -= 1.0
            if t.is_em[j] < N:
                M[t.is_em[j], nV + j] += 1.0
        for j in range(nL):
            M[t.ind_k[j], nV + nI + j] += 1.0
        for j in range(ncap):
            if self.cap_a[j] < N:
                M[self.cap_a[j], nV + nI + nL + j] += 1.0
            if self.cap_b[j] < N:
                M[self.cap_b[j], nV + nI + nL + j] -= 1.0
        for j in range(nT):     # delayed-wave Thevenin EMFs E1, E2
            M[t.tl_k1[j], nV + nI + nL + ncap + j] += 1.0
            M[t.tl_k2[j], nV + nI + nL + ncap + nT + j] += 1.0
        self.rhs_mat = jnp.asarray(M.T, self.dtype)        # (nterms, N)

        # columns: cap-like voltage differences | inductor branch currents |
        # inductor terminal-voltage differences (the last needed only by the
        # trapezoidal method)
        S = np.zeros((N, ncap + 2 * nL))
        for j in range(ncap):
            if self.cap_a[j] < N:
                S[self.cap_a[j], j] += 1.0
            if self.cap_b[j] < N:
                S[self.cap_b[j], j] -= 1.0
        for j in range(nL):
            S[t.ind_k[j], ncap + j] += 1.0
            if t.ind_ep[j] < N:
                S[t.ind_ep[j], ncap + nL + j] += 1.0
            if t.ind_em[j] < N:
                S[t.ind_em[j], ncap + nL + j] -= 1.0
        self.state_mat = jnp.asarray(S, self.dtype)        # (N, ncap+2nL)

        # static waveform-kind masks: kinds are structural (set by the
        # netlist), so absent waveform formulas compile away entirely
        self.vs_kinds = np.asarray(low.params["vs_kind"])
        self.is_kinds = np.asarray(low.params["is_kind"])
        self.pwl_width = max(low.params["vs_pwl_t"].shape[-1],
                             low.params["is_pwl_t"].shape[-1])

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------
    def x_ext(self, x):
        """Append the ground slot (always 0 V) so eq-index gathers are
        branch-free; mirrors the getV(-1)->0.0 convention (element.cpp:196-199)."""
        pad = jnp.zeros(x.shape[:-1] + (1,), dtype=x.dtype)
        return jnp.concatenate([x, pad], axis=-1)

    def _caplike_C(self, params):
        """Capacitance of every cap-like element: explicit C values then the
        MOS junction caps Cgs=Cgd=Cj0/2, Csb=Cdb=Cj0 (tanalisis.cpp:337-341).
        Under the charge cap model the MOS lump slots stay in the layout
        (state shapes unchanged) but carry C=0 — the bias-dependent
        charges are injection rows, not companion conductances."""
        cj0 = params["mos_cj0"]
        if self.mos_charge:
            cj0 = jnp.zeros_like(cj0)
        mc = jnp.stack([0.5 * cj0, 0.5 * cj0, cj0, cj0], axis=-1)
        mc = mc.reshape(*cj0.shape[:-1], -1)
        cje, cjc = params["bjt_cje"], params["bjt_cjc"]
        qc = jnp.stack([cje, cjc], axis=-1).reshape(*cje.shape[:-1], -1)
        return jnp.concatenate([params["cap_c"], mc, params["dio_cjo"], qc],
                               axis=-1)

    def tl_ticks(self, dt) -> np.ndarray:
        """Per-line delay in timesteps (>=1); static — the ring length is a
        compile-time constant."""
        td = np.asarray(self.topo.tl_td_s, dtype=float)
        return np.maximum(1, np.rint(td / float(dt)).astype(int))

    def _tl_wave_now(self, params, x):
        """w_j = V(p)-V(n) + Z0*i for both ports: (..., 2*nT) as
        [w1_lines..., w2_lines...]."""
        t = self.topo
        xe = self.x_ext(x)
        z0 = params["tl_z0"]
        w1 = xe[..., t.tl_ep1] - xe[..., t.tl_em1] + z0 * x[..., t.tl_k1]
        w2 = xe[..., t.tl_ep2] - xe[..., t.tl_em2] + z0 * x[..., t.tl_k2]
        return jnp.concatenate([w1, w2], axis=-1)

    def _mutual_M(self, params):
        """Mutual inductance per K element: M = k * sqrt(L_a * L_b) —
        derived from the live L params so Monte-Carlo/.STEP perturbations
        of an inductor keep its couplings physically consistent."""
        t = self.topo
        L = params["ind_l"]
        return params["mut_k"] * jnp.sqrt(L[..., t.mut_a] * L[..., t.mut_b])

    def _res_vals(self, params):
        r = params["res_r"]
        if self.res_tc:
            # R(T) = R * (1 + tc1*dT + tc2*dT^2) — structurally absent when
            # no resistor carries a TC (keeps the bitwise batch invariant)
            dt_ = params["temp_delta_c"]
            r = r * (1.0 + params["res_tc1"] * dt_
                     + params["res_tc2"] * dt_ * dt_)
        g = jnp.where(r != 0.0, 1.0 / jnp.where(r != 0.0, r, 1.0), 0.0)
        return _two_terminal_vals(g)

    def _ctrl_vals(self, params):
        """Values for the controlled-source stamp pattern (ctrl_rows/cols
        order); all linear, so these belong to the static tier."""
        g = params["vccs_g"]
        a = params["cccs_gain"]
        e = params["vcvs_gain"]
        r = params["ccvs_r"]
        oe = jnp.ones_like(e)
        orr = jnp.ones_like(r)
        parts = [
            jnp.stack([g, -g, -g, g], axis=-1).reshape(*g.shape[:-1], -1),
            jnp.stack([a, -a], axis=-1).reshape(*a.shape[:-1], -1),
            jnp.stack([oe, -oe, oe, -oe, -e, e],
                      axis=-1).reshape(*e.shape[:-1], -1),
            jnp.stack([orr, -orr, orr, -orr, -r],
                      axis=-1).reshape(*r.shape[:-1], -1),
        ]
        return jnp.concatenate(parts, axis=-1)

    def _nl_vals(self, params, x, t=0.0):
        """Per-Newton-iteration nonlinear stamp values (MOS/JFET/diode/
        BJT/switch/behavioral).  `t` reaches behavioral expressions that
        reference `time` (the transient threads the step time; DC/AC
        linearize at t=0)."""
        xe = self.x_ext(x)
        gv = []
        rv = []
        time_val = t
        t = self.topo
        if len(t.mos_ed):
            vd = xe[..., t.mos_ed]
            vg = xe[..., t.mos_eg]
            vs = xe[..., t.mos_es]
            g, r = mos_stamp_vals(params["mos_vth"], params["mos_k"],
                                  params["mos_lam"], params["mos_p"],
                                  vd, vg, vs, self.opts.mos_off_gds,
                                  self.opts.mos_reverse_region,
                                  gamma=(params["mos_gamma"]
                                         if self.mos_body else None),
                                  phi=(params["mos_phi"]
                                       if self.mos_body else None))
            gv.append(g)
            rv.append(r)
        if len(t.jf_ed):
            # Shichman-Hodges == square law with K = 2*BETA, signed VTO
            g, r = mos_stamp_vals(params["jf_vto"],
                                  2.0 * params["jf_beta"],
                                  params["jf_lam"], params["jf_p"],
                                  xe[..., t.jf_ed], xe[..., t.jf_eg],
                                  xe[..., t.jf_es], self.opts.mos_off_gds,
                                  self.opts.mos_reverse_region)
            gv.append(g)
            rv.append(r)
        if len(t.dio_ep):
            vp = xe[..., t.dio_ep]
            vm = xe[..., t.dio_em]
            # vt_thermal is per-LANE (scalar, or (B,) in the natively
            # batched dc_newton path) while the other params are
            # (..., nD); expand so n*vt broadcasts per-device, not
            # outer-product over the batch
            g, r = diode_stamp_vals(params["dio_is"], params["dio_n"], vp,
                                    vm,
                                    vt=jnp.expand_dims(
                                        params["vt_thermal"], -1),
                                    bv=(params["dio_bv"]
                                        if self.dio_bv else None),
                                    ibv=(params["dio_ibv"]
                                         if self.dio_bv else None))
            gv.append(g)
            rv.append(r)
        if len(t.bjt_ec):
            from ..models.bjt import bjt_stamp_vals
            vc = xe[..., t.bjt_ec]
            vb = xe[..., t.bjt_eb]
            ve = xe[..., t.bjt_ee]
            g, r = bjt_stamp_vals(params["bjt_is"], params["bjt_bf"],
                                  params["bjt_br"], params["bjt_p"],
                                  vc, vb, ve,
                                  vt=jnp.expand_dims(
                                      params["vt_thermal"], -1),
                                  vaf=(params["bjt_vaf"]
                                       if self.bjt_early else None))
            gv.append(g)
            rv.append(r)
        if len(t.sw_ep):
            from ..models.switch import switch_stamp_vals
            g, r = switch_stamp_vals(
                params["sw_ron"], params["sw_roff"], params["sw_vt"],
                params["sw_vh"], xe[..., t.sw_ep], xe[..., t.sw_em],
                xe[..., t.sw_ecp], xe[..., t.sw_ecm])
            gv.append(g)
            rv.append(r)
        for bs, vg in zip(self.b_sources, self._b_vg):
            # probe values: val_j = x[a_j] - x[b_j]; the expression's
            # value/gradient give the Newton linearization directly.
            # consts = the device's referenced .PARAM values (dynamic —
            # batched for Monte-Carlo / re-bound by .STEP)
            vals = xe[..., bs.pairs[:, 0]] - xe[..., bs.pairs[:, 1]]
            consts = params["b_consts"][
                ..., bs.const_off:bs.const_off + bs.n_consts]
            f_vg = vg
            for _ in range(vals.ndim - 1):
                f_vg = jax.vmap(f_vg, in_axes=(0, None, 0))
            e0, grads = f_vg(vals, jnp.asarray(time_val, x.dtype), consts)
            cst = e0 - jnp.sum(grads * vals, axis=-1)
            if bs.is_v:
                # branch row: Vp - Vm - sum g_j val_j = cst
                gpairs = jnp.stack([-grads, grads], axis=-1)
                gv.append(gpairs.reshape(*grads.shape[:-1], -1))
                rv.append(cst[..., None])
            else:
                g4 = jnp.stack([grads, -grads, -grads, grads], axis=-1)
                gv.append(g4.reshape(*grads.shape[:-1], -1))
                rv.append(jnp.stack([-cst, cst], axis=-1))
        if not gv:
            z = jnp.zeros(x.shape[:-1] + (0,), dtype=x.dtype)
            return z, z
        return (jnp.concatenate(gv, axis=-1), jnp.concatenate(rv, axis=-1))

    def _zeros_G(self, like):
        return jnp.zeros(like.shape[:-1] + (self.N + 1, self.N + 1), dtype=self.dtype)

    def _zeros_I(self, like):
        return jnp.zeros(like.shape[:-1] + (self.N + 1,), dtype=self.dtype)

    # ------------------------------------------------------------------
    # DC assembly
    # ------------------------------------------------------------------
    def dc_static_entries(self, params):
        """Static COO entries of the DC system matrix (everything except the
        nonlinear linearization and the per-iteration gmin diagonal)."""
        rvals = self._res_vals(params)
        rows = np.concatenate([self.res_rows, self.dc_const_rows,
                               self.tl_kcl_rows, self.tl_dc_rows,
                               self.b_static_rows, self.ctrl_rows])
        cols = np.concatenate([self.res_cols, self.dc_const_cols,
                               self.tl_kcl_cols, self.tl_dc_cols,
                               self.b_static_cols, self.ctrl_cols])
        tl_const = jnp.concatenate([self.tl_kcl_vals, self.tl_dc_vals])
        const = jnp.concatenate([self.dc_const_vals, tl_const,
                                 self.b_static_vals])
        const = jnp.broadcast_to(const, rvals.shape[:-1] + const.shape)
        cvals = self._ctrl_vals(params)
        cvals = jnp.broadcast_to(cvals, rvals.shape[:-1] + cvals.shape[-1:])
        vals = jnp.concatenate([rvals, const, cvals], axis=-1)
        return rows, cols, vals

    def dc_rhs(self, params, scale):
        """DC RHS vector: V/I source values at the given ramp scale."""
        vval = srcmod.eval_dc(params["vs_dc"], params["vs_kind"],
                              params["vs_sin"], scale,
                              pulse=params["vs_pulse"])
        I = self._zeros_I(vval)
        I = I.at[..., self.topo.vs_k].add(vval)
        ival = srcmod.eval_dc(params["is_dc"], params["is_kind"],
                              params["is_sin"], scale,
                              pulse=params["is_pulse"])
        irhs = jnp.stack([-ival, ival], axis=-1).reshape(*ival.shape[:-1], -1)
        I = I.at[..., self.is_rhs_rows].add(irhs)
        return I

    def dc_static(self, params, scale):
        """G/I contributions that are constant across Newton iterations of a
        ramp step: R conductances, V/L branch couplings, source values at
        `scale` (src/dcanalysis.cpp:120-130 stamp pass sans MOS)."""
        rows, cols, vals = self.dc_static_entries(params)
        G = self._zeros_G(vals)
        G = G.at[..., rows, cols].add(vals)
        return G, self.dc_rhs(params, scale)

    def assemble_dc_iter(self, G_static, I_static, params, x, gmin):
        """Add the per-iteration parts: nonlinear device linearization and the
        adaptive gmin-to-ground diagonal (dcanalysis.cpp:126-130)."""
        gvals, rvals = self._nl_vals(params, x)  # t=0 for behavioral exprs
        G = G_static.at[..., self.nl_rows, self.nl_cols].add(gvals)
        gm = jnp.broadcast_to(
            jnp.asarray(gmin, self.dtype)[..., None],
            gvals.shape[:-1] + (len(self.topo.node_eqs),))
        G = G.at[..., self.topo.node_eqs, self.topo.node_eqs].add(gm)
        I = I_static.at[..., self.nl_rhs_rows].add(rvals)
        return G, I

    # ------------------------------------------------------------------
    # Transient assembly (Backward Euler companions, tanalisis.cpp:255-356)
    # ------------------------------------------------------------------
    def tran_static_entries(self, params, dt, gmin, method: str = "be"):
        """Static COO entries of the transient system matrix (constant for
        the whole analysis: R, V couplings, L and C/MOS-cap companion
        conductances, gmin diagonal) as (rows, cols, vals).

        method "be": G_C = C/dt, R_L = L/dt (tanalisis.cpp:59-80, 294-319);
        method "trap": G_C = 2C/dt, R_L = 2L/dt (trapezoidal companions)."""
        rvals = self._res_vals(params)
        fac = 2.0 if method == "trap" else 1.0

        # V sources keep their ±1 coupling; inductors get the companion.
        nV = len(self.topo.vs_ep)
        vs_vals = self.dc_const_vals[:4 * nV]

        L = params["ind_l"]
        lmask = L > 0.0
        ones = jnp.ones_like(L)
        pat = jnp.stack([ones, -ones, ones, -ones], axis=-1)
        pat = (pat * lmask[..., None]).reshape(*L.shape[:-1], -1)
        diag = jnp.where(lmask, -fac * L / dt, 0.0)
        ind_vals = jnp.concatenate([pat, diag], axis=-1)

        C = self._caplike_C(params)
        gc = jnp.where(C > 0.0, fac * C / dt, 0.0)
        cap_vals = _two_terminal_vals(gc)

        gm = jnp.broadcast_to(
            jnp.asarray(gmin, self.dtype)[..., None],
            rvals.shape[:-1] + (len(self.topo.node_eqs),))

        rows = np.concatenate([self.res_rows, self.dc_const_rows[:4 * nV],
                               self.ind_rows, self.mut_rows, self.cap_rows,
                               self.topo.node_eqs, self.ctrl_rows,
                               self.tl_kcl_rows, self.tl_tran_rows,
                               self.b_static_rows])
        cols = np.concatenate([self.res_cols, self.dc_const_cols[:4 * nV],
                               self.ind_cols, self.mut_cols, self.cap_cols,
                               self.topo.node_eqs, self.ctrl_cols,
                               self.tl_kcl_cols, self.tl_tran_cols,
                               self.b_static_cols])
        mv = -fac * self._mutual_M(params) / dt
        mut_vals = jnp.concatenate([mv, mv], axis=-1)
        cvals = self._ctrl_vals(params)
        cvals = jnp.broadcast_to(cvals, rvals.shape[:-1] + cvals.shape[-1:])
        # transmission-line Thevenin branch rows: +1, -1, -Z0 per port
        z0 = params["tl_z0"]
        o = jnp.ones_like(z0)
        tl_branch = jnp.stack([o, -o, -z0, o, -o, -z0],
                              axis=-1).reshape(*z0.shape[:-1], -1)
        tl_kcl = jnp.broadcast_to(self.tl_kcl_vals,
                                  rvals.shape[:-1] + self.tl_kcl_vals.shape)
        tl_branch = jnp.broadcast_to(tl_branch,
                                     rvals.shape[:-1] + tl_branch.shape[-1:])
        b_vals = jnp.broadcast_to(self.b_static_vals,
                                  rvals.shape[:-1] + self.b_static_vals.shape)
        vals = jnp.concatenate(
            [rvals, jnp.broadcast_to(vs_vals, rvals.shape[:-1] + vs_vals.shape[-1:]),
             ind_vals, mut_vals, cap_vals, gm, cvals, tl_kcl, tl_branch,
             b_vals],
            axis=-1)
        return rows, cols, vals

    def tran_static_G(self, params, dt, gmin, method: str = "be"):
        """The whole G matrix except the nonlinear conduction entries — this
        is constant for the entire transient (fixed dt, fixed gmin)."""
        rows, cols, vals = self.tran_static_entries(params, dt, gmin, method)
        G = self._zeros_G(vals)
        G = G.at[..., rows, cols].add(vals)
        return G

    def make_tran_static_I(self, dt, method: str = "be"):
        """Returns f(params, state, t) -> I_static: RHS for one timestep —
        sources at time t plus element history currents.  `state` is the
        TranState dict (see init_state).

        Hot-path form: a single (nterms, N) one-hot matmul replaces the four
        scatter-adds (scatters inside TPU loop bodies cost ~0.1 ms each; the
        matmul is fused into the step).  Waveform evaluation is specialized
        on the static kind vector.  Returns an (N+1,) vector (dump slot 0)
        for interface compatibility.

        History terms — BE (tanalisis.cpp:76-79, 308-318):
            cap:  I(a) += (C/dt) v_prev,    L: I(k) += -(L/dt) i_prev
        trapezoidal:
            cap:  I(a) += (2C/dt) v_prev + i_prev
            L:    I(k) += -(2L/dt) i_prev - v_prev
        """
        trap = method == "trap"
        nT = self.n_tl
        if nT:
            ticks = self.tl_ticks(dt)                # static per-line delays
            tl_read = np.asarray(ticks - 1, np.int32)
            tl_cols1 = np.arange(nT, 2 * nT, dtype=np.int32)  # E1 <- w2
            tl_cols2 = np.arange(0, nT, dtype=np.int32)       # E2 <- w1

        def tl_emfs(state):
            """Delayed-wave Thevenin EMFs (E1s, E2s) from the ring buffer
            state['tlw'] of shape (..., Dmax, 2*nT); slot d = wave d steps
            before the one being computed."""
            ring = state["tlw"]
            e1 = ring[..., tl_read, tl_cols1]
            e2 = ring[..., tl_read, tl_cols2]
            return e1, e2

        def terms_of(params, state, t):
            vval = srcmod.eval_tran_static_kinds(
                self.vs_kinds,
                params["vs_dc"], params["vs_pulse"],
                params["vs_sin"], params["vs_pwl_t"], params["vs_pwl_v"],
                params["vs_pwl_n"], t)

            ival = srcmod.eval_tran_static_kinds(
                self.is_kinds,
                params["is_dc"], params["is_pulse"],
                params["is_sin"], params["is_pwl_t"], params["is_pwl_v"],
                params["is_pwl_n"], t)
            if "tn_v" in state:
                # TRNOISE: this step's noise values ride the state (drawn
                # by make_update_state; constant across Newton iterations)
                vval = vval + state["tn_v"]
                ival = ival + state["tn_i"]

            L = params["ind_l"]
            C = self._caplike_C(params)
            fac = 2.0 if trap else 1.0
            if trap:
                vhist = jnp.where(L > 0.0,
                                  -(2.0 * L / dt) * state["il"] - state["vl"],
                                  0.0)
                gc = jnp.where(C > 0.0, 2.0 * C / dt, 0.0)
                h = gc * state["vc"] + jnp.where(C > 0.0, state["ic"], 0.0)
            else:
                vhist = jnp.where(L > 0.0, -(L / dt) * state["il"], 0.0)
                gc = jnp.where(C > 0.0, C / dt, 0.0)
                h = gc * state["vc"]
            if len(self.topo.mut_a):
                # mutual-inductance history: row k_a gets -(M/dt) i_b_prev
                # (x2 for trap); gather/scatter-free via one-hot selectors
                coef = -(fac / dt) * self._mutual_M(params)
                ia = jnp.einsum("...l,kl->...k", state["il"], self.mut_sel_a)
                ib = jnp.einsum("...l,kl->...k", state["il"], self.mut_sel_b)
                vhist = (vhist
                         + jnp.einsum("...k,kl->...l", coef * ib,
                                      self.mut_sel_a)
                         + jnp.einsum("...k,kl->...l", coef * ia,
                                      self.mut_sel_b))
            return vval, ival, vhist, h

        if self.use_matmul_hotpath:
            def f(params, state, t):
                vval, ival, vhist, h = terms_of(params, state, t)
                parts = [vval, ival, vhist, h]
                if nT:
                    e1, e2 = tl_emfs(state)
                    parts += [e1, e2]
                terms = jnp.concatenate(parts, axis=-1)
                I = jnp.einsum("...j,jn->...n", terms, self.rhs_mat)
                pad = jnp.zeros(I.shape[:-1] + (1,), dtype=I.dtype)
                return jnp.concatenate([I, pad], axis=-1)
        else:
            topo = self.topo

            def f(params, state, t):
                vval, ival, vhist, h = terms_of(params, state, t)
                I = self._zeros_I(vval)
                I = I.at[..., topo.vs_k].add(vval)
                irhs = jnp.stack([-ival, ival],
                                 axis=-1).reshape(*ival.shape[:-1], -1)
                I = I.at[..., self.is_rhs_rows].add(irhs)
                I = I.at[..., topo.ind_k].add(vhist)
                hrhs = jnp.stack([h, -h], axis=-1).reshape(*h.shape[:-1], -1)
                I = I.at[..., self.cap_rhs_rows].add(hrhs)
                if nT:
                    e1, e2 = tl_emfs(state)
                    I = I.at[..., topo.tl_k1].add(e1)
                    I = I.at[..., topo.tl_k2].add(e2)
                return I

        return f

    def mos_vdgs(self, x):
        """Per-MOS terminal voltages (..., nM, 3) ordered (vd, vg, vs)."""
        t = self.topo
        xe = self.x_ext(x)
        return jnp.stack([xe[..., t.mos_ed], xe[..., t.mos_eg],
                          xe[..., t.mos_es]], axis=-1)

    def mosq_linearize(self, params, vdgs, qprev, inv_dt, iprev=None):
        """Charge-model Newton pieces (companion of i = dq/dt): returns
        (g (..., nM, 5, 3), cst (..., nM, 5)) for the 5 terminal
        injections (i_d, i_g, i_s, i_sb, i_db) with i ≈ g·(vd,vg,vs)+cst.
        BE (iprev=None):   g = (dq/dv)/dt,
                           cst = (q(v_k) - q_prev)/dt - g·v_k.
        Trapezoidal (iprev = accepted charge currents of the previous
        step): i_{n+1} = 2(q_{n+1}-q_n)/dt - i_n, so
                           g = 2(dq/dv)/dt,
                           cst = 2(q(v_k)-q_prev)/dt - i_prev - g·v_k.
        qprev: (..., nM, 5) accepted charges of the previous step."""
        from ..models.moscap import charge_jacobian
        q, J = charge_jacobian(vdgs, params)
        theta = 1.0 if iprev is None else 2.0
        g = theta * J * inv_dt
        cst = theta * (q - qprev) * inv_dt \
            - jnp.einsum("...ij,...j->...i", g, vdgs)
        if iprev is not None:
            cst = cst - iprev
        return g, cst

    def assemble_tran_iter(self, G_static, I_static, params, x, t=0.0,
                           qex=None):
        """qex: (qprev, inv_dt) when the charge cap model is active —
        adds the 15 Jacobian + 5 RHS entries per MOS (mq_* patterns)."""
        gvals, rvals = self._nl_vals(params, x, t)
        G = G_static.at[..., self.nl_rows, self.nl_cols].add(gvals)
        I = I_static.at[..., self.nl_rhs_rows].add(rvals)
        if qex is not None:
            gq, cq = self.mosq_linearize(params, self.mos_vdgs(x), *qex)
            G = G.at[..., self.mq_rows, self.mq_cols].add(
                gq.reshape(*gq.shape[:-3], -1))
            I = I.at[..., self.mq_rhs_rows].add(
                -cq.reshape(*cq.shape[:-2], -1))
        return G, I

    # ------------------------------------------------------------------
    # Transient state
    # ------------------------------------------------------------------
    def _state_parts(self, x):
        """(cap-like voltage diffs, inductor currents, inductor voltage
        diffs).  Small circuits: one matmul (gather-free hot path); large
        circuits: static-index gathers (the matmul would be O(N^2))."""
        ncap = self.n_caplike
        nL = len(self.topo.ind_k)
        if self.use_matmul_hotpath:
            s = jnp.einsum("...n,nj->...j", x, self.state_mat)
            return (s[..., :ncap], s[..., ncap:ncap + nL],
                    s[..., ncap + nL:])
        xe = self.x_ext(x)
        vc = xe[..., self.cap_a] - xe[..., self.cap_b]
        il = x[..., self.topo.ind_k]
        vl = xe[..., self.topo.ind_ep] - xe[..., self.topo.ind_em]
        return vc, il, vl

    def trnoise_draw(self, tn, key, salt: int, step, dt):
        """Per-source white-noise values for solver step `step` (1-based,
        t = step·dt): value_s = na_s · N(0,1) drawn at hold index
        j_s = floor(t/nt_s) (nt = 0 → redraw every step), keyed by
        (key, salt, source index, j) so the realization is reproducible
        and constant within a hold window.  tn may carry leading batch
        dims (..., nS, 4): ONE key broadcasts one realization across
        the lanes — independent per-lane realizations come from vmapping
        over split keys (the batched_transient path)."""
        na = tn[..., 0]
        nt = tn[..., 1]
        step_f = jnp.asarray(step, self.dtype)
        j = jnp.where(nt > 0,
                      jnp.floor(step_f * dt / jnp.maximum(nt, 1e-30)),
                      step_f).astype(jnp.int32)
        base = jax.random.fold_in(key, salt)
        nS = tn.shape[-2]

        def one(s, jv):
            k = jax.random.fold_in(jax.random.fold_in(base, s), jv)
            return jax.random.normal(k, (), self.dtype)

        f = jax.vmap(one)
        for _ in range(j.ndim - 1):      # leading lane dims, if any
            f = jax.vmap(f, in_axes=(None, 0))
        vals = f(jnp.arange(nS, dtype=jnp.int32), j)
        return na * vals

    _FLICKER_M = 16    # octave-spaced AR(1) bank depth (covers 2^16 steps)

    def _flicker_coefs(self, tn, dt):
        """Sum-of-Lorentzians 1/f^alpha synthesis: M octave-spaced AR(1)
        processes with corner rates f_m = f_Nyq/2^(m+1) and per-octave
        variances w_m^2 ∝ f_m^(1-alpha) (equal-per-octave at alpha=1),
        normalized so the summed process has total RMS namp.  Returns
        (b (M,), g (nS, M)): per-step pole and stationary per-state std."""
        alpha = tn[..., 2]
        namp = tn[..., 3]
        M = self._FLICKER_M
        m = jnp.arange(M, dtype=self.dtype)
        f = (1.0 / (2.0 * dt)) / (2.0 ** (m + 1.0))
        b = jnp.exp(-2.0 * jnp.pi * f * dt)
        w2 = f ** (1.0 - alpha[..., None])
        w2 = w2 / w2.sum(-1, keepdims=True)
        g = namp[..., None] * jnp.sqrt(w2)
        return b, g

    def flicker_init(self, tn, key, salt: int, dt):
        """Stationary start for the AR(1) bank: x_m ~ N(0, g_m²)."""
        b, g = self._flicker_coefs(tn, dt)
        xi = jax.random.normal(jax.random.fold_in(key, salt), g.shape,
                               self.dtype)
        return g * xi

    def flicker_step(self, tn, key, salt: int, step, dt, x):
        """Advance the AR(1) bank one step: x' = b·x + g·√(1−b²)·ξ with
        ξ keyed by (key, salt, step) — reproducible and scan-free."""
        b, g = self._flicker_coefs(tn, dt)
        base = jax.random.fold_in(key, salt)
        xi = jax.random.normal(jax.random.fold_in(base, step), x.shape,
                               self.dtype)
        return b * x + g * jnp.sqrt(1.0 - b * b) * xi

    def trnoise_stream(self, params, key, step0, n_steps: int, dt,
                       fv=None, fi=None):
        """TRNOISE source values for solver steps step0+1 .. step0+n_steps
        as ONE batched draw — the fused-kernel twin of the per-step state
        carry in init_state/make_update_state: element [i] equals the
        tn_v/tn_i the XLA scan holds entering step step0+1+i, BITWISE
        (the same trnoise_draw / flicker_init / flicker_step calls with
        the same (key, salt, index) threefry keying).

        fv/fi: flicker AR(1) bank states ((nS, M)) as of step step0 —
        pass zeros (or None) when step0 == 0: step 1 selects the
        stationary flicker_init draw, exactly like init_state.  n_steps
        and the flicker presence flags are static.  Returns
        (tnv (n_steps, nSv), tni (n_steps, nSi), fv', fi') with fv'/fi'
        the bank states after step step0+n_steps (feed the next chunk).
        step0 may be a traced int."""
        dtv = jnp.asarray(dt, self.dtype)
        s0 = jnp.asarray(step0, jnp.int32)
        steps = s0 + 1 + jnp.arange(n_steps, dtype=jnp.int32)
        tnv = jax.vmap(lambda s: self.trnoise_draw(
            params["vs_tn"], key, 0, s, dtv))(steps)
        tni = jax.vmap(lambda s: self.trnoise_draw(
            params["is_tn"], key, 1, s, dtv))(steps)
        if self.vs_flicker or self.is_flicker:
            if fv is None and self.vs_flicker:
                fv = jnp.zeros(params["vs_tn"].shape[:-1]
                               + (self._FLICKER_M,), self.dtype)
            if fi is None and self.is_flicker:
                fi = jnp.zeros(params["is_tn"].shape[:-1]
                               + (self._FLICKER_M,), self.dtype)

            def body(carry, s):
                cfv, cfi = carry
                if self.vs_flicker:
                    cfv = jnp.where(
                        s == 1,
                        self.flicker_init(params["vs_tn"], key, 4, dtv),
                        self.flicker_step(params["vs_tn"], key, 4, s,
                                          dtv, cfv))
                if self.is_flicker:
                    cfi = jnp.where(
                        s == 1,
                        self.flicker_init(params["is_tn"], key, 5, dtv),
                        self.flicker_step(params["is_tn"], key, 5, s,
                                          dtv, cfi))
                return (cfv, cfi), (cfv if self.vs_flicker else None,
                                    cfi if self.is_flicker else None)

            (fv, fi), (fvs, fis) = jax.lax.scan(body, (fv, fi), steps)
            if self.vs_flicker:
                tnv = tnv + fvs.sum(-1)
            if self.is_flicker:
                tni = tni + fis.sum(-1)
        # same AD semantics as make_update_state: the realization is not
        # differentiated through the PRNG / amplitude parameters
        sg = jax.lax.stop_gradient
        return sg(tnv), sg(tni), sg(fv) if fv is not None else None, \
            sg(fi) if fi is not None else None

    def init_state(self, x, params=None, dt=None, noise_key=None):
        """TranState from a DC solution (tanalisis.cpp:139-180): cap-like
        voltages and inductor currents; the trapezoidal extras start at the
        DC values i_C = 0, v_L = 0 (caps open / inductors shorted at DC).

        With transmission lines present, `params` and `dt` are required:
        the delay ring buffer (..., Dmax, 2*nT) starts filled with the DC
        waves (the line begins in steady state).

        noise_key (TRNOISE decks): a jax PRNG key enabling transient
        noise — the state then carries this step's per-source noise
        values (tn_v/tn_i), the key, and the step counter; omit it for a
        noise-free (deterministic) run."""
        vc, il, _ = self._state_parts(x)
        state = {"vc": vc, "ic": jnp.zeros_like(vc),
                 "il": il, "vl": jnp.zeros_like(il)}
        if self.mos_charge:
            if params is None:
                raise ValueError("the charge cap model needs "
                                 "init_state(x, params)")
            from ..models.moscap import charges_of_x
            state["qm"] = charges_of_x(self.mos_vdgs(x), params)
            # trapezoidal charge-current history; i = dq/dt = 0 at DC
            state["qi"] = jnp.zeros_like(state["qm"])
        if self.n_tl:
            if params is None or dt is None:
                raise ValueError("transmission lines need init_state(x, "
                                 "params, dt) — the delay ring length is "
                                 "dt-dependent")
            dmax = int(self.tl_ticks(dt).max())
            w = self._tl_wave_now(params, x)             # (..., 2nT)
            state["tlw"] = jnp.broadcast_to(
                w[..., None, :], w.shape[:-1] + (dmax, 2 * self.n_tl))
        if noise_key is not None and self.has_trnoise:
            if params is None or dt is None:
                raise ValueError("TRNOISE needs init_state(x, params, dt, "
                                 "noise_key)")
            dtv = jnp.asarray(dt, self.dtype)
            state["tn_key"] = noise_key
            state["tn_step"] = jnp.asarray(1, jnp.int32)
            state["tn_v"] = self.trnoise_draw(params["vs_tn"], noise_key,
                                              0, 1, dtv)
            state["tn_i"] = self.trnoise_draw(params["is_tn"], noise_key,
                                              1, 1, dtv)
            if self.vs_flicker:
                state["tn_fv"] = self.flicker_init(params["vs_tn"],
                                                   noise_key, 4, dtv)
                state["tn_v"] = state["tn_v"] + state["tn_fv"].sum(-1)
            if self.is_flicker:
                state["tn_fi"] = self.flicker_init(params["is_tn"],
                                                   noise_key, 5, dtv)
                state["tn_i"] = state["tn_i"] + state["tn_fi"].sum(-1)
        return state

    def make_update_state(self, dt, method: str = "be"):
        """Post-step state update.  BE keeps voltages/currents only
        (tanalisis.cpp:379-417); trapezoidal also propagates element
        currents/voltages: i_C' = (2C/dt)(v'-v) - i_C, v_L' = V(p)-V(m)."""
        trap = method == "trap"

        def f(params, x, state):
            vc, il, vl = self._state_parts(x)
            if trap:
                C = self._caplike_C(params)
                gc2 = jnp.where(C > 0.0, 2.0 * C / dt, 0.0)
                ic = gc2 * (vc - state["vc"]) - state["ic"]
                new = {"vc": vc, "ic": ic, "il": il, "vl": vl}
            else:
                zc = jnp.zeros_like(vc)
                new = {"vc": vc, "ic": zc, "il": il,
                       "vl": jnp.zeros_like(il)}
            if self.mos_charge:
                from ..models.moscap import charges_of_x
                new["qm"] = charges_of_x(self.mos_vdgs(x), params)
                if trap:
                    # accepted trap charge current: i' = 2(q'-q)/dt - i
                    new["qi"] = (2.0 / dt) * (new["qm"] - state["qm"]) \
                        - state["qi"]
                else:
                    new["qi"] = jnp.zeros_like(new["qm"])
            if self.n_tl:
                # push this step's waves into slot 0 of the delay ring
                w = self._tl_wave_now(params, x)
                ring = state["tlw"]
                new["tlw"] = jnp.concatenate(
                    [w[..., None, :], ring[..., :-1, :]], axis=-2)
            if "tn_key" in state:
                # TRNOISE: draw the NEXT step's noise values (the draw is
                # keyed by hold index, so lax.stop_gradient keeps reverse
                # AD from trying to differentiate the PRNG)
                key = state["tn_key"]
                nstep = state["tn_step"] + 1
                dtv = jnp.asarray(dt, self.dtype)
                new["tn_key"] = key
                new["tn_step"] = nstep
                new["tn_v"] = jax.lax.stop_gradient(self.trnoise_draw(
                    params["vs_tn"], key, 0, nstep, dtv))
                new["tn_i"] = jax.lax.stop_gradient(self.trnoise_draw(
                    params["is_tn"], key, 1, nstep, dtv))
                if "tn_fv" in state:
                    fv = jax.lax.stop_gradient(self.flicker_step(
                        params["vs_tn"], key, 4, nstep, dtv,
                        state["tn_fv"]))
                    new["tn_fv"] = fv
                    new["tn_v"] = new["tn_v"] + fv.sum(-1)
                if "tn_fi" in state:
                    fi = jax.lax.stop_gradient(self.flicker_step(
                        params["is_tn"], key, 5, nstep, dtv,
                        state["tn_fi"]))
                    new["tn_fi"] = fi
                    new["tn_i"] = new["tn_i"] + fi.sum(-1)
            return new

        return f
