"""Harmonic Balance: frequency-domain periodic steady state.

NEW WORK (the reference's steady-state module is an empty file; this is the
analysis its `.hb f0 nHarm` card names).  Complements the time-domain
shooting method (analysis/sstate.py) with the industry-standard
frequency-domain formulation:

- unknowns are the K = 2H+1 uniform time samples X (K, N) of one period
  (equivalently H harmonics by the DFT bijection for a band-limited signal);
- reactive currents are evaluated *spectrally*: d/dt is the dense K x K
  differentiation operator D = F^-1 diag(j k w) F (exact for band-limited
  waveforms, no finite-difference error and no numerical damping);
- resistive/nonlinear currents are evaluated per time sample with the same
  stamp machinery the transient uses.  A key identity of Newton stamping:
  A(x) x - b(x) equals the exact KCL residual (the linearization constants
  cancel), so the HB residual is one batched assemble + matvec;
- Newton's method on the full (K*N) system; the Jacobian is
  blockdiag_t(A(x_t)) + kron(D, C_struct), with C_struct the
  capacitance/inductance structure matrix;
- transmission lines are EXACT here (unlike the transient's tick-rounded
  delay ring): each line's delayed-wave coupling is the band-limited
  shift operator S_i = D_H(t - s - τ_i) (Dirichlet kernel) applied to the
  other port's wave, equivalent to multiplying harmonic k by e^{-jkω₀τ}
  (_tl_hb_terms; the single-frequency analog is ac.py's phase factor).

Cost: the Jacobian is (K*N)^2 — for dbmixer at H=50 that is a 3131^2 dense
system, entirely feasible on TPU and solved with jnp.linalg.solve (this is
a cold path; the hot transient never builds it).

Initial guess: a few warm-up transient periods, resampled onto the HB time
grid — Newton then converges in a handful of iterations.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.assemble import Engine
from .dc import dc_operating_point
from .transient import transient_step_fn
from ..models import sources as srcmod


@dataclasses.dataclass
class HBResult:
    times: Any       # (K,) sample times in [0, T)
    xs: Any          # (K, N) periodic waveform samples
    freqs: Any       # (H+1,)
    spectrum: Any    # (H+1, N) complex Fourier coefficients
    residual: Any    # final ||KCL residual||
    newton_iters: int
    converged: Any


@dataclasses.dataclass
class HBBatchResult:
    times: Any       # (K,)
    xs: Any          # (B, K, N) per-lane periodic samples
    freqs: Any       # (H+1,)
    spectrum: Any    # (B, H+1, N) complex one-sided coefficients
    residual: Any    # (B,) final ||KCL residual|| per lane
    converged: Any   # (B,) bool


def spectral_diff_matrix(K: int, T: float) -> np.ndarray:
    """Dense d/dt operator for K uniform samples of a T-periodic signal."""
    F = np.fft.rfft(np.eye(K), axis=0)            # (H+1, K)
    w = 2.0 * np.pi / T
    kvec = np.arange(F.shape[0]) * w
    D = np.fft.irfft(1j * kvec[:, None] * F, n=K, axis=0)  # (K, K)
    return D


def _tl_hb_terms(engine: Engine, params, ts, n_harm: int, f0: float):
    """Transmission-line pieces of the HB system.  Delays are EXACT in
    the frequency domain, so HB is the natural home for the T card
    (reference model: Branin two-port, netlist/parser.py _parse_tline;
    the single-frequency analog is the AC stamp, analysis/ac.py:96-126).

    Returns (corr_rows, corr_cols, corr_vals, S):
    - corr_* patch the static conductance matrix: cancel the
      DC-degenerate stamps that dc_static_entries bakes in (V1=V2,
      i1=-i2 — wrong at AC) and stamp the own-port Branin branch rows
      V(p)-V(n) - Z0·i instead (the tl_tran_* pattern);
    - S (n_tl, K, K) are per-line band-limited delay operators,
      S_i[t,s] = D_H(t_t - t_s - τ_i) with D_H the order-H Dirichlet
      kernel, so (S_i @ w)(t) = w(t - τ_i) exactly for any signal in
      the HB harmonic space.  Differentiable in tl_td/tl_z0 (the
      sensitivity path, hb_diff.py, flows through params)."""
    z0 = params["tl_z0"]
    td = params["tl_td"]
    dtype = engine.dtype
    one = jnp.ones_like(z0)
    corr_rows = np.concatenate([engine.tl_dc_rows, engine.tl_tran_rows])
    corr_cols = np.concatenate([engine.tl_dc_cols, engine.tl_tran_cols])
    own = jnp.stack([one, -one, -z0, one, -one, -z0],
                    axis=-1).reshape(-1)
    corr_vals = jnp.concatenate([-engine.tl_dc_vals, own])
    K = ts.shape[0]
    w0 = 2.0 * np.pi * f0
    dts = ts[:, None] - ts[None, :]                    # (K, K)
    arg = w0 * (dts[None, :, :] - td[:, None, None])   # (n_tl, K, K)
    k = jnp.arange(1, int(n_harm) + 1, dtype=dtype)
    S = (1.0 + 2.0 * jnp.sum(
        jnp.cos(k[:, None, None, None] * arg[None]), axis=0)) / K
    return corr_rows, corr_cols, corr_vals, S


def _tl_residual_delay(engine: Engine, params, S, X, res):
    """Subtract the spectrally-delayed other-port waves from the branch
    rows: k1 loses w2(t-τ) = V(p2)-V(n2)+Z0·I2 delayed (and k2 ↔ w1).
    S is (n_tl, Kt, Kt) — single-tone shifts or the hbmulti kron of
    per-axis shifts; X, res are (Kt, N)."""
    t = engine.topo
    z0 = params["tl_z0"]
    Xe = engine.x_ext(X)
    w1 = Xe[:, t.tl_ep1] - Xe[:, t.tl_em1] + z0 * X[:, t.tl_k1]
    w2 = Xe[:, t.tl_ep2] - Xe[:, t.tl_em2] + z0 * X[:, t.tl_k2]
    u1 = jnp.einsum("its,si->ti", S, w1)
    u2 = jnp.einsum("its,si->ti", S, w2)
    return res.at[:, t.tl_k1].add(-u2).at[:, t.tl_k2].add(-u1)


def _tl_add_jacobian_blocks(engine: Engine, params, S, J):
    """Scatter the delayed-coupling derivative blocks (coef · S_i) into
    the (Kt, N, Kt, N) HB Jacobian tensor (∂ of _tl_residual_delay)."""
    t = engine.topo
    z0 = params["tl_z0"]
    N = J.shape[1]
    for i in range(engine.n_tl):
        Si = S[i]
        for row, cols in (
                (int(t.tl_k1[i]), (int(t.tl_ep2[i]), int(t.tl_em2[i]),
                                   int(t.tl_k2[i]))),
                (int(t.tl_k2[i]), (int(t.tl_ep1[i]), int(t.tl_em1[i]),
                                   int(t.tl_k1[i])))):
            for c, coef in zip(cols, (-1.0, 1.0, -z0[i])):
                if c < N:    # ground column drops out
                    J = J.at[:, row, :, c].add(coef * Si)
    return J


def _reactive_structure(engine: Engine, params, x_op=None,
                        base_only: bool = False):
    """C_struct (N, N): node rows get the capacitor patterns (+C at (a,a),
    -C at (a,b), ...), inductor branch rows get -L on the diagonal, so that
    r += C_struct @ dx/dt completes KCL/branch equations.

    Under the charge cap model (mos_cap_model='charge') the structure is
    state-dependent: pass x_op to linearize the MOS trans-capacitances
    dq_t/dv_j there (small-signal consumers: .PZ, loop gain), or pass
    base_only=True to get everything EXCEPT the MOS charges (the fixed
    lumps are already zeroed by _caplike_C under this model) — the
    large-signal consumers (HB/PAC/envelope/PSP) then add the per-sample
    charge terms themselves (_mos_charge_pieces)."""
    if getattr(engine, "mos_charge", False) and x_op is None \
            and not base_only:
        raise NotImplementedError(
            "state-dependent C structure: pass x_op (small-signal) or "
            "base_only=True + per-sample charge terms (large-signal)")
    N = engine.N
    C = engine._caplike_C(params)
    cvals = jnp.stack([C, C, -C, -C], axis=-1).reshape(*C.shape[:-1], -1)
    M = jnp.zeros(C.shape[:-1] + (N + 1, N + 1), engine.dtype)
    M = M.at[..., engine.cap_rows, engine.cap_cols].add(cvals)
    t = engine.topo
    if len(t.ind_k):
        M = M.at[..., t.ind_k, t.ind_k].add(-params["ind_l"])
    if len(t.mut_a):
        mm = engine._mutual_M(params)
        M = M.at[..., engine.mut_rows, engine.mut_cols].add(
            -jnp.concatenate([mm, mm], axis=-1))
    if getattr(engine, "mos_charge", False) and x_op is not None:
        from ..models.moscap import charge_jacobian
        _, Jq = charge_jacobian(engine.mos_vdgs(x_op), params)
        M = M.at[..., engine.mq_rows, engine.mq_cols].add(
            Jq.reshape(*Jq.shape[:-3], -1))
    return M[..., :N, :N]


def _mos_charge_pieces(engine: Engine, params, X):
    """Per-sample MOS charge pieces for the harmonic-domain residuals
    under mos_cap_model='charge': given X (K, N) samples, returns
      qvec (K, N)   — the node-scattered terminal charges q(x_k)
      Cq   (K, N, N) — their exact Jacobians dq/dv at each sample
    so that the reactive residual term is D @ qvec (spectral d/dt of the
    charge waveform) and the Jacobian picks up D[t,s]·Cq[s] blocks —
    charge conservation carries over to HB exactly (the reference has no
    steady-state analysis at all, SURVEY.md 2.13)."""
    from ..models.moscap import charge_jacobian
    N = engine.N

    def one(x_t):
        q, Jq = charge_jacobian(engine.mos_vdgs(x_t), params)
        qv = jnp.zeros((N + 1,), engine.dtype).at[
            engine.mq_rhs_rows].add(q.reshape(-1))
        Cq = jnp.zeros((N + 1, N + 1), engine.dtype).at[
            engine.mq_rows, engine.mq_cols].add(Jq.reshape(-1))
        return qv[:N], Cq[:N, :N]

    return jax.vmap(one)(X)


def make_hb_system(engine: Engine, f0: float, n_harm: int,
                  gmin: float = 0.0):
    """Params-parametric HB system on the K = 2H+1 collocation grid.

    Returns (ts, residual, jacobian):
      residual(X, params, with_At=False) -> (K, N) KCL residual
        [or (res, A_t) with the per-sample conductance blocks]
      jacobian(A_t, params) -> (K·N, K·N) = blockdiag(A_t) + kron(D, C)

    Shared by the Newton solver below (which closes over one params)
    and the implicit-differentiation sensitivities (analysis/hb_diff.py,
    which differentiates THROUGH params)."""
    dtype = engine.dtype
    N = engine.N
    T = 1.0 / f0
    K = 2 * int(n_harm) + 1
    D = jnp.asarray(spectral_diff_matrix(K, T), dtype)
    ts = jnp.arange(K, dtype=dtype) * (T / K)

    mos_q = bool(getattr(engine, "mos_charge", False))

    def residual(X, params, with_At: bool = False):
        C_struct = _reactive_structure(engine, params, base_only=mos_q)

        def sources_rhs(t):
            vval = srcmod.eval_tran_static_kinds(
                engine.vs_kinds, params["vs_dc"], params["vs_pulse"],
                params["vs_sin"], params["vs_pwl_t"],
                params["vs_pwl_v"], params["vs_pwl_n"], t)
            ival = srcmod.eval_tran_static_kinds(
                engine.is_kinds, params["is_dc"], params["is_pulse"],
                params["is_sin"], params["is_pwl_t"],
                params["is_pwl_v"], params["is_pwl_n"], t)
            zeros_l = jnp.zeros(params["ind_l"].shape, dtype)
            zeros_c = jnp.zeros(engine._caplike_C(params).shape, dtype)
            parts = [vval, ival, zeros_l, zeros_c]
            if engine.n_tl:
                # the delayed-wave EMF slots are zero here: the delay is
                # applied spectrally (see the S blocks below), not via the
                # transient ring's RHS
                parts.append(jnp.zeros((2 * engine.n_tl,), dtype))
            terms = jnp.concatenate(parts, axis=-1)
            return jnp.einsum("...j,jn->...n", terms, engine.rhs_mat)

        b_src = jax.vmap(sources_rhs)(ts)
        rows, cols, svals = engine.dc_static_entries(params)
        A_res = jnp.zeros((N + 1, N + 1), dtype).at[rows, cols].add(svals)
        if engine.n_tl:
            cr, cc, cv, _ = _tl_hb_terms(engine, params, ts, n_harm, f0)
            A_res = A_res.at[cr, cc].add(cv)
        A_res = A_res.at[engine.topo.node_eqs,
                         engine.topo.node_eqs].add(
            jnp.full(len(engine.topo.node_eqs), gmin, dtype))
        A_res = A_res[:N, :N]

        def assemble_t(x_t, t_t):
            gvals, rvals = engine._nl_vals(params, x_t, t_t)
            A = jnp.zeros((N + 1, N + 1), dtype)
            A = A.at[engine.nl_rows, engine.nl_cols].add(gvals)
            b = jnp.zeros((N + 1,), dtype).at[engine.nl_rhs_rows].add(
                rvals)
            return A_res + A[:N, :N], b[:N]

        A_t, b_nl = jax.vmap(assemble_t)(X, ts)
        res_cond = jnp.einsum("tij,tj->ti", A_t, X) - b_nl - b_src
        res_reac = jnp.einsum("ij,tj->ti", C_struct, D @ X)
        res = res_cond + res_reac
        if engine.n_tl:
            _, _, _, S = _tl_hb_terms(engine, params, ts, n_harm, f0)
            res = _tl_residual_delay(engine, params, S, X, res)
        if mos_q:
            # charge model: the MOS reactive current is the spectral
            # time-derivative of the charge WAVEFORM, D @ q(x) — exact
            # charge conservation on the period grid.  The Jacobian
            # needs the per-sample trans-capacitances, so with_At
            # returns (A_t, Cq_t) as the second element.
            qvec, Cq_t = _mos_charge_pieces(engine, params, X)
            res = res + D @ qvec
            return (res, (A_t, Cq_t)) if with_At else res
        return (res, A_t) if with_At else res

    def jacobian(A_t, params):
        C_struct = _reactive_structure(engine, params, base_only=mos_q)
        if mos_q:
            A_t, Cq_t = A_t
            # d(D @ q)[t]/dx[s] = D[t,s] * Cq(x_s): column-sample blocks
            J = jnp.einsum("ts,ij->tisj", D, C_struct) \
                + jnp.einsum("ts,sij->tisj", D, Cq_t)
        else:
            J = jnp.einsum("ts,ij->tisj", D, C_struct)
        tid = jnp.arange(K)
        J = J.at[tid, :, tid, :].add(A_t)
        if engine.n_tl:
            _, _, _, S = _tl_hb_terms(engine, params, ts, n_harm, f0)
            J = _tl_add_jacobian_blocks(engine, params, S, J)
        return J.reshape(K * N, K * N)

    return ts, residual, jacobian


def _hb_trig_mats(K: int, H: int, T: float):
    """Real one-sided DFT analysis/synthesis matrices on the K = 2H+1
    uniform grid: Fc/Fs (H+1, K) give cosine/sine coefficients, Ic/Is
    (K, H+1) synthesize samples.  Matmul-based "FFT": K is small, the
    MXU eats K×K matmuls, and it keeps the on-device program complex-free
    (the axon backend's complex support is unreliable — see the host-side
    rfft note in harmonic_balance)."""
    tsn = np.arange(K) * (T / K)
    th = (2.0 * np.pi / T) * np.outer(np.arange(H + 1), tsn)  # (H+1, K)
    c, s = np.cos(th), np.sin(th)
    scale = np.full((H + 1, 1), 2.0 / K)
    scale[0, 0] = 1.0 / K
    return c * scale, s * scale, c.T, s.T


def _hb_freq_precond(engine: Engine, params, omegas, aux, trig):
    """Block-circulant preconditioner for matrix-free HB (the classic
    frequency-domain block-diagonal of Telichevesky/Kundert, DAC'95):
    approximate the HB Jacobian J = blockdiag_t(A(x_t)) + kron(D, C) by
    replacing the time-varying conductance with its period average
    Ā = mean_t A(x_t).  That approximation is block-circulant in time,
    so it diagonalizes per harmonic: in the real one-sided basis the
    k-th block is the 2N×2N real embedding of Ā + jkω₀·C̄,

        M_k = [[Ā,  Ω_k·C̄], [−Ω_k·C̄,  Ā]],   M_0 = Ā,

    all LU-factored once per Newton iteration (H·(2N)³ — trivial next to
    the dense path's (KN)³).  `omegas` (P,) are the angular frequencies
    of the P non-DC basis rows — k·ω₀ for single-tone HB, the half-space
    grid combinations Σ_d k_d ω_d for the multi-tone MPDE grid (any
    Ω_k ≤ 0 from mixing products is fine: the block stays nonsingular
    while Ā is).  `aux` is the with_At=True payload of the HB residual:
    A_t, or (A_t, Cq_t) under the charge cap model, in which case C̄
    also averages the per-sample MOS trans-capacitances.
    Transmission-line delayed-wave coupling is deliberately left out of
    M (GMRES handles it); the static tl_dc part is already inside A_t.

    Returns apply_M(v): (K, N) -> (K, N), the action of M⁻¹."""
    import jax.scipy.linalg as jsl
    dtype = engine.dtype
    N = engine.N
    if isinstance(aux, tuple):
        A_t, Cq_t = aux
        Cbar = _reactive_structure(engine, params, base_only=True) \
            + jnp.mean(Cq_t, axis=0)
    else:
        A_t = aux
        Cbar = _reactive_structure(engine, params)
    Abar = jnp.mean(A_t, axis=0)
    # Singularity guard: a node with no DC conduction path (purely
    # capacitive, gmin=0) makes the DC block M_0 = Abar exactly
    # singular, and an inf/NaN apply_M would silently stall GMRES where
    # the dense path (regularized by kron(D, C)) converges.  A tiny
    # norm-scaled diagonal shift keeps the preconditioner finite; M is
    # only a preconditioner, so the shift costs iterations at worst,
    # never correctness.
    shift = jnp.asarray(1e-9, dtype) * (1.0 + jnp.max(jnp.abs(Abar)))
    Abar = Abar + shift * jnp.eye(N, dtype=dtype)
    lu0 = jsl.lu_factor(Abar)
    P = omegas.shape[0]
    kw = jnp.asarray(omegas, dtype)[:, None, None]
    Ab = jnp.broadcast_to(Abar, (P, N, N))
    Cb = kw * jnp.broadcast_to(Cbar, (P, N, N))
    Mk = jnp.concatenate([jnp.concatenate([Ab, Cb], axis=2),
                          jnp.concatenate([-Cb, Ab], axis=2)], axis=1)
    luk = jax.vmap(jsl.lu_factor)(Mk)
    Fc, Fs, Ic, Is = (jnp.asarray(m, dtype) for m in trig)

    def apply_M(v):
        a = Fc @ v                                   # (H+1, N)
        b = Fs @ v
        y0 = jsl.lu_solve(lu0, a[0])
        y = jax.vmap(jsl.lu_solve)(
            luk, jnp.concatenate([a[1:], b[1:]], axis=1))
        ca = jnp.concatenate([y0[None], y[:, :N]], axis=0)
        cb = jnp.concatenate([jnp.zeros((1, N), dtype), y[:, N:]],
                             axis=0)
        return Ic @ ca + Is @ cb

    return apply_M


def harmonic_balance(engine: Engine, params, f0: float,
                     n_harm: int = 8,
                     warmup_periods: int = 6,
                     max_newton: int = 30,
                     tol: float = 1e-9,
                     gmin: float = 0.0,
                     damping: float = 1.0,
                     solver: str = "dense",
                     gmres_tol: float = 1e-4,
                     gmres_restart: int = 40,
                     gmres_maxiter: int = 4):
    """Solve the periodic steady state in the frequency domain.

    solver='dense' (default) forms the (K·N)² Jacobian and solves it
    directly — right for small KN (it is one MXU-friendly batched solve).
    solver='gmres' never forms the Jacobian: each Newton step solves
    J·dX = −r matrix-free (J·v via jax.jvp through the exact KCL
    residual, so T-line delay blocks and charge-model trans-capacitances
    are included automatically) with restarted GMRES, preconditioned by
    the frequency-domain block-circulant M of _hb_freq_precond.  Cost per
    Newton drops from O((KN)³) to O(H·(2N)³ + n_gmres·K·N²) — the
    standard matrix-free HB scaling (Telichevesky/Kundert) that makes
    large H×N products tractable.  gmres_tol is the inexact-Newton
    relative tolerance of the inner solve (looser ⇒ more Newton steps,
    cheaper steps)."""
    opts = engine.opts
    dtype = engine.dtype
    N = engine.N
    T = 1.0 / f0
    H = int(n_harm)
    K = 2 * H + 1

    # params-parametric system shared with the sensitivity path
    ts, residual_p, jacobian_p = make_hb_system(engine, f0, n_harm,
                                                gmin=gmin)
    residual = lambda X: residual_p(X, params, with_At=True)
    jacobian = lambda A_t: jacobian_p(A_t, params)

    # ---- initial guess: warm-up transient, resampled to the HB grid ----
    steps_per_period = max(4 * K, 64)
    dt_w = jnp.asarray(T / steps_per_period, dtype)
    step = transient_step_fn(engine, params, dt_w)
    x0 = dc_operating_point(engine, params)
    state = engine.init_state(x0, params, dt_w)
    carry = (x0, state, jnp.zeros(x0.shape[:-1], bool))
    tw = (jnp.arange(1, warmup_periods * steps_per_period + 1, dtype=dtype)
          * dt_w)

    def wstep(c, t):
        c, (xo, _) = step(c, t)
        return c, xo

    carry, xs_w = jax.jit(lambda c, t: lax.scan(wstep, c, t))(carry, tw)
    last = xs_w[-steps_per_period:]
    idx = (np.arange(K) * steps_per_period) // K
    X = last[idx]

    # ---- Newton on the full spectrum ----
    if solver == "dense":
        @jax.jit
        def newton(X):
            # full-f32 matmuls: the MXU's bf16 default floors the HB
            # residual on TPU (measured 4e-5 vs 8.5e-8 pinned on the
            # dbmixer deck) — same failure mode the batched HB factory
            # pins against; free at these sizes
            with jax.default_matmul_precision("highest"):
                r, A_t = residual(X)
                J = jacobian(A_t)
                dX = jnp.linalg.solve(J, -r.reshape(-1)).reshape(K, N)
                return X + damping * dX, jnp.linalg.norm(r)
    elif solver == "gmres":
        from jax.scipy.sparse.linalg import gmres as _gmres
        trig = _hb_trig_mats(K, H, T)

        @jax.jit
        def newton(X):
            # full-f32 matmuls: GMRES orthogonalization collapses under
            # the MXU's bf16 default (same failure mode as the batched
            # HB factory — see docs/performance.md)
            with jax.default_matmul_precision("highest"):
                r, aux = residual(X)
                omegas = (jnp.arange(1, H + 1, dtype=dtype)
                          * jnp.asarray(2.0 * np.pi * f0, dtype))
                apply_M = _hb_freq_precond(engine, params, omegas, aux,
                                           trig)

                def jv(v):
                    return jax.jvp(lambda Xv: residual_p(Xv, params),
                                   (X,), (v,))[1]

                dX, _ = _gmres(jv, -r, M=apply_M, tol=gmres_tol,
                               atol=0.0, restart=gmres_restart,
                               maxiter=gmres_maxiter,
                               solve_method="batched")
                return X + damping * dX, jnp.linalg.norm(r)
    else:
        raise ValueError(f"unknown HB solver {solver!r} "
                         "(expected 'dense' or 'gmres')")

    res_norm = jnp.inf
    best = np.inf
    stall = 0
    iters = 0
    for i in range(max_newton):
        X_new, res_norm = newton(X)
        iters = i + 1
        if not bool(jnp.isfinite(res_norm)):
            break
        X = X_new
        if float(res_norm) < tol:
            break
        # floating-point floor: once an already-small residual stops
        # improving against the best seen for TWO consecutive
        # iterations, further Newton steps only burn (KN)-sized solves.
        # (best < 1e-3 keeps transient humps of a far-from-converged
        # path from breaking early; the two-strike rule keeps a single
        # non-monotone hump between tol and 1e-3 from stopping a run
        # the old loop would have finished)
        if i >= 2 and float(res_norm) >= best and best < 1e-3:
            stall += 1
            if stall >= 2:
                break
        else:
            stall = 0
        best = min(best, float(res_norm))

    @jax.jit
    def _final_res(X):
        with jax.default_matmul_precision("highest"):
            r, _ = residual(X)
            return jnp.linalg.norm(r)

    final = _final_res(X)

    # host-side FFT: keeps every on-device program complex-free (the axon
    # TPU backend's complex support is unreliable)
    fft = np.fft.rfft(np.asarray(X), axis=0) / K
    coeffs = fft * 2.0
    coeffs[0] /= 2.0
    freqs = jnp.arange(H + 1, dtype=dtype) * f0

    return HBResult(times=ts, xs=X, freqs=freqs, spectrum=coeffs,
                    residual=final, newton_iters=iters,
                    converged=final < max(tol * 100, 1e-6))


def _hb_lane_chunk(KN: int, B: int, solver: str, itemsize: int) -> int:
    """Auto-sized lane chunking for the batched HB factories (r5,
    VERDICT item 6 — replaces the manual CSIM_HB_LANE_CHUNK workflow).

    The dense path's per-lane working set is dominated by the (KN, KN)
    Jacobian and the batched LU's workspace copies; a whole-batch
    dispatch at dbmixer scale (KN=527, f32) faults the axon device at
    B=64 while B=32 runs — i.e. the tolerable live set is ~200-250 MB
    with a ~6x LU workspace factor.  The estimate (the
    pallas_step._vmem_estimate pattern, HBM flavor) picks the largest
    power-of-two chunk under CSIM_HB_WORKSET_MB (default 256) and
    chunks only when B exceeds it — small-KN decks (rectifier KN=45 at
    B=1024) stay unchunked, where measured chunking cost 4.8x
    throughput.  CSIM_HB_LANE_CHUNK, when set, still overrides (0 =
    force unchunked); the GMRES path never forms J and is not
    auto-chunked.  Returns 0 for "no chunking", else the chunk size."""
    import os as _os
    env = _os.environ.get("CSIM_HB_LANE_CHUNK")
    if env is not None:
        c = int(env)
        return c if (c and B > c) else 0
    if solver != "dense" or jax.default_backend() != "tpu":
        return 0
    per_lane = 6 * KN * KN * itemsize
    budget = int(_os.environ.get("CSIM_HB_WORKSET_MB", 256)) * (1 << 20)
    c = max(1, budget // per_lane)
    c = 1 << (int(c).bit_length() - 1)
    return c if B > c else 0


def make_hb_batched_fn(engine: Engine, f0: float,
                       n_harm: int = 8,
                       warmup_periods: int = 6,
                       n_newton: int = 15,
                       tol: float = 1e-9,
                       gmin: float = 0.0,
                       damping: float = 1.0,
                       solver: str = "dense",
                       gmres_tol: float = 1e-4,
                       gmres_restart: int = 40,
                       gmres_maxiter: int = 4):
    """Factory for the batched-HB jitted program: returns (ts, fn) where
    fn(bparams, x0s) -> (Xs, finals) is ONE jit whose compilation is
    reused across calls with the same shapes (harmonic_balance_batched
    re-closes over a fresh jit every call; benchmarks need the warm
    path).  See harmonic_balance_batched for semantics.

    solver='gmres': each lane's Newton inner solve is the matrix-free
    preconditioned GMRES of harmonic_balance — the per-lane (KN)² dense
    Jacobian (64 MB/lane at KN=4k) never exists, so Monte-Carlo HB
    scales to harmonic-count × node-count products batched dense solves
    cannot hold in HBM."""
    if solver not in ("dense", "gmres"):
        raise ValueError(f"unknown HB solver {solver!r} "
                         "(expected 'dense' or 'gmres')")
    from .transient import transient_step_fn
    dtype = engine.dtype
    N = engine.N
    T = 1.0 / f0
    H = int(n_harm)
    K = 2 * H + 1
    ts, residual_p, jacobian_p = make_hb_system(engine, f0, n_harm,
                                                gmin=gmin)
    steps_per_period = max(4 * K, 64)
    dt_w = jnp.asarray(T / steps_per_period, dtype)
    idx = (np.arange(K) * steps_per_period) // K
    if solver == "gmres":
        from jax.scipy.sparse.linalg import gmres as _gmres
        trig = _hb_trig_mats(K, H, T)
        omegas_j = (jnp.arange(1, H + 1, dtype=dtype)
                    * jnp.asarray(2.0 * np.pi * f0, dtype))

    def one_lane(p, x0):
        step = transient_step_fn(engine, p, dt_w)
        state = engine.init_state(x0, p, dt_w)
        carry = (x0, state, jnp.zeros(x0.shape[:-1], bool))
        tw = (jnp.arange(1, warmup_periods * steps_per_period + 1,
                         dtype=dtype) * dt_w)

        def wstep(c, t):
            c, (xo, _) = step(c, t)
            return c, xo

        _, xs_w = lax.scan(wstep, carry, tw)
        X = xs_w[-steps_per_period:][idx]

        def newton(c, _):
            X, done = c
            r, aux = residual_p(X, p, with_At=True)
            if solver == "dense":
                J = jacobian_p(aux, p)
                dX = jnp.linalg.solve(J, -r.reshape(-1)).reshape(K, N)
            else:
                apply_M = _hb_freq_precond(engine, p, omegas_j, aux,
                                           trig)

                def jv(v):
                    return jax.jvp(lambda Xv: residual_p(Xv, p),
                                   (X,), (v,))[1]

                dX, _ = _gmres(jv, -r, M=apply_M, tol=gmres_tol,
                               atol=0.0, restart=gmres_restart,
                               maxiter=gmres_maxiter,
                               solve_method="batched")
            resn = jnp.linalg.norm(r)
            finite = jnp.isfinite(resn) & jnp.all(jnp.isfinite(dX))
            upd = (~done) & finite
            X = jnp.where(upd, X + damping * dX, X)
            done = done | (resn < tol) | ~finite
            return (X, done), None

        (X, _), _ = lax.scan(newton, (X, jnp.asarray(False)), None,
                             length=n_newton)
        final = jnp.linalg.norm(residual_p(X, p))
        return X, final

    def batched(bp, x0s):
        # pin full-f32 matmuls: the TPU MXU's default bf16 passes put the
        # dbmixer residual floor ~1e-3 (0/32 lanes "converged"); HIGHEST
        # reaches the 8.5e-8 CPU-f32 floor at the same wall time (the
        # KN^2 solves are not matmul-throughput-bound at these sizes)
        with jax.default_matmul_precision("highest"):
            B = x0s.shape[0]
            c = _hb_lane_chunk(K * N, B, solver, jnp.dtype(dtype).itemsize)
            if not c:
                return jax.vmap(one_lane)(bp, x0s)
            # CSIM_HB_LANE_CHUNK: big-KN decks fault the axon device at
            # B=64 (whole-batch working set); lax.map over lane chunks
            # keeps ONE jitted dispatch while bounding the live set to
            # `c` lanes.  A non-divisor B pads by repeating lane 0 (the
            # pad lanes solve redundantly and are sliced off) — silently
            # dropping the chunk request would re-fault the device.
            pad = (-B) % c
            if pad:
                bp = jax.tree.map(
                    lambda a: jnp.concatenate(
                        [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])]),
                    bp)
                x0s = jnp.concatenate(
                    [x0s, jnp.broadcast_to(x0s[:1], (pad,) + x0s.shape[1:])])
            Bp = B + pad
            bpc = jax.tree.map(
                lambda a: a.reshape(Bp // c, c, *a.shape[1:]), bp)
            x0c = x0s.reshape(Bp // c, c, *x0s.shape[1:])
            Xs, fin = jax.lax.map(
                lambda t: jax.vmap(one_lane)(*t), (bpc, x0c))
            return (Xs.reshape(Bp, *Xs.shape[2:])[:B],
                    fin.reshape(Bp, *fin.shape[2:])[:B])

    return ts, jax.jit(batched)


def harmonic_balance_batched(engine: Engine, bparams, f0: float,
                             n_harm: int = 8,
                             warmup_periods: int = 6,
                             n_newton: int = 15,
                             tol: float = 1e-9,
                             gmin: float = 0.0,
                             damping: float = 1.0,
                             x0s=None,
                             solver: str = "dense",
                             **solver_kw) -> HBBatchResult:
    """Monte-Carlo harmonic balance: B perturbed lanes solve as ONE
    batched program — warm-up transients, K·N HB Newton systems and the
    dense (K·N)² solves all vmap over the lane axis (batched dense
    linear algebra is exactly the MXU's shape).  Per-lane freeze: a
    converged or non-finite lane stops updating instead of poisoning the
    batch (same contract as parallel/montecarlo.batched_transient).

    bparams: params pytree with a leading lane axis (perturb_params).
    x0s: optional (B, N) DC operating points (defaults to the natively
    batched DC).  Fixed n_newton iterations (no host-side convergence
    polling — the whole run is one jitted program); `converged` reports
    per-lane success."""
    dtype = engine.dtype
    H = int(n_harm)
    K = 2 * H + 1
    if x0s is None:
        from ..parallel.montecarlo import batched_dc_fast
        x0s = batched_dc_fast(engine, bparams)
    ts, fn = make_hb_batched_fn(engine, f0, n_harm=n_harm,
                                warmup_periods=warmup_periods,
                                n_newton=n_newton, tol=tol, gmin=gmin,
                                damping=damping, solver=solver,
                                **solver_kw)
    Xs, finals = fn(bparams, x0s)

    # host-side FFT (complex-free device programs; see harmonic_balance)
    fft = np.fft.rfft(np.asarray(Xs), axis=1) / K
    coeffs = fft * 2.0
    coeffs[:, 0] /= 2.0
    finals = np.asarray(finals)
    return HBBatchResult(times=ts, xs=Xs,
                         freqs=jnp.arange(H + 1, dtype=dtype) * f0,
                         spectrum=coeffs, residual=finals,
                         converged=finals < max(tol * 100, 1e-6))
