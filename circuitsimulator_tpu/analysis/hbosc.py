"""Autonomous harmonic balance: oscillator steady state in the frequency
domain, with the fundamental f0 as a Newton unknown.

NEW WORK (the reference's steady-state module is an empty file; SURVEY §2
item 2.13).  The frequency-domain twin of the time-domain shooting solver
(analysis/sstate.py oscillator_steady_state), and the only oscillator
path that supports transmission lines: the shooting propagator's delay
ring is dt-dependent (ring length = round(τ/dt) ticks, a compile-time
constant), so it cannot trace through a period unknown — while in the
harmonic space the delay is the exact phase factor e^{-jkω₀τ}
(hb._tl_hb_terms), smooth in ω₀.  Delay-line and distributed-resonator
oscillators are therefore solved here.

Formulation: unknowns u = [X (K·N collocation samples), f0].
  - HB residual with every f0 dependence traced: the spectral
    differentiation matrix scales linearly (D(f0) = f0·D(1)), the sample
    times are t_i = i/(K f0), and the T-line shifts carry 2π f0 τ.
  - One phase-anchor equation removes the time-shift null direction:
    the cosine part of the anchor node's fundamental is pinned to zero,
    matching the initial guess, which is sampled starting at an upward
    mean-crossing (sin-aligned ⇒ cos-part ≈ 0 and transversal).
  - The (K·N+1)² bordered Jacobian is the analytic HB Jacobian plus the
    ∂r/∂f0 column from one jvp and the anchor's cos-projection row.

Initial guess: kicked transient warm-up at the guessed period
(trapezoidal, lu — osc_engine), period re-estimated from the anchor's
last upward mean-crossings, last period resampled onto the K-point grid.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.assemble import Engine
from ..ops.lu import lu_solve
from ..models import sources as srcmod
from .dc import dc_operating_point
from .hb import (spectral_diff_matrix, _reactive_structure, _tl_hb_terms,
                 _tl_residual_delay, _tl_add_jacobian_blocks)
from .sstate import osc_engine


@dataclasses.dataclass
class HBOscResult:
    f0: Any          # solved fundamental (Hz)
    times: Any       # (K,) sample times in [0, T)
    xs: Any          # (K, N) periodic waveform samples
    freqs: Any       # (H+1,)
    spectrum: Any    # (H+1, N) complex one-sided Fourier coefficients
    residual: Any
    newton_iters: int
    converged: Any


def make_hb_system_auto(engine: Engine, n_harm: int, gmin: float = 0.0):
    """residual(X, f0, params, with_At=False): the HB residual with f0
    TRACED (autonomous form) — mirrors hb.make_hb_system, which fixes f0
    statically.  jacobian(A_t, f0, params) is ∂r/∂X."""
    dtype = engine.dtype
    N = engine.N
    H = int(n_harm)
    K = 2 * H + 1
    D1 = jnp.asarray(spectral_diff_matrix(K, 1.0), dtype)  # D(f0) = f0·D1
    # MOSCAP=CHARGE: same per-sample charge treatment as hb.make_hb_system
    # — the reactive term is f0·(D1 @ q(x)) so the charge waveform's
    # spectral derivative stays EXACT with f0 traced (∂r/∂f0 picks up
    # D1 @ q via the jvp in the bordered Newton automatically).
    mos_q = bool(getattr(engine, "mos_charge", False))

    def residual(X, f0, params, with_At: bool = False):
        ts = jnp.arange(K, dtype=dtype) / (K * f0)
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
        res_reac = f0 * jnp.einsum("ij,tj->ti", C_struct, D1 @ X)
        res = res_cond + res_reac
        if engine.n_tl:
            _, _, _, S = _tl_hb_terms(engine, params, ts, n_harm, f0)
            res = _tl_residual_delay(engine, params, S, X, res)
        if mos_q:
            from .hb import _mos_charge_pieces
            qvec, Cq_t = _mos_charge_pieces(engine, params, X)
            res = res + f0 * (D1 @ qvec)
            return (res, (A_t, Cq_t)) if with_At else res
        return (res, A_t) if with_At else res

    def jacobian(A_t, f0, params):
        C_struct = _reactive_structure(engine, params, base_only=mos_q)
        J = f0 * jnp.einsum("ts,ij->tisj", D1, C_struct)
        if mos_q:
            A_t, Cq_t = A_t
            J = J + f0 * jnp.einsum("ts,sij->tisj", D1, Cq_t)
        tid = jnp.arange(K)
        J = J.at[tid, :, tid, :].add(A_t)
        if engine.n_tl:
            ts = jnp.arange(K, dtype=dtype) / (K * f0)
            _, _, _, S = _tl_hb_terms(engine, params, ts, n_harm, f0)
            J = _tl_add_jacobian_blocks(engine, params, S, J)
        return J.reshape(K * N, K * N)

    return residual, jacobian


def oscillator_hb(engine: Engine, params, f0_guess: float, anchor_eq: int,
                  n_harm: int = 9,
                  warmup_periods: int = 30,
                  steps_per_period: int = 256,
                  max_newton: int = 40,
                  tol: float = 1e-9,
                  damping: float = 1.0,
                  kick: float = 0.5,
                  gmin: float = 0.0,
                  solver: str = "dense",
                  gmres_tol: float = 1e-4,
                  gmres_restart: int = 40,
                  gmres_maxiter: int = 4) -> HBOscResult:
    """Frequency-domain periodic steady state of a free-running
    oscillator; see the module docstring for the formulation.

    solver='gmres' solves the bordered (KN+1) Newton system matrix-free
    (analysis/hb.py's approach lifted to the augmented unknown
    u = (vec(dX), df0)): the J·u product is one joint jax.jvp through
    (X, f0) plus the anchor-row dot, preconditioned by the
    block-circulant M on the X block and identity on the f0 border.
    The phase grid makes the trig basis f0-independent (cos(2πkj/K)),
    so only the preconditioner row frequencies k·2π·f0 trace through
    the evolving f0.  J_XX's near-singular phase mode costs GMRES O(1)
    extra iterations — the border keeps the augmented system regular."""
    if solver not in ("dense", "gmres"):
        raise ValueError(f"unknown HB solver {solver!r} "
                         "(expected 'dense' or 'gmres')")
    from .transient import transient_step_fn
    eng_w = osc_engine(engine)          # trap+lu warm-up engine
    dtype = engine.dtype
    N = engine.N
    H = int(n_harm)
    K = 2 * H + 1

    # ---- kicked warm-up at the guessed period (sstate pattern) ----
    Kw = int(steps_per_period)
    dt_w = jnp.asarray(1.0 / (f0_guess * Kw), dtype)
    step_w = transient_step_fn(eng_w, params, dt_w)
    x0 = dc_operating_point(eng_w, params)
    x0 = x0.at[anchor_eq].add(jnp.asarray(kick, dtype))
    state = eng_w.init_state(x0, params, dt_w)
    carry = (x0, state, jnp.zeros(x0.shape[:-1], bool))
    tw = jnp.arange(1, warmup_periods * Kw + 1, dtype=dtype) * dt_w

    def wbody(c, t):
        c, (xo, _) = step_w(c, t)
        return c, xo

    carry, xs_w = jax.jit(lambda c, t: lax.scan(wbody, c, t))(carry, tw)
    xs_w = np.asarray(xs_w)
    ya = xs_w[:, anchor_eq]
    mean = ya[-4 * Kw:].mean()
    up = np.nonzero((ya[:-1] < mean) & (ya[1:] >= mean))[0]
    if len(up) >= 3:
        # average the last few crossing spacings for a cleaner T0
        T0 = float(np.mean(np.diff(up[-3:])) * float(dt_w))
    elif len(up) == 2:
        T0 = float((up[-1] - up[-2]) * float(dt_w))
    else:
        T0 = 1.0 / f0_guess
    f0 = 1.0 / T0

    # resample the last period onto the K grid, starting at the final
    # upward crossing (sin-aligned fundamental ⇒ cos-part ≈ 0, matching
    # the anchor equation below and transversal to the phase direction)
    if len(up) >= 1:
        start = int(up[-1]) - int(round(T0 / float(dt_w)))
        start = max(start, 0)
    else:
        start = max(len(ya) - int(round(T0 / float(dt_w))) - 1, 0)
    span = T0 / float(dt_w)
    idx = np.minimum(start + np.round(np.arange(K) * span / K).astype(int),
                     len(ya) - 1)
    X = jnp.asarray(xs_w[idx], dtype)

    residual_p, jacobian_p = make_hb_system_auto(engine, n_harm, gmin=gmin)

    # anchor: cosine part of the anchor node's fundamental = 0
    cosv = jnp.asarray(np.cos(2 * np.pi * np.arange(K) / K), dtype)
    a_row = jnp.zeros((K, N), dtype).at[:, anchor_eq].set(
        cosv * (2.0 / K)).reshape(-1)

    if solver == "dense":
        @jax.jit
        def newton(X, f0):
            r, A_t = residual_p(X, f0, params, with_At=True)
            J_XX = jacobian_p(A_t, f0, params)
            _, dr_df0 = jax.jvp(lambda f: residual_p(X, f, params),
                                (f0,), (jnp.ones((), dtype),))
            anchor = jnp.dot(a_row, X.reshape(-1))
            n = K * N
            J = jnp.zeros((n + 1, n + 1), dtype)
            J = J.at[:n, :n].set(J_XX)
            J = J.at[:n, n].set(dr_df0.reshape(-1))
            J = J.at[n, :n].set(a_row)
            rhs = -jnp.concatenate([r.reshape(-1), anchor[None]])
            du = lu_solve(J, rhs, engine.opts.lu_pivot_floor)
            res = jnp.sqrt(jnp.sum(r * r) + anchor * anchor)
            return (X + damping * du[:n].reshape(K, N),
                    f0 + damping * du[n], res)
    else:
        from jax.scipy.sparse.linalg import gmres as _gmres
        from .hb import _hb_trig_mats, _hb_freq_precond
        trig = _hb_trig_mats(K, H, 1.0)   # phase grid: f0-independent

        @jax.jit
        def newton(X, f0):
            # full-f32 matmuls (MXU bf16 floor — see analysis/hb.py)
            with jax.default_matmul_precision("highest"):
                r, aux = residual_p(X, f0, params, with_At=True)
                anchor = jnp.dot(a_row, X.reshape(-1))
                omegas = (jnp.arange(1, H + 1, dtype=dtype)
                          * (2.0 * np.pi) * f0)
                apply_M = _hb_freq_precond(engine, params, omegas, aux,
                                           trig)

                def jv(u):
                    vX, vf = u
                    rX = jax.jvp(
                        lambda Xv, fv: residual_p(Xv, fv, params),
                        (X, f0), (vX, vf))[1]
                    return rX, jnp.dot(a_row, vX.reshape(-1))

                du, _ = _gmres(jv, (-r, -anchor),
                               M=lambda u: (apply_M(u[0]), u[1]),
                               tol=gmres_tol, atol=0.0,
                               restart=gmres_restart,
                               maxiter=gmres_maxiter,
                               solve_method="batched")
                res = jnp.sqrt(jnp.sum(r * r) + anchor * anchor)
                return (X + damping * du[0], f0 + damping * du[1], res)

    f0 = jnp.asarray(f0, dtype)
    res_norm = jnp.inf
    iters = 0
    for i in range(max_newton):
        X_new, f0_new, res_norm = newton(X, f0)
        iters = i + 1
        if not bool(jnp.isfinite(res_norm)) or float(f0_new) <= 0:
            break
        X, f0 = X_new, f0_new
        if float(res_norm) < tol:
            break
    r_fin = residual_p(X, f0, params)
    final = float(jnp.linalg.norm(r_fin))

    # host-side FFT (complex-free device programs; see analysis/hb.py)
    fft = np.fft.rfft(np.asarray(X), axis=0) / K
    coeffs = fft * 2.0
    coeffs[0] /= 2.0
    f0_f = float(f0)
    ts = jnp.arange(K, dtype=dtype) / (K * f0_f)
    # f32's bordered-system residual floor sits ~2e-6 on converged VDP
    # lanes; the success cut tracks the dtype like the PSS rcond does
    floor = 1e-6 if dtype == jnp.float64 else 1e-5
    return HBOscResult(f0=f0_f, times=ts, xs=X,
                       freqs=jnp.arange(H + 1, dtype=dtype) * f0_f,
                       spectrum=coeffs, residual=final, newton_iters=iters,
                       converged=final < max(tol * 100, floor))


@dataclasses.dataclass
class HBOscPhaseNoiseResult:
    f0: Any
    c: Any             # white phase-diffusion constant (var[t] = c·t, s²/s)
    c_flicker: Any     # flicker coefficient (× 1/Δf)
    offsets: Any
    L_dbc: Any         # Lorentzian L(Δf), dBc/Hz, with 1/f³ skirt
    period_jitter: Any # sqrt(c · T): per-period absolute jitter (s, rms)
    by_class: Any      # dict kind -> share of c
    per_source: Any    # (nS,) per-generator contribution to c
    kinds: Any
    ppv: Any           # (K, N) normalized PPV samples
    invariance: Any    # rel. spread of v_t·dx/dt (≪1 = consistent PPV)
    sv_gap: Any        # σ_min/σ_next of the HB Jacobian (≪1 = clean
                       # one-dimensional phase null space)


def oscillator_phase_noise_hb(engine: Engine, params, osc: HBOscResult,
                              offsets,
                              extra_pairs=None,
                              extra_psd=None) -> HBOscPhaseNoiseResult:
    """Phase noise of a converged autonomous-HB limit cycle via the PPV.

    The frequency-domain twin of analysis/oscnoise.py (Demir's theory,
    same .NOISE device PSD catalog, same Lorentzian), and the ONLY phase-
    noise path for transmission-line (delay-line) oscillators.

    Method: at the solution the HB Jacobian ∂r/∂X is singular with right
    null vector ẋ (time-shift invariance); the left null vector V samples
    the perturbation projection vector.  Its scale is pinned by the
    Fredholm alternative: a static residual perturbation ε·b shifts the
    solvable frequency by Δf0 = −ε·(Vᵀb)/(Vᵀ ∂r/∂f0), while Demir's
    phase equation gives Δf0 = ε·f0·⟨v_normᵀ b⟩ — so
    scale = ±K/(f0 · Vᵀ ∂r/∂f0), independent of b (sign fixed
    to Demir's convention vᵀCẋ = +1 in the delay-free limit).  For delay-free MNA
    this reproduces the DAE biorthogonality vᵀC ẋ = 1 exactly (checked
    as the `invariance` diagnostic); for T-line decks ∂r/∂f0 carries the
    delay-shift derivative, i.e. the non-local DDE bilinear-form terms
    (Hale) automatically — the pointwise vᵀC ẋ is then legitimately
    non-flat and `invariance` is reported but not an error indicator.
    A white current generator u_j with one-sided PSD s_j(t) contributes
    c_j = ⟨(v·u_j)² s_j⟩ / 2 (time average over the cycle; validated
    against the shooting-monodromy PPV on van der Pol and a TRNOISE
    Monte-Carlo on a delay-line oscillator, tests/test_hbosc.py)."""
    from .noise import _device_noise_currents
    from .oscnoise import _pair_matrix
    dtype = engine.dtype
    N = engine.N
    X = jnp.asarray(osc.xs, dtype)
    K = X.shape[0]
    H = (K - 1) // 2
    f0 = float(osc.f0)
    T = 1.0 / f0
    f0j = jnp.asarray(f0, dtype)

    residual_p, jacobian_p = make_hb_system_auto(engine, H)
    _, A_t = residual_p(X, f0j, params, with_At=True)
    J = np.asarray(jacobian_p(A_t, f0j, params), np.float64)

    # left null vector of the (singular) HB Jacobian
    U, sv, _ = np.linalg.svd(J)
    sv_gap = float(sv[-1] / max(sv[-2], 1e-300))
    V = U[:, -1].reshape(K, N)

    # Fredholm normalization (see docstring)
    _, dr_df0 = jax.jvp(lambda f: residual_p(X, f, params),
                        (f0j,), (jnp.ones((), dtype),))
    dr_df0 = np.asarray(dr_df0, np.float64).ravel()
    # sign chosen so the delay-free limit lands on Demir's v·Cẋ = +1
    V = V * (K / (f0 * float(V.ravel() @ dr_df0)))

    # delay-free diagnostic: the DAE biorthogonality vᵀC ẋ = 1 pointwise
    # (with T-lines the distributed state makes this legitimately non-flat)
    D1 = np.asarray(spectral_diff_matrix(K, 1.0), np.float64)
    xdot = f0 * (D1 @ np.asarray(X, np.float64))          # (K, N)
    mos_q = bool(getattr(engine, "mos_charge", False))
    C_s = np.asarray(_reactive_structure(engine, params,
                                         base_only=mos_q), np.float64)
    if mos_q:
        # C is state-dependent here: C(x_k) = C_base + dq/dv(x_k)
        from .hb import _mos_charge_pieces
        _, Cq_t = _mos_charge_pieces(engine, params, X)
        C_k = C_s[None] + np.asarray(Cq_t, np.float64)    # (K, N, N)
        norms = np.einsum("kn,knm,km->k", V, C_k, xdot)
    else:
        norms = np.einsum("kn,kn->k", V, xdot @ C_s.T)
    invariance = float(np.sqrt(np.mean((norms - 1.0) ** 2)))

    # noise generators along the cycle (same catalog as .NOISE/PNOISE)
    pairs, _, _, kinds = _device_noise_currents(engine, params, X[0])
    kinds = list(kinds)
    if len(pairs):
        def psds(x):
            _, sw, sf, _ = _device_noise_currents(engine, params, x)
            return sw, sf
        S_w, S_f = jax.jit(jax.vmap(psds))(X)             # (K, nS)
        S_w = np.asarray(S_w, np.float64)
        S_f = np.asarray(S_f, np.float64)
        E = _pair_matrix(pairs, N, np.float64)            # (nS, N)
    else:
        S_w = np.zeros((K, 0)); S_f = np.zeros((K, 0))
        E = np.zeros((0, N))
    if extra_pairs is not None:
        ep = np.asarray(extra_pairs, np.int64).reshape(-1, 2)
        E = np.concatenate([E, _pair_matrix(ep, N, np.float64)])
        sx = np.broadcast_to(np.asarray(extra_psd, np.float64),
                             (K, len(ep)))
        S_w = np.concatenate([S_w, sx], axis=-1)
        S_f = np.concatenate([S_f, np.zeros((K, len(ep)))], axis=-1)
        kinds += ["X"] * len(ep)
    if E.shape[0] == 0:
        raise ValueError("no noise generators: the deck has no noisy "
                         "devices and no extra_pairs were given")

    g = V @ E.T                                           # (K, nS)
    per_src_w = (g * g * S_w).mean(axis=0) / 2.0
    per_src_f = (g * g * S_f).mean(axis=0) / 2.0
    c = float(per_src_w.sum())
    c_fl = float(per_src_f.sum())

    offsets = np.asarray(offsets, np.float64)
    c_off = c + c_fl / np.maximum(offsets, 1e-30)
    L = 10.0 * np.log10(f0 ** 2 * c_off
                        / (np.pi ** 2 * f0 ** 4 * c ** 2 + offsets ** 2))

    kind_arr = np.asarray(kinds)
    by_class = {}
    for k in ("R", "M", "J", "D", "Q", "X"):
        sel = np.nonzero(kind_arr == k)[0]
        if len(sel):
            by_class[k] = float(per_src_w[sel].sum())

    return HBOscPhaseNoiseResult(
        f0=f0, c=c, c_flicker=c_fl, offsets=offsets, L_dbc=L,
        period_jitter=float(np.sqrt(max(c, 0.0) * T)),
        by_class=by_class, per_source=per_src_w, kinds=kind_arr,
        ppv=V, invariance=invariance, sv_gap=sv_gap)


# ---------------------------------------------------------------------
# Monte-Carlo oscillators: batched autonomous HB + batched phase noise
# ---------------------------------------------------------------------

@dataclasses.dataclass
class HBOscBatchResult:
    f0: Any            # (B,) solved fundamentals
    xs: Any            # (B, K, N) periodic waveform samples
    residual: Any      # (B,)
    converged: Any     # (B,) bool
    # phase-noise block (None until oscillator_phase_noise_hb_batched):
    c: Any = None            # (B,) white phase-diffusion constants
    c_flicker: Any = None    # (B,)
    offsets: Any = None      # (F,)
    L_dbc: Any = None        # (B, F) Lorentzian L(Δf), dBc/Hz
    period_jitter: Any = None  # (B,)
    per_source: Any = None   # (B, nS)
    kinds: Any = None        # (nS,)


def make_hbosc_batched_fn(engine: Engine, f0_guess: float, anchor_eq: int,
                          n_harm: int = 9,
                          warmup_periods: int = 30,
                          steps_per_period: int = 256,
                          n_newton: int = 25,
                          tol: float = 1e-9,
                          damping: float = 1.0,
                          kick: float = 0.5,
                          gmin: float = 0.0):
    """Factory for the batched autonomous-HB jitted program:
    fn(bparams, x0s) -> (Xs (B,K,N), f0s (B,), finals (B,)).

    The host path's per-lane pieces (oscillator_hb above) re-expressed
    traced so the whole Monte-Carlo batch runs as ONE program: the
    kicked trap/lu warm-up is a lax.scan, the period re-estimate from
    the anchor's upward mean-crossings becomes a sort/where reduction
    (no host nonzero()), and the bordered (KN+1)² Newton runs a fixed
    n_newton iterations with per-lane freeze (the make_hb_batched_fn
    contract: a converged or non-finite lane stops updating instead of
    poisoning the batch).  Every lane shares f0_guess and the anchor;
    each converges to its OWN f0 — that per-lane frequency pull is
    exactly what Monte-Carlo oscillator analysis is after."""
    from .transient import transient_step_fn
    eng_w = osc_engine(engine)
    dtype = engine.dtype
    N = engine.N
    H = int(n_harm)
    K = 2 * H + 1
    Kw = int(steps_per_period)
    dt_w = jnp.asarray(1.0 / (f0_guess * Kw), dtype)
    L = int(warmup_periods) * Kw
    residual_p, jacobian_p = make_hb_system_auto(engine, n_harm, gmin=gmin)
    cosv = jnp.asarray(np.cos(2 * np.pi * np.arange(K) / K), dtype)
    a_row = jnp.zeros((K, N), dtype).at[:, anchor_eq].set(
        cosv * (2.0 / K)).reshape(-1)
    n = K * N

    def one_lane(p, x0):
        step = transient_step_fn(eng_w, p, dt_w)
        x0k = x0.at[anchor_eq].add(jnp.asarray(kick, dtype))
        state = eng_w.init_state(x0k, p, dt_w)
        carry = (x0k, state, jnp.zeros(x0k.shape[:-1], bool))
        tw = jnp.arange(1, L + 1, dtype=dtype) * dt_w

        def wstep(c, t):
            c, (xo, _) = step(c, t)
            return c, xo

        _, xs_w = lax.scan(wstep, carry, tw)                 # (L, N)

        # period re-estimate: last upward mean-crossings, traced
        ya = xs_w[:, anchor_eq]
        mean = ya[-min(4 * Kw, L):].mean()
        upm = (ya[:-1] < mean) & (ya[1:] >= mean)            # (L-1,)
        masked = jnp.where(upm, jnp.arange(L - 1), -1)
        srt = jnp.sort(masked)                               # -1s first
        u1, u2, u3 = srt[-1], srt[-2], srt[-3]
        cnt = jnp.sum(upm)
        T0 = jnp.where(
            cnt >= 3, (u1 - u3).astype(dtype) / 2.0 * dt_w,
            jnp.where(cnt == 2, (u1 - u2).astype(dtype) * dt_w,
                      jnp.asarray(1.0 / f0_guess, dtype)))
        f0l = 1.0 / T0
        span = T0 / dt_w
        start = jnp.where(cnt >= 1,
                          u1 - jnp.round(span).astype(jnp.int32),
                          L - jnp.round(span).astype(jnp.int32) - 1)
        start = jnp.maximum(start, 0)
        gidx = jnp.minimum(
            start + jnp.round(jnp.arange(K) * span / K).astype(jnp.int32),
            L - 1)
        X = jnp.take(xs_w, gidx, axis=0)                     # (K, N)

        def newton(c, _):
            X, f0, done = c
            r, aux = residual_p(X, f0, p, with_At=True)
            J_XX = jacobian_p(aux, f0, p)
            dr_df0 = jax.jvp(lambda f: residual_p(X, f, p),
                             (f0,), (jnp.ones((), dtype),))[1]
            anchor = jnp.dot(a_row, X.reshape(-1))
            J = jnp.zeros((n + 1, n + 1), dtype)
            J = J.at[:n, :n].set(J_XX)
            J = J.at[:n, n].set(dr_df0.reshape(-1))
            J = J.at[n, :n].set(a_row)
            rhs = -jnp.concatenate([r.reshape(-1), anchor[None]])
            du = jnp.linalg.solve(J, rhs)
            resn = jnp.sqrt(jnp.sum(r * r) + anchor * anchor)
            f0n = f0 + damping * du[n]
            finite = (jnp.isfinite(resn) & jnp.all(jnp.isfinite(du))
                      & (f0n > 0))
            upd = (~done) & finite
            X = jnp.where(upd, X + damping * du[:n].reshape(K, N), X)
            f0 = jnp.where(upd, f0n, f0)
            done = done | (resn < tol) | ~finite
            return (X, f0, done), None

        (X, f0l, _), _ = lax.scan(newton, (X, f0l, jnp.asarray(False)),
                                  None, length=n_newton)
        rf = residual_p(X, f0l, p)
        anchor_f = jnp.dot(a_row, X.reshape(-1))
        final = jnp.sqrt(jnp.sum(rf * rf) + anchor_f * anchor_f)
        return X, f0l, final

    def batched(bp, x0s):
        # full-f32 matmuls: same MXU bf16 floor as make_hb_batched_fn
        with jax.default_matmul_precision("highest"):
            return jax.vmap(one_lane)(bp, x0s)

    return jax.jit(batched)


def oscillator_hb_batched(engine: Engine, bparams, f0_guess: float,
                          anchor_eq: int, n_harm: int = 9,
                          x0s=None, tol: float = 1e-9,
                          **kw) -> HBOscBatchResult:
    """Monte-Carlo autonomous HB: B perturbed lanes (leading lane axis)
    each solve for their OWN limit cycle and fundamental as one batched
    program.  See make_hbosc_batched_fn."""
    if x0s is None:
        from ..parallel.montecarlo import batched_dc_fast
        x0s = batched_dc_fast(engine, bparams)
    fn = make_hbosc_batched_fn(engine, f0_guess, anchor_eq,
                               n_harm=n_harm, tol=tol, **kw)
    Xs, f0s, finals = fn(bparams, jnp.asarray(x0s))
    finals = np.asarray(finals)
    floor = 1e-6 if engine.dtype == jnp.float64 else 1e-5
    return HBOscBatchResult(f0=np.asarray(f0s), xs=Xs, residual=finals,
                            converged=finals < max(tol * 100, floor))


def make_hbosc_pnoise_batched_fn(engine: Engine, n_harm: int,
                                 pairs, inv_iters: int = 4,
                                 gmin: float = 0.0):
    """Per-lane PPV + phase-diffusion kernel (vmapped by
    oscillator_phase_noise_hb_batched).

    The host path (oscillator_phase_noise_hb) extracts the HB
    Jacobian's left null vector with a full SVD — O((KN)³) per lane on
    the host.  Here the null vector comes from INVERSE ITERATION on the
    regularized transpose: factor Jᵀ + εI once (ε = 1e-9·‖J‖_F/KN) and
    apply it `inv_iters` times to the ∂r/∂f0 direction — which cannot
    be orthogonal to the null vector, since Vᵀ·∂r/∂f0 is exactly the
    Fredholm normalization denominator.  Near the limit cycle J's zero
    eigenvalue is simple and well-separated (sv_gap diagnostic on the
    host path), so convergence is geometric with ratio ~ε/σ_next; the
    Fredholm scale K/(f0·Vᵀ∂r/∂f0) then lands the same Demir
    normalization as the host path."""
    from .noise import _device_noise_currents
    from .oscnoise import _pair_matrix
    dtype = engine.dtype
    N = engine.N
    H = int(n_harm)
    K = 2 * H + 1
    residual_p, jacobian_p = make_hb_system_auto(engine, n_harm, gmin=gmin)
    E = jnp.asarray(_pair_matrix(np.asarray(pairs), N, np.float64), dtype)
    n = K * N

    def one_lane(p, X, f0):
        _, aux = residual_p(X, f0, p, with_At=True)
        J = jacobian_p(aux, f0, p)
        dr = jax.jvp(lambda f: residual_p(X, f, p),
                     (f0,), (jnp.ones((), dtype),))[1].reshape(-1)
        # Regularization scaled to the dtype's resolution: a fixed 1e-9
        # relative shift is below f32 rounding (eps_mach ~ 1.2e-7), so
        # an f32 engine's LU of the near-singular J^T would be noise-
        # dominated; under f32 use 1e-5 (~84x eps_mach — well-posed,
        # and the inverse-iteration convergence ratio scales with eps:
        # measured on the VDP deck, 1e-5 lands the f64 diffusion
        # constant to 2e-5 rel in the default 4 iterations where
        # sqrt(eps_mach)=3.4e-4 needed 16+).  f64 keeps the proven
        # 1e-9 — the regularization bias on the PPV normalization grows
        # with eps, and the f64 host-SVD parity test holds 1e-8 there.
        eps_mach = float(jnp.finfo(dtype).eps)
        eps_rel = 1e-9 if eps_mach < 1e-10 else 1e-5
        eps = eps_rel * jnp.linalg.norm(J) / n
        JT = J.T + eps * jnp.eye(n, dtype=dtype)
        lu_piv = jax.scipy.linalg.lu_factor(JT)
        v = dr / jnp.linalg.norm(dr)
        for _ in range(int(inv_iters)):
            v = jax.scipy.linalg.lu_solve(lu_piv, v)
            v = v / jnp.linalg.norm(v)
        V = v.reshape(K, N) * (K / (f0 * jnp.dot(v, dr)))

        per = jax.vmap(
            lambda x: _device_noise_currents(engine, p, x)[1:3])(X)
        S_w, S_f = per                                       # (K, nS)
        g = jnp.einsum("kn,sn->ks", V, E)                    # (K, nS)
        per_w = jnp.mean(g * g * S_w, axis=0) / 2.0
        per_f = jnp.mean(g * g * S_f, axis=0) / 2.0
        return per_w, per_f

    return one_lane


def oscillator_phase_noise_hb_batched(engine: Engine, bparams,
                                      osc: HBOscBatchResult, offsets,
                                      inv_iters: int = 4
                                      ) -> HBOscBatchResult:
    """Monte-Carlo oscillator phase noise: per-lane PPV extraction +
    Demir phase-diffusion constants + Lorentzian L(Δf) for every lane of
    a converged oscillator_hb_batched result, as one batched program.
    Fills the phase-noise block of the HBOscBatchResult (per-lane c,
    c_flicker, L_dbc, period_jitter, per_source) and returns it.  The
    host path's extra_pairs injection-vector extension is not carried
    here (use oscillator_phase_noise_hb per lane for that)."""
    from .noise import _device_noise_currents
    Xs = jnp.asarray(osc.xs)
    B, K, N = Xs.shape
    H = (K - 1) // 2
    probe = jax.tree.map(lambda x: x[0], bparams)
    pairs, _, _, kinds = _device_noise_currents(
        engine, probe, jnp.zeros((N,), engine.dtype))
    if not len(pairs):
        raise ValueError("no noise generators: the deck has no noisy "
                         "devices")
    lane = make_hbosc_pnoise_batched_fn(engine, H, pairs,
                                        inv_iters=inv_iters)
    f0s = jnp.asarray(np.asarray(osc.f0), engine.dtype)

    def batched(bp, X_b, f_b):
        with jax.default_matmul_precision("highest"):
            return jax.vmap(lane)(bp, X_b, f_b)

    per_w, per_f = jax.jit(batched)(bparams, Xs, f0s)
    per_w = np.asarray(per_w, np.float64)                    # (B, nS)
    per_f = np.asarray(per_f, np.float64)
    c = per_w.sum(axis=1)                                    # (B,)
    c_fl = per_f.sum(axis=1)
    f0 = np.asarray(osc.f0, np.float64)
    offsets = np.asarray(offsets, np.float64)
    c_off = c[:, None] + c_fl[:, None] / np.maximum(offsets, 1e-30)[None]
    L = 10.0 * np.log10(
        f0[:, None] ** 2 * c_off
        / (np.pi ** 2 * f0[:, None] ** 4 * c[:, None] ** 2
           + offsets[None] ** 2))
    osc.c = c
    osc.c_flicker = c_fl
    osc.offsets = offsets
    osc.L_dbc = L
    osc.period_jitter = np.sqrt(np.maximum(c, 0.0) / f0)
    osc.per_source = per_w
    osc.kinds = np.asarray(list(kinds))
    return osc


def injection_lock_hb(engine: Engine, params, osc: HBOscResult,
                      pair, amp: float, harmonic: int = 1):
    """Adler lock range from the autonomous-HB PPV — the frequency-
    domain twin of oscnoise.injection_lock and the ONLY locking path
    for transmission-line (delay-line) oscillators.  The Fredholm-
    normalized PPV samples V(t_k) share Demir's convention with the
    shooting path (dα/dt = vᵀb), so the same averaging applies:
    lock for |f_inj − m·f0| ≤ m·f0·amp·|p_m| with p_m the m-th Fourier
    coefficient of p(t) = V(t)ᵀu.  Cross-validated against the
    shooting-monodromy path on van der Pol (tests/test_injection_lock).
    """
    from .oscnoise import InjectionLockResult, _pair_matrix
    if amp <= 0:
        raise ValueError("injection amplitude must be > 0")
    m = int(harmonic)
    if m < 1:
        raise ValueError("harmonic must be >= 1")
    H = (int(np.asarray(osc.xs).shape[0]) - 1) // 2
    if m > H:
        raise ValueError(
            f"harmonic={m} exceeds the HB truncation H={H} (K=2H+1 "
            f"samples): p_m would alias onto a lower harmonic. Re-run "
            "oscillator_hb with n_harm >= harmonic.")
    pn = oscillator_phase_noise_hb(engine, params, osc,
                                   offsets=[float(osc.f0) * 1e-3],
                                   extra_pairs=[tuple(pair)],
                                   extra_psd=[0.0])
    u = _pair_matrix(np.asarray([tuple(pair)]), engine.N, np.float64)[0]
    p = np.asarray(pn.ppv) @ u                         # (K,)
    K = len(p)
    p_m = np.mean(p * np.exp(-2j * np.pi * m * np.arange(K) / K))
    k_per_amp = m * float(osc.f0) * abs(p_m)
    return InjectionLockResult(
        f0=float(osc.f0), amp=float(amp),
        lock_range_hz=k_per_amp * float(amp),
        k_per_amp=k_per_amp, p1=complex(p_m), harmonic=m, pn=pn)


# ---------------------------------------------------------------------
# Subharmonic injection locking — driven-HB fold search
# ---------------------------------------------------------------------

@dataclasses.dataclass
class SubharmonicLockResult:
    f0: float                # free-running oscillation frequency
    m: int                   # lock order: f_osc = m * f_inj
    amp: float               # injected current amplitude (A)
    f_lo: float              # lowest locked injection frequency
    f_hi: float              # highest locked injection frequency
    lock_range_hz: float     # (f_hi - f_lo) / 2, the one-sided range
    locked_center: Any       # HB samples of the locked solution at f0/m


def make_driven_hb_fn(engine, params, n_harm, b_dir, amp,
                      n_newton=60, tol=1e-9, damping=1.0):
    """ONE jitted driven-HB Newton program with the injection frequency
    TRACED (reused across every fold-search probe): solves the HB
    system at fixed fundamental f with an extra injected current
    amp·cos(2π f t) along b_dir.  fn(X0, f) -> (X, residual_norm)."""
    residual_p, jacobian_p = make_hb_system_auto(engine, int(n_harm))
    K = 2 * int(n_harm) + 1
    dtype = engine.dtype
    bv = jnp.asarray(b_dir, dtype)
    a = jnp.asarray(float(amp), dtype)

    def newton(X0, f):
        ts = jnp.arange(K, dtype=dtype) / (K * f)
        binj = a * jnp.cos(2.0 * jnp.pi * f * ts)[:, None] * bv[None, :]

        def body(c, _):
            X, done = c
            r, A_t = residual_p(X, f, params, with_At=True)
            r = r - binj
            rn = jnp.linalg.norm(r)
            J = jacobian_p(A_t, f, params)
            dX = jnp.linalg.solve(J, -r.reshape(-1)).reshape(K, -1)
            ok = jnp.isfinite(rn) & jnp.all(jnp.isfinite(dX))
            upd = (~done) & ok & (rn >= tol)
            X = jnp.where(upd, X + damping * dX, X)
            done = done | (rn < tol) | ~ok
            return (X, done), None

        (X, _), _ = lax.scan(body, (X0, jnp.asarray(False)), None,
                             length=n_newton)
        final = jnp.linalg.norm(residual_p(X, f, params) - binj)
        return X, final

    return jax.jit(newton)


def subharmonic_lock_hb(engine: Engine, params, osc: HBOscResult,
                        pair, amp: float, m: int = 2,
                        probe_node: int = 0,
                        rel_span: float = 0.02,
                        rel_tol: float = 1e-4,
                        tol: float = 1e-9) -> SubharmonicLockResult:
    """Subharmonic injection-locking range by driven-HB fold search:
    inject amp·cos(2π f_inj t) at the node pair with f_inj ≈ f0/m and
    find the f_inj interval over which the oscillator stays locked at
    exactly m·f_inj.

    The first-order PPV average (injection_lock_hb) is ZERO for
    subharmonic injection — locking is a second-order effect through
    the circuit's own mixing — so instead of perturbation theory this
    solves the full driven HB at fixed fundamental f_inj (the locked
    state is exactly f_inj-periodic, oscillation = harmonic m; K grows
    m-fold to carry the oscillator's own harmonics) warm-started from
    the free-running solution, and bisects on the fold where the
    large-amplitude locked branch disappears: past the lock edge the
    only f_inj-periodic solution is the small driven response, so
    Newton either diverges or collapses to an amplitude far below the
    free-running one.  Validated against brute-force transient
    arbitration in tests/test_injection_lock.py.

    pair: (eq_a, eq_b) node-equation pair (b may be -1/N = ground);
    probe_node: equation whose harmonic-m amplitude arbitrates
    locked-vs-collapsed; rel_span: half-width of the search window as a
    fraction of f0/m; rel_tol: bisection resolution (fraction of f0/m).
    Reference: no equivalent (empty steady-state module, SURVEY 2.13).
    """
    m = int(m)
    if m < 2:
        raise ValueError("subharmonic order m must be >= 2 "
                         "(m=1 is injection_lock_hb)")
    if amp <= 0:
        raise ValueError("injection amplitude must be > 0")
    from .oscnoise import _pair_matrix
    f0 = float(osc.f0)
    xs = np.asarray(osc.xs)
    K0 = xs.shape[0]
    H0 = (K0 - 1) // 2
    H = m * H0 + 1            # room for the oscillation's own harmonics
    K = 2 * H + 1
    N = engine.N
    u = _pair_matrix(np.asarray([tuple(pair)]), N, np.float64)[0]

    # free-running amplitude of the probe at the oscillation frequency
    spec0 = np.asarray(osc.spectrum)
    a_free = abs(spec0[1, probe_node])
    if a_free <= 0:
        raise ValueError("probe_node carries no fundamental amplitude "
                         "in the free-running solution")

    # warm start on the K-point grid of period m/f0: the oscillator
    # waveform repeats m times (phase-coherent resampling)
    tk = np.arange(K) / (K * (f0 / m))                 # [0, mT0)
    phase = (tk * f0) % 1.0
    idx = phase * K0
    i0 = np.floor(idx).astype(int) % K0
    i1 = (i0 + 1) % K0
    w = (idx - np.floor(idx))[:, None]
    X_warm = (1.0 - w) * xs[i0] + w * xs[i1]

    def probe_amp(X):
        c = np.fft.fft(np.asarray(X)[:, probe_node]) / K
        return 2.0 * abs(c[m % K])

    solve = make_driven_hb_fn(engine, params, H, u, float(amp), tol=tol)

    def locked(f_inj, X_init):
        X, res = solve(jnp.asarray(X_init, engine.dtype),
                       jnp.asarray(float(f_inj), engine.dtype))
        conv = bool(np.isfinite(float(res))) and \
            float(res) < max(tol * 100, 1e-6)
        ok = conv and probe_amp(X) > 0.3 * a_free
        return ok, X

    fc = f0 / m
    ok, Xc = locked(fc, X_warm)
    if not ok:
        raise RuntimeError(
            f"driven HB did not lock at the center frequency f0/{m} — "
            "raise amp (the subharmonic range shrinks ~amp^2) or check "
            "the injection pair")

    def edge(direction):
        """Continuation walk: the injection pins the phase only at
        second order, so the locked branch must be tracked in small
        steps (a cold jump's Newton wanders on the near-singular phase
        mode); geometric step growth keeps the probe count O(log)."""
        f, X = fc, Xc
        df = rel_tol * fc
        while abs(f - fc) < rel_span * fc:
            f_try = f + direction * df
            ok_t, X_t = locked(f_try, X)
            if ok_t:
                f, X = f_try, X_t
                df *= 1.8
            else:
                if df <= rel_tol * fc * 1.0001:
                    break
                df = max(df / 3.0, rel_tol * fc)
        return f

    f_hi = edge(+1.0)
    f_lo = edge(-1.0)
    return SubharmonicLockResult(
        f0=f0, m=m, amp=float(amp), f_lo=float(f_lo), f_hi=float(f_hi),
        lock_range_hz=0.5 * (float(f_hi) - float(f_lo)),
        locked_center=Xc)
