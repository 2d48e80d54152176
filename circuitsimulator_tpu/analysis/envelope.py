"""Envelope-following transient (circuit envelope) — modulated-carrier
simulation on two time scales (extension; no reference equivalent — the
reference's empty steady-state placeholder, SURVEY.md 2.13, is the
closest hook).

Math: the bivariate MPDE form of the circuit equations,

    f(x(t1, t2)) + C [ d/dt1 + d/dt2 ] x(t1, t2) = b(t1, t2),

with t2 the fast carrier axis (period T = 1/f0, K = 2H+1 spectral
collocation samples, exactly the HB grid) and t1 the slow envelope
axis, discretized backward-Euler with step dt_env.  Each envelope step
is one HB-sized Newton solve:

    r_env(X_n) = r_hb(X_n) - b_env(t1_n) + C (X_n - X_{n-1}) / dt = 0,
    J_env      = J_hb + kron(I_K, C) / dt,

where r_hb/J_hb are the existing params-parametric harmonic-balance
residual/Jacobian (analysis/hb.py make_hb_system) evaluated with ALL
sources zeroed — the residual is linear in the source RHS, so zeroing
the source entries of `params` and subtracting our own two-timescale
b_env reuses the whole HB machinery (including exact T-line delays on
the fast axis) unchanged.  The physical waveform is the diagonal
x(t) = X(t1=t, t2=t mod T).

Source splitting (the standard envelope rule): each independent
source's waveform rides the FAST axis iff it is a SIN at >= f0/2
(carrier and harmonics; evaluated at t2, so it must be T-periodic —
near-harmonic SINs are accepted and phase-wrapped), and the SLOW axis
otherwise (DC, PULSE, PWL, EXP, SFFM, baseband SIN; evaluated at t1,
constant across the fast grid).  A source's DC term is always slow.
Amplitude/phase modulation is expressed circuit-style: a behavioral
multiplier (B1 out 0 V=v(base)*v(carrier)) mixing a slow source with a
fast one.  B-source `time` expressions see the fast time within the
period (modulate via node voltages instead).

The t1=0 initial condition is the periodic steady state with the slow
sources frozen at their t=0 values (warm-started by a short transient
like harmonic_balance); pass x0_xs to start from your own (K, N)
envelope state instead — e.g. the zero state for startup studies.

Validation (tests/test_envelope.py): a memoryless deck tracks
frozen-slow-source HB point-for-point (the quasi-static limit is exact
when C=0); an AM step into an RC recovers the closed-form complex
envelope relaxation Y(t) = Y_inf + (Y_0 - Y_inf) e^{-(1+j w0 RC) t/RC}
with first-order-in-dt error; a pure carrier deck is t1-invariant.

Cold path: dense (KN)^2 envelope-step solves on the host driver, each
Newton iteration one jitted program.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models import sources as srcmod
from ..netlist.circuit import WAVE_SIN
from ..ops.assemble import Engine
from .hb import make_hb_system, _reactive_structure


_V_SRC_ZERO = ("vs_dc", "vs_pulse", "vs_sin", "vs_pwl_v")
_I_SRC_ZERO = ("is_dc", "is_pulse", "is_sin", "is_pwl_v")


@dataclasses.dataclass
class EnvelopeResult:
    f0: float
    t1: np.ndarray            # (T1,) envelope time grid (0 = initial PSS)
    xs: Any                   # (T1, K, N) envelope sample trajectories
    freqs: np.ndarray         # (H+1,) harmonic frequencies
    coeffs: np.ndarray        # (T1, H+1, N) one-sided complex envelopes
    converged: np.ndarray     # (T1,) per-step Newton convergence
    residuals: np.ndarray     # (T1,) final Newton residual norms


def _fast_masks(engine: Engine, params, f0: float):
    """Per-source fast-axis masks: SIN waveforms at >= f0/2.  A fast
    source is evaluated at t2 on the K-point period grid, so it must be
    T-periodic: warn when a fast-classified frequency is not an integer
    multiple of f0 (it would silently alias onto the wrong harmonic)."""
    fv = (engine.vs_kinds == WAVE_SIN) & \
        (np.asarray(params["vs_sin"])[:, 2] >= 0.5 * f0)
    fi = (engine.is_kinds == WAVE_SIN) & \
        (np.asarray(params["is_sin"])[:, 2] >= 0.5 * f0)
    for mask, key, tag in ((fv, "vs_sin", "V"), (fi, "is_sin", "I")):
        freqs = np.asarray(params[key])[:, 2][np.asarray(mask)]
        ratio = freqs / f0
        bad = np.abs(ratio - np.round(ratio)) > 1e-6 * np.maximum(ratio, 1.0)
        if np.any(bad):
            import warnings
            warnings.warn(
                f"envelope: fast-axis {tag}-source SIN frequencies "
                f"{freqs[bad].tolist()} are not harmonics of f0={f0:g}; "
                "they will be phase-wrapped onto the period grid "
                "(aliased). Use a slow (baseband) source or adjust f0.",
                stacklevel=3)
    return jnp.asarray(fv), jnp.asarray(fi)


def _b_env_fn(engine: Engine, params, ts, fv, fi):
    """Closure over one lane's params: b_env(t1) -> (K, N) two-timescale
    source RHS — fast waveforms at t2 (the K period samples ts), slow
    waveforms (and every DC term) at t1.  Shared by the host stepper and
    the batched (vmapped) path; fv/fi are the fast-source masks."""
    dtype = engine.dtype
    K = len(ts)
    zero_vdc = jnp.zeros_like(params["vs_dc"])
    zero_idc = jnp.zeros_like(params["is_dc"])

    def b_env(t1):
        def wave_v(t):
            return srcmod.eval_tran_static_kinds(
                engine.vs_kinds, zero_vdc, params["vs_pulse"],
                params["vs_sin"], params["vs_pwl_t"],
                params["vs_pwl_v"], params["vs_pwl_n"], t)

        def wave_i(t):
            return srcmod.eval_tran_static_kinds(
                engine.is_kinds, zero_idc, params["is_pulse"],
                params["is_sin"], params["is_pwl_t"],
                params["is_pwl_v"], params["is_pwl_n"], t)

        vf = jax.vmap(wave_v)(ts)                    # (K, nV)
        if_ = jax.vmap(wave_i)(ts)
        vs = params["vs_dc"] + wave_v(t1)            # (nV,)
        is_ = params["is_dc"] + wave_i(t1)
        # a fast source keeps its DC bias too ("DC 2 SIN(...)"): the DC
        # term is slow (constant), the SIN rides t2.
        vval = jnp.where(fv[None, :], vf + params["vs_dc"][None, :],
                         vs[None, :])
        ival = jnp.where(fi[None, :], if_ + params["is_dc"][None, :],
                         is_[None, :])
        zeros_l = jnp.zeros((K,) + params["ind_l"].shape, dtype)
        zeros_c = jnp.zeros((K,) + engine._caplike_C(params).shape, dtype)
        parts = [vval, ival, zeros_l, zeros_c]
        if engine.n_tl:
            parts.append(jnp.zeros((K, 2 * engine.n_tl), dtype))
        terms = jnp.concatenate(parts, axis=-1)
        return jnp.einsum("kj,jn->kn", terms, engine.rhs_mat)

    return b_env


def envelope_transient(engine: Engine, params, f0: float, t_stop: float,
                       dt_env: float, n_harm: int = 7,
                       x0_xs: Optional[Any] = None,
                       tol: float = 1e-9, max_newton: int = 25,
                       warmup_periods: int = 6,
                       order: int = 1) -> EnvelopeResult:
    """Envelope transient to t_stop in steps of dt_env.  order=1 is
    backward Euler; order=2 the trapezoidal rule (theta=1/2 averaging of
    the algebraic residual, second-order in dt_env — the same BE/trap
    pair the time-domain transient offers)."""
    if order not in (1, 2):
        raise ValueError("order must be 1 (BE) or 2 (trapezoidal)")
    theta = 1.0 if order == 1 else 0.5
    dtype = engine.dtype
    N = engine.N
    H = int(n_harm)
    K = 2 * H + 1
    T = 1.0 / f0
    ts, residual_p, jacobian_p = make_hb_system(engine, f0, n_harm)

    p_zero = dict(params)
    for k in _V_SRC_ZERO + _I_SRC_ZERO:
        p_zero[k] = jnp.zeros_like(params[k])
    fv, fi = _fast_masks(engine, params, f0)
    mos_q = bool(getattr(engine, "mos_charge", False))
    C_struct = _reactive_structure(engine, params, base_only=mos_q)
    b_env = _b_env_fn(engine, params, ts, fv, fi)

    def _t1_reactive(X, Xprev, inv_dt):
        """d/dt1 term: C (X - Xprev)/dt, plus the charge model's exact
        (q(X) - q(Xprev))/dt and its per-sample trans-capacitances."""
        r1 = inv_dt * jnp.einsum("ij,kj->ki", C_struct, X - Xprev)
        if not mos_q:
            return r1, None
        from .hb import _mos_charge_pieces
        qn, Cq = _mos_charge_pieces(engine, params, X)
        qp, _ = _mos_charge_pieces(engine, params, Xprev)
        return r1 + inv_dt * (qn - qp), inv_dt * Cq

    @jax.jit
    def r_alg(X, t1):
        """Algebraic part of the envelope residual: r_hb(X) - b_env(t1)
        (everything except the d/dt1 term)."""
        return residual_p(X, p_zero) - b_env(t1)

    @jax.jit
    def newton(X, Xprev, r_prev, t1, inv_dt):
        r, A_t = residual_p(X, p_zero, with_At=True)
        r1, Cq1 = _t1_reactive(X, Xprev, inv_dt)
        r = theta * (r - b_env(t1)) + (1.0 - theta) * r_prev + r1
        J = (theta * jacobian_p(A_t, p_zero)).reshape(K, N, K, N)
        kk = jnp.arange(K)
        J = J.at[kk, :, kk, :].add(inv_dt * C_struct)
        if Cq1 is not None:
            J = J.at[kk, :, kk, :].add(Cq1)
        dX = jnp.linalg.solve(J.reshape(K * N, K * N),
                              -r.reshape(-1)).reshape(K, N)
        return X + dX, jnp.linalg.norm(r)

    def solve_at(X, Xprev, r_prev, t1, inv_dt):
        res = np.inf
        for _ in range(max_newton):
            X_new, res = newton(X, Xprev, r_prev,
                                jnp.asarray(t1, dtype),
                                jnp.asarray(inv_dt, dtype))
            if not bool(jnp.isfinite(res)):
                break
            X = X_new
            if float(res) < tol:
                break
        return X, float(res)

    # ---- t1 = 0 initial condition: frozen-slow-source PSS ----
    if x0_xs is not None:
        X = jnp.asarray(x0_xs, dtype)
        if X.shape != (K, N):
            raise ValueError(f"x0_xs must be (K={K}, N={N})")
        res0 = 0.0
    else:
        from .dc import dc_operating_point
        from .transient import transient_step_fn
        from jax import lax
        steps_pp = max(4 * K, 64)
        dt_w = jnp.asarray(T / steps_pp, dtype)
        step = transient_step_fn(engine, params, dt_w)
        x0 = dc_operating_point(engine, params)
        state = engine.init_state(x0, params, dt_w)
        carry = (x0, state, jnp.zeros(x0.shape[:-1], bool))
        tw = (jnp.arange(1, warmup_periods * steps_pp + 1, dtype=dtype)
              * dt_w)

        def wstep(c, t):
            c, (xo, _) = step(c, t)
            return c, xo

        _, xs_w = jax.jit(lambda c, t: lax.scan(wstep, c, t))(carry, tw)
        idx = (np.arange(K) * steps_pp) // K
        zero = jnp.zeros((K, N), dtype)
        X, res0 = solve_at(xs_w[-steps_pp:][idx], zero, zero, 0.0, 0.0)

    n_steps = int(round(t_stop / dt_env))
    t1s = np.arange(n_steps + 1) * dt_env
    xs = [np.asarray(X)]
    resids = [res0]
    conv = [res0 < max(tol * 100, 1e-6)]
    inv_dt = 1.0 / dt_env
    r_prev = (r_alg(X, jnp.asarray(0.0, dtype)) if theta < 1.0
              else jnp.zeros((K, N), dtype))
    for n in range(1, n_steps + 1):
        X, res = solve_at(X, X, r_prev, t1s[n], inv_dt)
        if theta < 1.0:
            r_prev = r_alg(X, jnp.asarray(t1s[n], dtype))
        xs.append(np.asarray(X))
        resids.append(res)
        conv.append(res < max(tol * 100, 1e-6))

    xs = np.stack(xs)                                 # (T1, K, N)
    fft = np.fft.rfft(xs, axis=1) / K
    coeffs = fft * 2.0
    coeffs[:, 0] /= 2.0
    return EnvelopeResult(
        f0=f0, t1=t1s, xs=xs,
        freqs=np.arange(H + 1) * f0, coeffs=coeffs,
        converged=np.asarray(conv), residuals=np.asarray(resids))


# ---------------------------------------------------------------------
# Batched (Monte-Carlo) envelope transient — the whole two-timescale
# run as ONE jitted program over the lane axis
# ---------------------------------------------------------------------

@dataclasses.dataclass
class EnvelopeBatchResult:
    f0: float
    t1: np.ndarray            # (T1+1,) envelope time points
    xs: Any                   # (B, T1+1, K, N) waveform samples per lane
    freqs: np.ndarray         # (H+1,)
    coeffs: np.ndarray        # (B, T1+1, H+1, N) complex envelopes
    converged: np.ndarray     # (B,) every step of the lane converged
    residuals: np.ndarray     # (B, T1+1) final Newton residual per step


def make_envelope_batched_fn(engine: Engine, f0: float, t_stop: float,
                             dt_env: float, n_harm: int = 7,
                             n_newton: int = 10, tol: float = 1e-9,
                             warmup_periods: int = 6, fast_masks=None):
    """Factory for the batched envelope program: returns (t1s, fn) with
    fn(bparams, x0s) -> (Xs (B, T1+1, K, N), resid (B, T1+1)) — the
    full envelope run (warm-up transient, t1=0 PSS solve, BE envelope
    scan) traced once and vmapped over the Monte-Carlo lane axis.  Same
    batching contract as hb.make_hb_batched_fn: fixed Newton counts (no
    host polling), per-lane freeze on early convergence/non-finite.

    fast_masks: optional (fv, fi) from _fast_masks — REQUIRED when
    bparams is a batched pytree (the masks come from host numpy and
    must be computed once from the nominal lane; fast/slow source
    classification cannot vary per lane)."""
    dtype = engine.dtype
    N = engine.N
    H = int(n_harm)
    K = 2 * H + 1
    T = 1.0 / f0
    ts, residual_p, jacobian_p = make_hb_system(engine, f0, n_harm)
    n_steps = int(round(t_stop / dt_env))
    t1s = np.arange(n_steps + 1) * dt_env
    kk = jnp.arange(K)
    from .transient import transient_step_fn
    steps_pp = max(4 * K, 64)
    dt_w = jnp.asarray(T / steps_pp, dtype)
    widx = (np.arange(K) * steps_pp) // K

    mos_q = bool(getattr(engine, "mos_charge", False))

    def lane(p, x0):
        p_zero = dict(p)
        for k in _V_SRC_ZERO + _I_SRC_ZERO:
            p_zero[k] = jnp.zeros_like(p[k])
        fv, fi = fast_masks if fast_masks is not None \
            else _fast_masks(engine, p, f0)
        C_struct = _reactive_structure(engine, p, base_only=mos_q)
        b_env = _b_env_fn(engine, p, ts, fv, fi)

        def newton_iters(X, Xprev, t1, inv_dt):
            if mos_q:
                from .hb import _mos_charge_pieces
                qp, _ = _mos_charge_pieces(engine, p, Xprev)

            def body(_, c):
                X, res, done = c
                r, A_t = residual_p(X, p_zero, with_At=True)
                r = (r - b_env(t1)
                     + inv_dt * jnp.einsum("ij,kj->ki", C_struct,
                                           X - Xprev))
                J = jacobian_p(A_t, p_zero).reshape(K, N, K, N)
                J = J.at[kk, :, kk, :].add(inv_dt * C_struct)
                if mos_q:
                    from .hb import _mos_charge_pieces
                    qn, Cq = _mos_charge_pieces(engine, p, X)
                    r = r + inv_dt * (qn - qp)
                    J = J.at[kk, :, kk, :].add(inv_dt * Cq)
                dX = jnp.linalg.solve(J.reshape(K * N, K * N),
                                      -r.reshape(-1)).reshape(K, N)
                rn = jnp.linalg.norm(r)
                ok = jnp.isfinite(rn) & jnp.all(jnp.isfinite(dX))
                take = (~done) & ok
                Xn = jnp.where(take, X + dX, X)
                res = jnp.where(done, res, rn)
                done = done | (rn < tol) | ~ok
                return (Xn, res, done)
            X, res, _ = jax.lax.fori_loop(
                0, n_newton, body,
                (X, jnp.asarray(jnp.inf, dtype), jnp.asarray(False)))
            return X, res

        # warm-up transient from the DC point (slow sources live)
        step = transient_step_fn(engine, p, dt_w)
        state = engine.init_state(x0, p, dt_w)
        carry = (x0, state, jnp.zeros(x0.shape[:-1], bool))
        tw = (jnp.arange(1, warmup_periods * steps_pp + 1, dtype=dtype)
              * dt_w)

        def wstep(c, t):
            c, (xo, _) = step(c, t)
            return c, xo

        _, xs_w = jax.lax.scan(wstep, carry, tw)
        zero = jnp.zeros((K, N), dtype)
        X0, r0 = newton_iters(xs_w[-steps_pp:][widx], zero,
                              jnp.asarray(0.0, dtype),
                              jnp.asarray(0.0, dtype))

        inv_dt = jnp.asarray(1.0 / dt_env, dtype)

        def env_step(X, t1):
            Xn, res = newton_iters(X, X, t1, inv_dt)
            return Xn, (Xn, res)

        _, (Xs, rs) = jax.lax.scan(
            env_step, X0, jnp.asarray(t1s[1:], dtype))
        Xs = jnp.concatenate([X0[None], Xs], axis=0)
        rs = jnp.concatenate([r0[None], rs], axis=0)
        return Xs, rs

    def batched(bp, x0s):
        # full-f32 matmuls: the MXU's default bf16 passes floor the
        # Newton residual ~1e-3 (see hb.make_hb_batched_fn)
        with jax.default_matmul_precision("highest"):
            return jax.vmap(lane)(bp, x0s)

    return t1s, jax.jit(batched)


def envelope_transient_batched(engine: Engine, bparams, f0: float,
                               t_stop: float, dt_env: float,
                               n_harm: int = 7, n_newton: int = 10,
                               tol: float = 1e-9,
                               warmup_periods: int = 6,
                               x0s=None) -> EnvelopeBatchResult:
    """Monte-Carlo envelope transient: B perturbed lanes (leading lane
    axis, perturb_params) of the full two-timescale run as ONE batched
    program — warm-up, t1=0 PSS, and every BE envelope step's (KN)²
    Newton solve vmapped over lanes (batched dense solves on the MXU).
    Backward Euler only (the host envelope_transient offers order=2).
    The fast/slow source split comes from lane 0 (classification cannot
    vary per lane)."""
    nominal = jax.tree.map(lambda x: x[0], bparams)
    masks = _fast_masks(engine, nominal, f0)
    if x0s is None:
        from ..parallel.montecarlo import batched_dc_fast
        x0s = batched_dc_fast(engine, bparams)
    t1s, fn = make_envelope_batched_fn(
        engine, f0, t_stop, dt_env, n_harm=n_harm, n_newton=n_newton,
        tol=tol, warmup_periods=warmup_periods, fast_masks=masks)
    Xs, rs = fn(bparams, x0s)
    H = int(n_harm)
    K = 2 * H + 1
    xs = np.asarray(Xs)                              # (B, T1+1, K, N)
    fft = np.fft.rfft(xs, axis=2) / K
    coeffs = fft * 2.0
    coeffs[:, :, 0] /= 2.0
    rs = np.asarray(rs)
    conv_tol = max(tol * 100, 1e-6)
    return EnvelopeBatchResult(
        f0=f0, t1=t1s, xs=xs,
        freqs=np.arange(H + 1) * f0, coeffs=coeffs,
        converged=np.all(rs < conv_tol, axis=1), residuals=rs)
