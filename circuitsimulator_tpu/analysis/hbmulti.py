"""Multi-tone harmonic balance: quasi-periodic steady state (extension).

Single-tone HB (analysis/hb.py) covers the `.hb f0 nHarm` card by brute-
forcing the common fundamental — for the dbmixer's 900/800/600 MHz tones
that means f0 = 100 MHz and 50 harmonics.  This module implements the
industry-standard alternative for widely-spaced or incommensurate tones:
the multirate PDE (MPDE) / multidimensional-Fourier formulation.

    circuit ODE:        d/dt q(x) + f(x) = b(t)
    MPDE lift:          (sum_d d/dt_d) q(x^) + f(x^) = b^(t_1..t_D)
    physical solution:  x(t) = x^(t mod T_1, ..., t mod T_D)

where b^ separates each independent source onto the time axis of the tone
it belongs to (matched by its SIN frequency).  x^ is sampled on a
K_1 x ... x K_D uniform grid (K_d = 2*H_d + 1), each axis differentiated by
its exact spectral operator D_d, and the coupled system is solved with
Newton exactly like single-tone HB — the time-axis structure enters only
through T = sum_d I (x) D_d (x) I, so the Jacobian keeps the familiar form
kron(T, C_struct) + blockdiag(A(x_t)).

Unknown count is N * prod(K_d): two tones at H=(8,3) on the dbmixer is
17*7*31 = 3.7k unknowns — a dense solve the TPU does in milliseconds —
versus 50 harmonics (3.1k unknowns) of brute force, but the multi-tone grid
resolves ALL intermodulation products k1 f1 + k2 f2 up to the box, not just
multiples of the common fundamental, and works for incommensurate tones
where no common fundamental exists.

Initial guess: single-tone HB of the dominant tone (others muted),
broadcast along the remaining axes — for mixers (strong LO, weak RF) this
starts Newton inside its quadratic basin.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.assemble import Engine
from ..models import sources as srcmod
from ..netlist.circuit import WAVE_NONE, WAVE_SIN
from .hb import (harmonic_balance, spectral_diff_matrix,
                 _reactive_structure, _tl_hb_terms, _tl_residual_delay,
                 _tl_add_jacobian_blocks)


@dataclasses.dataclass
class HBMultiResult:
    tones: Any        # ((f, H) per axis)
    times: Any        # list of per-axis sample-time arrays
    xs: Any           # (K_1, ..., K_D, N) grid samples of x^
    spectrum: Any     # (K_1, ..., K_D, N) complex; axis index k maps to
                      # harmonic k for k <= H_d else k - K_d (negative)
    residual: Any
    newton_iters: int
    converged: Any


def _mute(params, key, assign, keep):
    """params[key] with va (sin col 1) zeroed for sources whose assignment
    != keep (keep=None zeroes every va)."""
    sin = params[key]
    if sin.shape[0] == 0:
        return sin
    if keep is None:
        live = np.zeros(sin.shape[0], bool)
    else:
        live = assign == keep
    keep_cols = jnp.asarray(live, sin.dtype)[:, None]
    va_zero = sin * jnp.asarray([1.0, 0.0, 1.0, 1.0, 1.0], sin.dtype)
    return sin * keep_cols + va_zero * (1.0 - keep_cols)


def assign_tones(kinds: np.ndarray, sin: np.ndarray,
                 tone_freqs: Sequence[float]) -> np.ndarray:
    """Match each SIN source to the tone axis whose harmonic grid best
    contains its frequency (relative distance of f to the nearest positive
    multiple of f_tone).  Non-SIN (DC) sources get -1 (tone-independent)."""
    n = len(kinds)
    out = np.full(n, -1, np.int32)
    for i in range(n):
        if kinds[i] != WAVE_SIN:
            if kinds[i] != WAVE_NONE:
                raise ValueError(
                    "multi-tone HB supports DC and SIN sources only "
                    f"(source {i} has waveform kind {kinds[i]})")
            continue
        f = float(sin[i, 2])
        if f <= 0.0:
            continue
        best, bestpen = 0, math.inf
        for d, ft in enumerate(tone_freqs):
            k = max(round(f / ft), 1)
            pen = abs(f - k * ft) / ft
            if pen < bestpen:
                best, bestpen = d, pen
        if bestpen > 1e-6:
            raise ValueError(
                f"source frequency {f} is not a harmonic of any tone "
                f"{list(tone_freqs)} (closest relative error {bestpen:.3g})")
        out[i] = best
    return out


def make_hbmulti_system(engine: Engine, tones, nominal_params,
                        b_time_axis: int = 0):
    """Params-parametric multi-tone MPDE system (tone assignment is
    STATIC, matched on the nominal SIN frequencies).

    mos_cap_model='charge': the MPDE reactive term is (Σ_d ∂/∂t_d) q(x^)
    — on the flattened grid that is T @ q(X) with the same per-grid-point
    charges/trans-capacitances as single-tone HB (hb._mos_charge_pieces);
    the Jacobian picks up T[t,s]·Cq[s] blocks.

    Behavioral expressions that reference `time` evaluate it on ONE tone
    axis (`b_time_axis`, default the first tone) — the MPDE lift of a
    t-periodic coefficient rides the artificial time scale of the tone
    it is periodic at, exactly like the SIN-source assignment above.
    Well-posed when the expression's time dependence is periodic at that
    tone's frequency (an expression periodic at tone d needs
    b_time_axis=d; aperiodic time dependence has no multi-tone lift).

    Returns (Ks, ts_axes, residual, jacobian):
      residual(X (Kt,N), params, with_At=False)
      jacobian(A_t, params) -> (Kt·N, Kt·N) = blockdiag(A_t) + kron(T, C)

    Shared by the Newton solver below and the sensitivity path
    (analysis/hb_diff.hbmulti_gradient)."""
    mos_q = bool(getattr(engine, "mos_charge", False))
    dtype = engine.dtype
    N = engine.N
    freqs = [float(f) for f, _ in tones]
    Hs = [int(h) for _, h in tones]
    Ks = [2 * h + 1 for h in Hs]
    Kt = int(np.prod(Ks))
    D_axes = len(tones)
    Ds_np = [np.asarray(spectral_diff_matrix(K, 1.0 / f))
             for K, f in zip(Ks, freqs)]
    ts = [jnp.arange(K, dtype=dtype) * (1.0 / f / K)
          for K, f in zip(Ks, freqs)]
    T = np.zeros((Kt, Kt))
    for d in range(D_axes):
        M = np.ones((1, 1))
        for e in range(D_axes):
            M = np.kron(M, Ds_np[e] if e == d else np.eye(Ks[e]))
        T += M
    T = jnp.asarray(T, dtype)
    # behavioral `time` samples: the designated axis's local times,
    # broadcast across the other axes and flattened grid-major
    axis = int(b_time_axis)
    if not (0 <= axis < D_axes):
        raise ValueError(f"b_time_axis {axis} outside the {D_axes} tones")
    bshape = [1] * D_axes
    bshape[axis] = Ks[axis]
    t_bflat = jnp.broadcast_to(ts[axis].reshape(bshape),
                               tuple(Ks)).reshape(Kt)
    assign_v = assign_tones(np.asarray(engine.vs_kinds),
                            np.asarray(nominal_params["vs_sin"]), freqs)
    assign_i = assign_tones(np.asarray(engine.is_kinds),
                            np.asarray(nominal_params["is_sin"]), freqs)

    def tl_parts(params):
        """(corr_rows, corr_cols, corr_vals, S_total): the static-stamp
        patch plus the grid delay operator.  A physical delay τ shifts
        EVERY artificial time scale: x(t-τ) = x^(t1-τ, ..., tD-τ), so
        each grid frequency Σ k_d f_d picks up e^{-j2πτ Σ k_d f_d} —
        exactly the kron of the per-axis band-limited shifts
        (hb._tl_hb_terms)."""
        S_tot = None
        corr = None
        for d in range(D_axes):
            cr, cc, cv, S_d = _tl_hb_terms(engine, params, ts[d],
                                           Hs[d], freqs[d])
            if corr is None:
                corr = (cr, cc, cv)
            if S_tot is None:
                S_tot = S_d
            else:
                n = S_tot.shape[-1] * S_d.shape[-1]
                S_tot = jnp.einsum("iab,icd->iacbd", S_tot,
                                   S_d).reshape(-1, n, n)
        return corr + (S_tot,)

    def residual(X, params, with_At: bool = False):
        C_struct = _reactive_structure(engine, params, base_only=mos_q)

        def sources_rhs(p, t):
            vval = srcmod.eval_tran_static_kinds(
                engine.vs_kinds, p["vs_dc"], p["vs_pulse"], p["vs_sin"],
                p["vs_pwl_t"], p["vs_pwl_v"], p["vs_pwl_n"], t)
            ival = srcmod.eval_tran_static_kinds(
                engine.is_kinds, p["is_dc"], p["is_pulse"], p["is_sin"],
                p["is_pwl_t"], p["is_pwl_v"], p["is_pwl_n"], t)
            zeros_l = jnp.zeros(p["ind_l"].shape, dtype)
            zeros_c = jnp.zeros(engine._caplike_C(p).shape, dtype)
            parts = [vval, ival, zeros_l, zeros_c]
            if engine.n_tl:
                # delayed-wave EMF slots stay zero — the delay is applied
                # spectrally (tl_parts), not via the transient ring's RHS
                parts.append(jnp.zeros((2 * engine.n_tl,), dtype))
            terms = jnp.concatenate(parts, axis=-1)
            return jnp.einsum("...j,jn->...n", terms, engine.rhs_mat)

        def tone_p(keep):
            p = dict(params)
            p["vs_sin"] = _mute(params, "vs_sin", assign_v, keep)
            p["is_sin"] = _mute(params, "is_sin", assign_i, keep)
            return p

        b_dc = sources_rhs(tone_p(None), jnp.zeros((), dtype))
        b_hat = jnp.broadcast_to(b_dc, tuple(Ks) + (N,))
        for d in range(D_axes):
            p_d = tone_p(d)
            bd = jax.vmap(lambda t: sources_rhs(p_d, t))(ts[d]) - b_dc
            shape = [1] * D_axes + [N]
            shape[d] = Ks[d]
            b_hat = b_hat + bd.reshape(shape)
        b_src = b_hat.reshape(Kt, N)

        rows, cols, svals = engine.dc_static_entries(params)
        A_res = jnp.zeros((N + 1, N + 1), dtype).at[rows, cols].add(svals)
        if engine.n_tl:
            cr, cc, cv, S_tot = tl_parts(params)
            A_res = A_res.at[cr, cc].add(cv)
        A_res = A_res[:N, :N]

        def assemble_t(x_t, t_t):
            gvals, rvals = engine._nl_vals(params, x_t, t_t)
            A = jnp.zeros((N + 1, N + 1), dtype)
            A = A.at[engine.nl_rows, engine.nl_cols].add(gvals)
            b = jnp.zeros((N + 1,), dtype).at[engine.nl_rhs_rows].add(
                rvals)
            return A_res + A[:N, :N], b[:N]

        A_t, b_nl = jax.vmap(assemble_t)(X, t_bflat)
        res_cond = jnp.einsum("tij,tj->ti", A_t, X) - b_nl - b_src
        res_reac = jnp.einsum("ij,tj->ti", C_struct, T @ X)
        res = res_cond + res_reac
        if engine.n_tl:
            res = _tl_residual_delay(engine, params, S_tot, X, res)
        if mos_q:
            from .hb import _mos_charge_pieces
            qvec, Cq_t = _mos_charge_pieces(engine, params, X)
            res = res + T @ qvec
            return (res, (A_t, Cq_t)) if with_At else res
        return (res, A_t) if with_At else res

    def jacobian(A_t, params):
        C_struct = _reactive_structure(engine, params, base_only=mos_q)
        J = jnp.einsum("ts,ij->tisj", T, C_struct)
        if mos_q:
            A_t, Cq_t = A_t
            J = J + jnp.einsum("ts,sij->tisj", T, Cq_t)
        tid = jnp.arange(Kt)
        J = J.at[tid, :, tid, :].add(A_t)
        if engine.n_tl:
            _, _, _, S_tot = tl_parts(params)
            J = _tl_add_jacobian_blocks(engine, params, S_tot, J)
        return J.reshape(Kt * N, Kt * N)

    return Ks, ts, residual, jacobian


def _mt_basis(Ks, freqs):
    """Real half-space DFT basis on the flattened multi-tone grid.

    Every flattened grid point carries the phase Σ_d k_d·ω_d·t_d (the
    MPDE grid is separable, so the full transform is the kron of the
    per-axis DFTs).  Conjugate symmetry of a real signal pairs each
    signed multi-index k with −k; the half-space representative is the
    one whose first nonzero component is positive.  Returns
      (omegas (P,), Fc (P+1, Kt), Fs (P+1, Kt), Ic (Kt, P+1), Is)
    with row 0 = the all-zero index (DC), P = (Kt−1)/2 (all K_d odd),
    and omegas the signed mixing frequencies Σ_d k_d·ω_d of the half
    rows (mixing products can be ≤ 0 — see hb._hb_freq_precond).
    Analysis scale: a_0 = mean, a_k = 2/Kt·Σ cos, b_k = 2/Kt·Σ sin, so
    Ic@a + Is@b reconstructs exactly (unit-tested)."""
    D = len(Ks)
    Hs = [(K - 1) // 2 for K in Ks]
    Kt = int(np.prod(Ks))
    ks = [np.concatenate([np.arange(0, h + 1), np.arange(-h, 0)])
          for h in Hs]
    kg = np.meshgrid(*ks, indexing="ij")
    kflat = np.stack([g.reshape(-1) for g in kg], axis=0)      # (D, Kt)
    tg = np.meshgrid(*[np.arange(K) * (1.0 / f / K)
                       for K, f in zip(Ks, freqs)], indexing="ij")
    tflat = np.stack([g.reshape(-1) for g in tg], axis=0)      # (D, Kt)
    phase = np.zeros((Kt, Kt))
    omega = np.zeros(Kt)
    for d in range(D):
        wk = 2.0 * np.pi * freqs[d] * kflat[d]
        phase += wk[:, None] * tflat[d][None, :]
        omega += wk
    # half-space: first nonzero signed component positive
    nz = kflat != 0
    first_nz = np.where(nz.any(axis=0), nz.argmax(axis=0), 0)
    lead = kflat[first_nz, np.arange(Kt)]
    half = np.flatnonzero(lead > 0)
    zero = int(np.flatnonzero((kflat == 0).all(axis=0))[0])
    order = np.concatenate([[zero], half])
    C, S = np.cos(phase[order]), np.sin(phase[order])
    scale = np.full((len(order), 1), 2.0 / Kt)
    scale[0, 0] = 1.0 / Kt
    return omega[half], C * scale, S * scale, C.T, S.T


def harmonic_balance_multi(engine: Engine, params,
                           tones: Sequence[Tuple[float, int]],
                           max_newton: int = 30,
                           tol: float = 1e-9,
                           damping: float = 1.0,
                           solver: str = "dense",
                           gmres_tol: float = 1e-4,
                           gmres_restart: int = 40,
                           gmres_maxiter: int = 4,
                           b_time_axis: int = 0,
                           **warmup_kw):
    """Solve the quasi-periodic steady state on the multi-tone grid.

    tones: [(freq, n_harm), ...]; the first tone is the dominant one (used
    for the single-tone warm-up).  Unbatched params only.

    solver='gmres' switches the Newton inner solve to matrix-free
    preconditioned GMRES (see analysis/hb.py) — on the MPDE grid the
    unknown count N·Πd K_d grows multiplicatively with tones, so this is
    where the Krylov path matters most (the preconditioner rows carry
    the half-space mixing frequencies Σ_d k_d·ω_d from _mt_basis).
    """
    opts = engine.opts
    dtype = engine.dtype
    N = engine.N
    D_axes = len(tones)
    if D_axes < 1:
        raise ValueError("need at least one tone")
    freqs = [float(f) for f, _ in tones]
    Hs = [int(h) for _, h in tones]
    Ks = [2 * h + 1 for h in Hs]
    Kt = int(np.prod(Ks))

    # params-parametric system shared with the sensitivity path
    # (behavioral `time` rides tone axis b_time_axis — see
    # make_hbmulti_system)
    Ks, ts, residual_p, jacobian_p = make_hbmulti_system(
        engine, tones, params, b_time_axis=b_time_axis)
    residual = lambda X: residual_p(X, params, with_At=True)
    jacobian = lambda A_t: jacobian_p(A_t, params)
    # tone-muted warm-up params (same static assignment as the system)
    assign_v = assign_tones(np.asarray(engine.vs_kinds),
                            np.asarray(params["vs_sin"]), freqs)
    assign_i = assign_tones(np.asarray(engine.is_kinds),
                            np.asarray(params["is_sin"]), freqs)

    def tone_params(keep):
        p = dict(params)
        p["vs_sin"] = _mute(params, "vs_sin", assign_v, keep)
        p["is_sin"] = _mute(params, "is_sin", assign_i, keep)
        return p

    # ---- warm-up: single-tone HB of the dominant tone, broadcast ----
    res1 = harmonic_balance(engine, tone_params(0), freqs[0],
                            n_harm=Hs[0], tol=tol, **warmup_kw)
    X = jnp.broadcast_to(
        res1.xs.reshape((Ks[0],) + (1,) * (D_axes - 1) + (N,)),
        tuple(Ks) + (N,)).reshape(Kt, N)

    if solver == "dense":
        @jax.jit
        def newton(X):
            # full-f32 matmuls — same MXU-bf16 floor as single-tone HB
            with jax.default_matmul_precision("highest"):
                r, A_t = residual(X)
                J = jacobian(A_t)
                dX = jnp.linalg.solve(J, -r.reshape(-1)).reshape(Kt, N)
                return X + damping * dX, jnp.linalg.norm(r)
    elif solver == "gmres":
        # matrix-free Newton-Krylov on the MPDE grid: identical to
        # analysis/hb.py solver='gmres', with the preconditioner's
        # per-row frequencies the half-space mixing products Σ k_d·ω_d
        from jax.scipy.sparse.linalg import gmres as _gmres
        from .hb import _hb_freq_precond
        omegas_np, *trig = _mt_basis(Ks, freqs)
        omegas_j = jnp.asarray(omegas_np, dtype)

        @jax.jit
        def newton(X):
            with jax.default_matmul_precision("highest"):
                r, aux = residual(X)
                apply_M = _hb_freq_precond(engine, params, omegas_j,
                                           aux, trig)

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
        # floating-point floor, two-strike vs best-so-far (see
        # analysis/hb.py)
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

    Xg = X.reshape(tuple(Ks) + (N,))
    # host-side FFT (complex-free device programs; see analysis/hb.py)
    spec = np.fft.fftn(np.asarray(Xg), axes=tuple(range(D_axes))) / Kt
    return HBMultiResult(tones=tuple((f, h) for f, h in zip(freqs, Hs)),
                         times=ts, xs=Xg, spectrum=spec,
                         residual=final, newton_iters=iters,
                         converged=final < max(tol * 100, 1e-6))


@dataclasses.dataclass
class HBMultiBatchResult:
    tones: Any        # ((f, H) per axis)
    times: Any
    xs: Any           # (B, K_1, ..., K_D, N)
    spectrum: Any     # (B, K_1, ..., K_D, N) complex
    residual: Any     # (B,)
    converged: Any    # (B,)


def make_hbmulti_batched_fn(engine: Engine, tones, nominal_params,
                            n_newton: int = 12,
                            tol: float = 1e-9,
                            damping: float = 1.0,
                            solver: str = "dense",
                            gmres_tol: float = 1e-4,
                            gmres_restart: int = 40,
                            gmres_maxiter: int = 4,
                            b_time_axis: int = 0):
    """Factory for the batched multi-tone-HB jitted program:
    fn(bparams, X0s (B, Kt, N)) -> (Xs, finals).  The MPDE system is
    already params-parametric (make_hbmulti_system; tone assignment is
    STATIC on the nominal SIN frequencies — Monte-Carlo perturbs values,
    never source frequencies), so each lane runs the host solver's
    Newton with the make_hb_batched_fn freeze contract: fixed n_newton
    iterations, converged/non-finite lanes stop updating.  Lane
    chunking is auto-sized from the dense working-set estimate
    (hb._hb_lane_chunk; big-Kt decks fault the device at large
    whole-batch working sets) — CSIM_HB_LANE_CHUNK still overrides."""
    if solver not in ("dense", "gmres"):
        raise ValueError(f"unknown HB solver {solver!r} "
                         "(expected 'dense' or 'gmres')")
    dtype = engine.dtype
    N = engine.N
    freqs = [float(f) for f, _ in tones]
    Hs = [int(h) for _, h in tones]
    Ks, ts, residual_p, jacobian_p = make_hbmulti_system(
        engine, tones, nominal_params, b_time_axis=b_time_axis)
    Kt = int(np.prod(Ks))
    if solver == "gmres":
        from jax.scipy.sparse.linalg import gmres as _gmres
        from .hb import _hb_freq_precond
        omegas_np, *trig = _mt_basis(Ks, freqs)
        omegas_j = jnp.asarray(omegas_np, dtype)

    def one_lane(p, X0):
        def newton(c, _):
            X, done = c
            r, aux = residual_p(X, p, with_At=True)
            if solver == "dense":
                J = jacobian_p(aux, p)
                dX = jnp.linalg.solve(J, -r.reshape(-1)).reshape(Kt, N)
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

        (X, _), _ = lax.scan(newton, (X0, jnp.asarray(False)), None,
                             length=n_newton)
        final = jnp.linalg.norm(residual_p(X, p))
        return X, final

    def batched(bp, x0s):
        # full-f32 matmuls — same MXU bf16 floor as make_hb_batched_fn
        with jax.default_matmul_precision("highest"):
            from .hb import _hb_lane_chunk
            B = x0s.shape[0]
            c = _hb_lane_chunk(Kt * N, B, solver,
                               jnp.dtype(dtype).itemsize)
            if not c:
                return jax.vmap(one_lane)(bp, x0s)
            pad = (-B) % c
            if pad:
                bp = jax.tree.map(
                    lambda a: jnp.concatenate(
                        [a, jnp.broadcast_to(a[:1],
                                             (pad,) + a.shape[1:])]),
                    bp)
                x0s = jnp.concatenate(
                    [x0s, jnp.broadcast_to(x0s[:1],
                                           (pad,) + x0s.shape[1:])])
            Bp = B + pad
            bpc = jax.tree.map(
                lambda a: a.reshape(Bp // c, c, *a.shape[1:]), bp)
            x0c = x0s.reshape(Bp // c, c, *x0s.shape[1:])
            Xs, fin = jax.lax.map(
                lambda t: jax.vmap(one_lane)(*t), (bpc, x0c))
            return (Xs.reshape(Bp, *Xs.shape[2:])[:B],
                    fin.reshape(Bp, *fin.shape[2:])[:B])

    return Ks, ts, jax.jit(batched)


def harmonic_balance_multi_batched(engine: Engine, bparams,
                                   tones: Sequence[Tuple[float, int]],
                                   n_newton: int = 12,
                                   tol: float = 1e-9,
                                   damping: float = 1.0,
                                   solver: str = "dense",
                                   x0s=None,
                                   warmup_n_newton: int = 15,
                                   **solver_kw) -> HBMultiBatchResult:
    """Monte-Carlo multi-tone harmonic balance: B perturbed lanes of the
    quasi-periodic steady state as batched programs — the warm-up is the
    BATCHED single-tone HB of the dominant tone (tone-muted per-lane
    params), broadcast onto each lane's MPDE grid, then the multi-tone
    Newton runs vmapped with per-lane freeze.  This is what Monte-Carlo
    IM3/IP3 rides (Simulator.monte_carlo_ip3)."""
    from .hb import make_hb_batched_fn
    dtype = engine.dtype
    N = engine.N
    freqs = [float(f) for f, _ in tones]
    Hs = [int(h) for _, h in tones]
    D_axes = len(tones)
    probe = jax.tree.map(lambda x: x[0], bparams)
    assign_v = assign_tones(np.asarray(engine.vs_kinds),
                            np.asarray(probe["vs_sin"]), freqs)
    assign_i = assign_tones(np.asarray(engine.is_kinds),
                            np.asarray(probe["is_sin"]), freqs)

    # batched tone-0 warm-up ( _mute broadcasts over the lane axis)
    bp0 = dict(bparams)
    bp0["vs_sin"] = _mute(bparams, "vs_sin", assign_v, 0)
    bp0["is_sin"] = _mute(bparams, "is_sin", assign_i, 0)
    if x0s is None:
        from ..parallel.montecarlo import batched_dc_fast
        x0s = batched_dc_fast(engine, bp0)
    _, fn1 = make_hb_batched_fn(engine, freqs[0], n_harm=Hs[0], tol=tol,
                                n_newton=warmup_n_newton)
    Xs1, _ = fn1(bp0, jnp.asarray(x0s))                  # (B, K0, N)
    B = int(Xs1.shape[0])
    Ks = [2 * h + 1 for h in Hs]
    Kt = int(np.prod(Ks))
    X0 = jnp.broadcast_to(
        Xs1.reshape((B, Ks[0]) + (1,) * (D_axes - 1) + (N,)),
        (B,) + tuple(Ks) + (N,)).reshape(B, Kt, N)

    Ks, ts, fn = make_hbmulti_batched_fn(engine, tones, probe,
                                         n_newton=n_newton, tol=tol,
                                         damping=damping, solver=solver,
                                         **solver_kw)
    Xs, finals = fn(bparams, X0)
    Xg = np.asarray(Xs).reshape((B,) + tuple(Ks) + (N,))
    spec = np.fft.fftn(Xg, axes=tuple(range(1, D_axes + 1))) / Kt
    finals = np.asarray(finals)
    floor = 1e-6 if dtype == jnp.float64 else 1e-5
    return HBMultiBatchResult(
        tones=tuple((f, h) for f, h in zip(freqs, Hs)), times=ts,
        xs=Xg, spectrum=spec, residual=finals,
        converged=finals < max(tol * 100, floor))


def coeff_batched(result: HBMultiBatchResult,
                  harmonics: Sequence[int]) -> Any:
    """Per-lane complex coefficient (B, N) of
    exp(j*2pi*(sum_d k_d f_d)*t) — the lane-axis twin of coeff()."""
    idx = []
    for (f, H), k in zip(result.tones, harmonics):
        if abs(k) > H:
            raise ValueError(f"harmonic {k} outside the box (H={H})")
        idx.append(k % (2 * H + 1))
    return result.spectrum[(slice(None),) + tuple(idx)]


def coeff(result: HBMultiResult, harmonics: Sequence[int]) -> Any:
    """Complex coefficient (N,) of exp(j*2pi*(sum_d k_d f_d)*t); negative
    k_d allowed (the exact conjugate symmetry c[-k] = conj(c[k]) holds for
    the real-valued grid)."""
    idx = []
    for (f, H), k in zip(result.tones, harmonics):
        K = 2 * H + 1
        if abs(k) > H:
            raise ValueError(f"harmonic {k} outside the box (H={H})")
        idx.append(k % K)
    return result.spectrum[tuple(idx)]


def evaluate(result: HBMultiResult, t) -> Any:
    """Reconstruct the physical waveform x(t) = x^(t, ..., t); t may be an
    array — returns (*t.shape, N) real samples.  Host-side numpy: no
    complex arithmetic runs on the device (see analysis/hb.py)."""
    t = np.asarray(t, np.float64)
    Ks = [2 * h + 1 for _, h in result.tones]
    N = result.spectrum.shape[-1]
    c = np.asarray(result.spectrum).reshape(-1, N)         # (Kt, N)
    # physical frequency k1 f1 + ... + kD fD of every grid coefficient
    freq = np.zeros(tuple(Ks))
    for d, (f, H) in enumerate(result.tones):
        k = np.concatenate([np.arange(0, H + 1), np.arange(-H, 0)])
        shape = [1] * len(Ks)
        shape[d] = Ks[d]
        freq = freq + (k * f).reshape(shape)
    ph = np.exp(2j * np.pi * np.tensordot(t, freq.reshape(-1), axes=0))
    return np.real(np.tensordot(ph, c, axes=[[-1], [0]]))
