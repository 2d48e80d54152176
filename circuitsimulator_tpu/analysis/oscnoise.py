"""Oscillator phase noise via the perturbation projection vector (PPV).

NEW WORK (no reference equivalent — /root/reference has neither noise nor
any steady-state analysis; its sstateanalysis.cpp is an empty file,
SURVEY.md §2.13).  This completes the noise stack: .NOISE (LTI, driven),
PNOISE (LPTV, driven-periodic), TRNOISE (time domain) — and now the
AUTONOMOUS case, where additive noise becomes unbounded phase diffusion
instead of bounded output noise and LTI/LPTV analysis is singular at the
carrier.

Method (Demir/Mehrotra/Roychowdhury 2000, discretized on the engine's own
trapezoidal step map):

  The converged limit cycle from shooting (analysis/sstate.py) gives K
  per-step states s_0..s_K = s_0 of the one-step solve map F (time-
  invariant for an autonomous deck).  Per-step Jacobians J_k = dF/ds and
  injection gains B_k = dF/d(i_inj) — the response of the NEXT state to a
  current held between a node pair for one step — come from jax.jacfwd
  THROUGH the unrolled in-step Newton solve (exact AD of the converged
  map, no FD epsilon; at the fixed point the iterated-map derivative is
  the implicit-function derivative).

  The PPV v(t_k) is the Floquet left eigenvector of the monodromy
  M = J_{K-1}···J_0 at eigenvalue 1, propagated around the cycle by the
  adjoint recursion v_k = J_k^T v_{k+1} and normalized so v_k·ds/dt = 1
  (an invariant of the recursion — its spread around the cycle is
  returned as a consistency diagnostic).  v_k·δs is then the equivalent
  TIME shift caused by a state perturbation δs: the oscillator's phase
  performs Brownian motion with diffusion constant

      c = (1/T) Σ_k Σ_src (v_{k+1}·B_k e_src)² S_src(x_k) / (2 dt)

  (units: seconds — jitter variance grows as σ²(τ) = c·τ), where
  S_src are the same one-sided device PSDs the .NOISE analysis stamps
  (analysis/noise.py _device_noise_currents: 4kT/R, 2qI, 8kT·gm/3, KF·I^AF/f)
  evaluated along the cycle (cyclostationary modulation included).  The
  single-sideband spectrum is the Lorentzian

      L(Δf) = 10·log10( f0² c / (π² f0⁴ c² + Δf²) )

  — 1/Δf² far out, finite at the carrier (total power is conserved; no
  LTI-style divergence), with the flicker terms entering as
  c(Δf) = c_white + c_flick/Δf (the standard 1/f³ close-in skirt
  approximation).

Validation (tests/test_oscnoise.py): the van der Pol LC tank matches the
classic ISF closed form c = S/(4 A²C²ω²) (tank-current injection has the
sine impulse-sensitivity function), the PPV invariant is flat around the
cycle, and a TRNOISE Monte-Carlo of the same deck reproduces the
predicted absolute-jitter growth — the full chain checked against the
time-domain engine itself.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.assemble import Engine
from ..ops.lu import lu_solve
from .sstate import (OscillatorResult, osc_engine, _split, _join,
                     _dyn_mask)
from .noise import _device_noise_currents


@dataclasses.dataclass
class OscPhaseNoiseResult:
    f0: Any            # oscillation frequency (Hz)
    c: Any             # white phase-diffusion constant (s): var[jitter](τ)=c·τ
    c_flicker: Any     # flicker coefficient (c(Δf) = c + c_flicker/Δf)
    offsets: Any       # (F,) offset frequencies (Hz)
    L_dbc: Any         # (F,) single-sideband phase noise L(Δf), dBc/Hz
    period_jitter: Any  # sqrt(c·T): one-period rms jitter (s)
    by_class: Any      # dict kind -> share of c (R/M/J/D/Q/X=extra)
    per_source: Any    # (nS,) per-generator contribution to c
    kinds: Any         # (nS,) generator kind labels
    ppv: Any           # (K+1, n_dyn) normalized PPV over the DYNAMIC
                       # shooting coordinates (sstate._dyn_mask; the first
                       # N columns are always the node/branch unknowns x)
    w: Any             # (K, nS) per-step time-shift per injected amp (s/A)
    invariance: Any    # rel. spread of v_k·ds_k/dt (≪1 = consistent PPV)
    floquet_err: Any   # |λ_phase − 1| of the monodromy (discretization err)
    lambda2: Any       # second-largest |Floquet multiplier| (<1 = stable)


def _step_with_injection(engine: Engine, params, dt, n_newton: int = 4,
                         dmax: int = 0):
    """One solve step s -> F(s, t, inj) mirroring transient_step_fn's LU
    branch (analysis/transient.py:157-227) with an extra current vector
    `inj` (length N, +into the equation) added to the Newton RHS — the
    hook device noise enters through.  Newton is unrolled (alpha = 1, no
    clamp) so the map is jax-differentiable; seeded from the previous
    orbit point it converges far past the shooting tolerance.

    T-line decks pass dmax = engine.tl_ticks(dt).max(): the delay-ring
    contents ride the shooting vector (sstate._split) and the step
    advances them like the transient does — the map is then the full
    discretized-DDE state map."""
    opts = engine.opts
    N = engine.N
    method = opts.tran_method
    static_I = engine.make_tran_static_I(dt, method)
    update_state = engine.make_update_state(dt, method)
    G_static = engine.tran_static_G(params, dt, opts.tran_gmin, method)

    def step(s, t, inj):
        x, state = _split(engine, s, dmax, params=params)
        I_s = static_I(params, state, t)
        if getattr(engine, "mos_charge", False):
            inv_dt = 1.0 / dt
            qex = ((state["qm"], inv_dt, state["qi"])
                   if method == "trap" else (state["qm"], inv_dt))
        else:
            qex = None
        for _ in range(n_newton):
            G, I = engine.assemble_tran_iter(G_static, I_s, params, x, t,
                                             qex)
            x = lu_solve(G[..., :N, :N], I[..., :N] + inj,
                         opts.lu_pivot_floor)
        state = update_state(params, x, state)
        return _join(x, state)

    return step


def _pair_matrix(pairs: np.ndarray, N: int, dtype) -> np.ndarray:
    """(nS, N) injection directions: +1 at eq a, −1 at eq b; the extended
    ground slot (index N, x_ext convention) and negative indices drop."""
    E = np.zeros((len(pairs), N), np.float64)
    for i, (a, b) in enumerate(np.asarray(pairs)):
        if 0 <= a < N:
            E[i, a] += 1.0
        if 0 <= b < N:
            E[i, b] -= 1.0
    return E.astype(dtype)


def oscillator_phase_noise(engine: Engine, params,
                           osc: OscillatorResult,
                           offsets,
                           extra_pairs: Optional[Sequence[Tuple[int, int]]]
                           = None,
                           extra_psd: Optional[Sequence[float]] = None,
                           n_newton: int = 4) -> OscPhaseNoiseResult:
    """Phase noise of a converged autonomous limit cycle.

    osc: an OscillatorResult from oscillator_steady_state (must carry the
    shooting vector `s`).  offsets: offset frequencies (Hz) for L(Δf).
    extra_pairs/extra_psd: additional white current generators — node
    EQUATION index pairs (b may be −1 = ground) with one-sided PSDs in
    A²/Hz; used e.g. to mirror a TRNOISE source (S = 2·na²·nt) for
    Monte-Carlo cross-checks, or to model noise of devices the built-in
    catalog has no PSD for.
    """
    if osc.s is None:
        raise ValueError("OscillatorResult has no shooting vector; re-run "
                         "oscillator_steady_state (older result object?)")
    engine = osc_engine(engine)          # the stepping the orbit came from
    dtype = engine.dtype
    N = engine.N
    T = 1.0 / float(osc.f0)
    K = int(np.asarray(osc.times).shape[0]) - 1
    dt = jnp.asarray(T / K, dtype)
    step = _step_with_injection(engine, params, dt, n_newton=n_newton)
    ts = jnp.arange(1, K + 1, dtype=dtype) * dt
    zero_inj = jnp.zeros((N,), dtype)

    # ---- re-propagate the cycle, saving the FULL per-step state ----
    def body(s, t):
        s2 = step(s, t, zero_inj)
        return s2, s2

    s_last, s_steps = jax.jit(lambda s: lax.scan(body, s, ts))(
        jnp.asarray(osc.s, dtype))
    ss = jnp.concatenate([jnp.asarray(osc.s, dtype)[None], s_steps])  # (K+1, n_f)
    n_full = ss.shape[-1]

    # the Floquet algebra runs on the DYNAMIC coordinates only: zero-C
    # cap-like slots flip sign every step under trap, planting a spurious
    # (−1)^K = +1 monodromy eigenvalue that would shadow the phase mode
    # (see sstate._dyn_mask) — and their pass-through values are zero-
    # embedded in osc.s, so the closure check must skip them too
    dyn = np.nonzero(_dyn_mask(engine, params))[0]
    n_s = len(dyn)
    closure = float(jnp.linalg.norm(ss[K, dyn] - ss[0, dyn]))

    def embed(s_red):
        return jnp.zeros((n_full,), dtype).at[dyn].set(s_red)

    # ---- per-step Jacobians and injection gains by AD ----
    @jax.jit
    def jac_all(ss_k, ts_k):
        def one(s_red, t):
            f = lambda sr, inj: step(embed(sr), t, inj)[dyn]
            return jax.jacfwd(f, argnums=(0, 1))(s_red, zero_inj)
        return jax.vmap(one)(ss_k, ts_k)

    Js, Bs = jac_all(ss[:K, dyn], ts)     # (K, n_s, n_s), (K, n_s, N)

    # ---- monodromy + Floquet left eigenvector at eigenvalue 1 ----
    def mul(M, J):
        return J @ M, None
    M, _ = jax.jit(lambda Js: lax.scan(mul, jnp.eye(n_s, dtype=dtype), Js))(Js)
    Mh = np.asarray(M, np.float64)
    evals, evecs_left = np.linalg.eig(Mh.T)   # left eigvecs of M
    order = np.argsort(np.abs(evals - 1.0))
    i1 = order[0]
    floquet_err = float(np.abs(evals[i1] - 1.0))
    rest = np.abs(evals[np.arange(len(evals)) != i1])
    lambda2 = float(rest.max()) if len(rest) else 0.0
    u = np.real(evecs_left[:, i1])
    u = u / np.linalg.norm(u)

    # ---- adjoint recursion around the cycle: v_k = J_k^T v_{k+1} ----
    def adj(v, J):
        v2 = J.T @ v
        return v2, v2

    _, vs_rev = jax.jit(lambda Js, u: lax.scan(
        adj, u, Js, reverse=True))(Js, jnp.asarray(u, dtype))
    vs = jnp.concatenate([vs_rev, jnp.asarray(u, dtype)[None]])  # (K+1, n_s)

    # normalize against the cycle tangent: v_k·(ds/dt)_k = 1 (invariant of
    # the recursion — measure its spread as the consistency diagnostic)
    d = (ss[1:, dyn] - ss[:-1, dyn]) / dt       # (K, n_s) tangents
    norms = jnp.einsum("kn,kn->k", vs[:K], d)
    mean_n = jnp.mean(norms)
    invariance = float(jnp.std(norms) / jnp.abs(mean_n))
    vs = vs / mean_n

    # ---- noise generators along the cycle ----
    xs = ss[:K, :N]
    pairs, _, _, kinds = _device_noise_currents(engine, params, ss[0, :N])
    kinds = list(kinds)

    if len(pairs):
        def psds(x):
            _, sw, sf, _ = _device_noise_currents(engine, params, x)
            return sw, sf
        S_w, S_f = jax.jit(jax.vmap(psds))(xs)     # (K, nS) each
        E = jnp.asarray(_pair_matrix(pairs, N, np.float64), dtype)
    else:
        S_w = jnp.zeros((K, 0), dtype)
        S_f = jnp.zeros((K, 0), dtype)
        E = jnp.zeros((0, N), dtype)
    if extra_pairs is not None:
        ep = np.asarray(extra_pairs, np.int64).reshape(-1, 2)
        # map ground (−1) to the drop slot; node-equation index space
        Ex = jnp.asarray(_pair_matrix(ep, N, np.float64), dtype)
        E = jnp.concatenate([E, Ex])
        sx = jnp.broadcast_to(jnp.asarray(extra_psd, dtype), (K, len(ep)))
        S_w = jnp.concatenate([S_w, sx], axis=-1)
        S_f = jnp.concatenate([S_f, jnp.zeros((K, len(ep)), dtype)], axis=-1)
        kinds += ["X"] * len(ep)
    nS = E.shape[0]
    if nS == 0:
        raise ValueError("no noise generators: the deck has no noisy "
                         "devices and no extra_pairs were given")

    # time-shift per injected amp (held one step): w[k,s] = v_{k+1}·B_k e_s
    w = jnp.einsum("kns,kn->ks", Bs @ E.T, vs[1:K + 1])   # (K, nS)

    # ---- diffusion constant & spectrum ----
    dtf = float(dt)
    per_src_w = jnp.sum(w * w * S_w, axis=0) / (2.0 * dtf * T)   # (nS,)
    per_src_f = jnp.sum(w * w * S_f, axis=0) / (2.0 * dtf * T)
    c = float(jnp.sum(per_src_w))
    c_fl = float(jnp.sum(per_src_f))

    offsets = np.asarray(offsets, np.float64)
    f0 = float(osc.f0)
    c_off = c + c_fl / np.maximum(offsets, 1e-30)
    L = 10.0 * np.log10(f0 ** 2 * c_off
                        / (np.pi ** 2 * f0 ** 4 * c ** 2 + offsets ** 2))

    kind_arr = np.asarray(kinds)
    per_source = np.asarray(per_src_w)
    by_class = {}
    for k in ("R", "M", "J", "D", "Q", "X"):
        sel = np.nonzero(kind_arr == k)[0]
        if len(sel):
            by_class[k] = float(per_source[sel].sum())

    # the shooting propagator stops each step's Newton at tran_tol (~1e-6)
    # while this re-propagation runs 4 full iterations, so ~1e-3 relative
    # closure is expected tolerance mismatch, not divergence
    if closure > 3e-3 * float(jnp.linalg.norm(ss[0, dyn])):
        import sys
        print(f"oscnoise: cycle closure residual {closure:.2e} — the "
              "shooting solution may not be converged", file=sys.stderr)

    return OscPhaseNoiseResult(
        f0=f0, c=c, c_flicker=c_fl, offsets=offsets, L_dbc=L,
        period_jitter=float(np.sqrt(max(c, 0.0) * T)),
        by_class=by_class, per_source=per_source, kinds=kind_arr,
        ppv=vs, w=w, invariance=invariance,
        floquet_err=floquet_err, lambda2=lambda2)


@dataclasses.dataclass
class PSSFloquetResult:
    f0: float            # drive frequency the period was solved at
    multipliers: Any     # (n_dyn,) complex Floquet multipliers, sorted
    #                      by |.| descending
    stable: bool         # all |multiplier| < threshold
    lambda_max: float    # largest |multiplier|
    closure: float       # re-propagation closure residual (sanity)


def pss_floquet(engine: Engine, params, ss,
                f0: Optional[float] = None,
                threshold: float = 1.0 - 1e-6,
                n_newton: int = 4) -> PSSFloquetResult:
    """Floquet stability of a DRIVEN periodic steady state: eigenvalues
    of the one-period monodromy d(Phi)/ds around the shooting solution.
    All |lambda| < 1 means the PSS is an attractor of the transient
    flow; |lambda| > 1 flags a solution the time-domain circuit can
    never settle on (shooting and HB happily converge to such
    repellors — e.g. the unstable equilibrium cycle of a circuit with
    net negative conductance, or a parametric divider past its
    threshold); |lambda| -> 1 from below warns of slow settling or an
    imminent bifurcation (lambda -> -1: period doubling; complex pair
    on the unit circle: quasi-periodic/Neimark-Sacker).

    ss: a SteadyStateResult from steady_state() (must carry the
    shooting vector `s`).  Autonomous decks analyzed through this path
    show the obligatory phase-mode multiplier at +1.  Same per-step
    jacfwd-through-Newton machinery as the phase-noise PPV, with the
    drive's time dependence kept (the map is time-varying here)."""
    if getattr(ss, "s", None) is None:
        raise ValueError("SteadyStateResult has no shooting vector; "
                         "re-run steady_state (older result object?)")
    f0 = float(f0 if f0 is not None else ss.f0)
    if not f0 or f0 <= 0:
        raise ValueError("pss_floquet needs the drive f0")
    engine = osc_engine(engine)
    dtype = engine.dtype
    T = 1.0 / f0
    K = int(np.asarray(ss.times).shape[0]) - 1
    dt = jnp.asarray(T / K, dtype)
    # T-line decks: the delay ring is part of the discretized-DDE state —
    # its slots ride the shooting vector and the monodromy (r5; the ring
    # rows give the line's wave-storage Floquet modes, |lambda| set by
    # the port reflection coefficients)
    dmax = int(engine.tl_ticks(dt).max()) if engine.n_tl else 0
    step = _step_with_injection(engine, params, dt, n_newton=n_newton,
                                dmax=dmax)
    ts = jnp.arange(1, K + 1, dtype=dtype) * dt
    zero_inj = jnp.zeros((engine.N,), dtype)

    def body(s, t):
        s2 = step(s, t, zero_inj)
        return s2, s2

    s0 = jnp.asarray(ss.s, dtype)
    _, s_steps = jax.jit(lambda s: lax.scan(body, s, ts))(s0)
    ss_all = jnp.concatenate([s0[None], s_steps])
    n_full = ss_all.shape[-1]

    dyn = np.nonzero(_dyn_mask(engine, params, dmax))[0]
    n_s = len(dyn)
    closure = float(jnp.linalg.norm(ss_all[K, dyn] - ss_all[0, dyn]))

    def embed(s_red):
        return jnp.zeros((n_full,), dtype).at[dyn].set(s_red)

    @jax.jit
    def jac_all(ss_k, ts_k):
        def one(s_red, t):
            return jax.jacfwd(
                lambda sr: step(embed(sr), t, zero_inj)[dyn])(s_red)
        return jax.vmap(one)(ss_k, ts_k)

    Js = jac_all(ss_all[:K, dyn], ts)

    def mul(M, J):
        return J @ M, None
    M, _ = jax.jit(lambda Js: lax.scan(
        mul, jnp.eye(n_s, dtype=dtype), Js))(Js)
    evals = np.linalg.eigvals(np.asarray(M, np.float64))
    order = np.argsort(-np.abs(evals))
    evals = evals[order]
    lam = float(np.abs(evals[0])) if n_s else 0.0
    return PSSFloquetResult(
        f0=f0, multipliers=evals, stable=bool(lam < threshold),
        lambda_max=lam, closure=closure)


@dataclasses.dataclass
class InjectionLockResult:
    f0: float            # free-running frequency (Hz)
    amp: float           # injected current amplitude (A)
    lock_range_hz: float  # ONE-SIDED Adler lock range: locks for
    #                      |f_inj - f0| <= lock_range_hz
    k_per_amp: float     # lock range per injected amp, f0*|p1| (Hz/A)
    p1: complex          # fundamental Fourier coefficient of the PPV
    #                      projected on the injection port (1/A·s units
    #                      folded: p(t) = v(t)·u/dt)
    harmonic: int        # injection harmonic m (lock near m*f0)
    pn: OscPhaseNoiseResult  # the underlying PPV computation


def injection_lock(engine: Engine, params, osc: OscillatorResult,
                   pair: Tuple[int, int], amp: float,
                   harmonic: int = 1,
                   n_newton: int = 4) -> InjectionLockResult:
    """Adler-type injection-locking range from the oscillator PPV.

    A small current i(t) = amp·cos(2π f_inj t) injected into the node-
    equation pair `pair` (b may be −1 = ground) perturbs the phase as
    dα/dt = p(t+α)·i(t) with p(t) = v(t)ᵀu the PPV projected on the
    injection direction (time shift per amp·second).  Averaging the
    product for f_inj near m·f0 keeps only p's m-th Fourier coefficient
    p_m: with θ the slow beat phase, dθ/dt = Δω + m·ω0·amp·|p_m|·cosθ,
    so the oscillator locks iff |f_inj − m·f0| ≤ m·f0·amp·|p_m| — the
    generalized Adler equation (for the classic LC tank the sine ISF
    gives |p_1| = 1/(2·A·C·ω0), hence Δf = amp/(4π·A·C) — the ISF form
    of Adler's f0·I/(2Q·I_osc) law).  `harmonic` m > 1 predicts superharmonic
    injection locking at m·f0 (sub-harmonic injection at f0/m rides the
    same coefficient through the circuit's own mixing and is NOT
    covered by this first-order formula).

    The unlocked side of the story is the standard beat: for
    |Δf| > lock range the mean oscillation frequency is pulled to
    f_inj + sign(Δf)·sqrt(Δf² − lock_range²).
    """
    if amp <= 0:
        raise ValueError("injection amplitude must be > 0")
    m = int(harmonic)
    if m < 1:
        raise ValueError("harmonic must be >= 1")
    K_osc = int(np.asarray(osc.times).shape[0]) - 1
    if 2 * m >= K_osc:
        raise ValueError(
            f"harmonic={m} is at/above the Nyquist limit of the K="
            f"{K_osc}-sample PPV grid: p_m would alias. Re-run "
            "oscillator shooting with more samples per period.")
    pn = oscillator_phase_noise(engine, params, osc,
                                offsets=[float(osc.f0) * 1e-3],
                                extra_pairs=[tuple(pair)],
                                extra_psd=[0.0], n_newton=n_newton)
    w = np.asarray(pn.w)                  # (K, nS); injection port last
    K = w.shape[0]
    T = 1.0 / float(osc.f0)
    dt = T / K
    p = w[:, -1] / dt                     # time-shift rate per amp
    p_m = np.mean(p * np.exp(-2j * np.pi * m * np.arange(K) / K))
    k_per_amp = m * float(osc.f0) * abs(p_m)
    return InjectionLockResult(
        f0=float(osc.f0), amp=float(amp),
        lock_range_hz=k_per_amp * float(amp),
        k_per_amp=k_per_amp, p1=complex(p_m), harmonic=m, pn=pn)
