"""Periodic steady-state analysis (the `.hb f0 nHarm` card).

NEW WORK: the reference parses `.hb` (parser.cpp:551-572, sim.hpp:187-191)
but its steady-state module (src/sstateanalysis.cpp) is an empty file — there
is no reference implementation or output to match (SURVEY.md §2.13).

Method: single-shooting on the Backward-Euler propagator.  The circuit's
dynamical state is s = [x, cap_hist, ind_i] (node solution + every
capacitor-like voltage + inductor currents, see ops/assemble.py); one period
T = 1/f0 of the transient defines the map Phi(s).  The steady state solves
Phi(s) = s by damped Newton, with the (n_s x n_s) shooting Jacobian formed
column-by-column via *vmapped* finite differences — all n_s+1 propagations
run as one batched transient, which is exactly the fan-out TPUs like.
A few warm-up periods from the DC point precede the Newton loop so shooting
starts near the attractor.

Assumes periodic drive: all waveforms must be T-periodic over the shooting
window.  SIN sources whose delay exceeds the window are constant (this is
how dbmixer.sp's "180-second-delay" sources behave) and therefore fine; a
delay inside (0, T) makes the drive aperiodic and is reported.

Validation is self-consistent (SURVEY.md §4.3): the returned residual
||Phi(s*) - s*|| certifies periodicity, and the one-period waveform is
produced by the same transient engine the golden tests validate.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.assemble import Engine
from ..ops.lu import lu_solve
from .dc import dc_operating_point
from .transient import transient_step_fn


@dataclasses.dataclass
class SteadyStateResult:
    times: Any       # (K+1,) one period, t in [0, T]
    xs: Any          # (K+1, N) periodic waveform (xs[0] == state at t=0)
    residual: Any    # ||Phi(s*) - s*|| per Newton convergence
    newton_iters: int
    freqs: Any       # (nHarm+1,) harmonic frequencies 0..nHarm*f0
    spectrum: Any    # (nHarm+1, N) complex Fourier coefficients of xs
    converged: Any
    s: Any = None    # converged shooting vector [x, vc, ic, il, vl] at
                     # t=0 — Floquet stability (oscnoise.pss_floquet)
                     # re-propagates from it
    f0: Any = None   # the drive frequency the period was solved at


_STATE_KEYS = ("vc", "ic", "il", "vl")


def _split(engine: Engine, s, dmax: int = 0, params=None):
    """Flat shooting vector -> (x, TranState dict).  With transmission
    lines the delay-ring contents (dmax, 2*nT) are legitimate shooting
    unknowns too (a periodic line carries a periodic wave pattern).

    Under mos_cap_model='charge' the vector gains the 5·nM trapezoidal
    charge-current history slots 'qi' (independent state, like 'ic');
    the accepted charges 'qm' are DERIVED (qm = q(x), the previous
    step's solution is x itself at the period boundary) and recomputed
    here — which is why `params` is then required."""
    N = engine.N
    nc = engine.n_caplike
    nL = len(engine.topo.ind_k)
    sizes = {"vc": nc, "ic": nc, "il": nL, "vl": nL}
    x = s[..., :N]
    state = {}
    off = N
    for k in _STATE_KEYS:
        state[k] = s[..., off:off + sizes[k]]
        off += sizes[k]
    if getattr(engine, "mos_charge", False):
        if params is None:
            raise ValueError("charge cap model: _split needs params "
                             "(qm = q(x) is recomputed)")
        from ..models.moscap import charges_of_x
        nM = len(engine.topo.mos_ed)
        state["qi"] = s[..., off:off + 5 * nM].reshape(
            *s.shape[:-1], nM, 5)
        off += 5 * nM
        state["qm"] = charges_of_x(engine.mos_vdgs(x), params)
    if engine.n_tl:
        n2 = 2 * engine.n_tl
        state["tlw"] = s[..., off:off + dmax * n2].reshape(
            *s.shape[:-1], dmax, n2)
    return x, state


def _join(x, state):
    parts = [x] + [state[k] for k in _STATE_KEYS]
    if "qi" in state:
        qi = state["qi"]
        parts.append(qi.reshape(*qi.shape[:-2], -1))
    if "tlw" in state:
        ring = state["tlw"]
        parts.append(ring.reshape(*ring.shape[:-2], -1))
    return jnp.concatenate(parts, axis=-1)


def _minnorm_solve(A, b, rcond: float = 1e-8):
    """Minimum-norm least-squares solve via SVD, zeroing directions with
    singular value < rcond·σ_max.  The shooting Jacobian J − I (and the
    augmented oscillator system) can carry EXACTLY NEUTRAL directions no
    topological mask can catch: the trapezoidal companion's homogeneous
    (−1)^k mode on a cap whose current feeds back into nothing (e.g. a
    cap hanging on a voltage-source-pinned node) maps to itself over an
    even number of steps — a zero row AND zero column.  Its residual is
    ~0 at any fixed point (periodic closure), so the correct Newton
    update along it is 0 — which is what the pseudo-inverse returns,
    where a pivot-floored LU returns garbage amplified by 1/floor.
    Measured spectrum on an inverter PSS: genuine modes cluster at
    σ ∈ [1, 2], neutrals at ≤ 3e-12 — the 1e-8 cutoff sits in a six-
    decade gap."""
    u_, s_, vt = jnp.linalg.svd(A, full_matrices=False)
    keep = s_ > rcond * s_[0]
    inv = jnp.where(keep, 1.0 / jnp.where(keep, s_, 1.0), 0.0)
    return vt.T @ (inv * (u_.T @ b))


def _dyn_mask(engine: Engine, params, dmax: int = 0) -> np.ndarray:
    """Which shooting-vector entries are genuine unknowns.  Zero-valued
    cap-like slots (the four lumped MOS junction caps exist even with
    CJ0 = 0, ops/assemble.py _caplike_C) are NOT state: their `vc` is a
    pass-through and their trapezoidal `ic` carry flips sign every step
    (ic' = (2C/dt)(v'-v) - ic with C = 0), so over an even number of
    steps the period map is exactly identity on those rows — zero rows
    in the shooting Jacobian J - I that freeze the whole Newton (du = 0
    at pivot-floored LU).  Excluded entries propagate as zeros and are
    reconstructed by update_state each step."""
    cvals = np.asarray(engine._caplike_C(params))
    # a cap whose two terminals are the SAME equation (e.g. the MOS Csb
    # lump with source and bulk both grounded) has vc ≡ 0 — the same
    # (−1)^K trap pathology as C = 0, whatever its C value
    cap_on = (cvals > 0.0) & (engine.cap_a != engine.cap_b)
    nL = len(engine.topo.ind_k)
    parts = [np.ones(engine.N, bool), cap_on, cap_on,
             np.ones(nL, bool), np.ones(nL, bool)]
    if getattr(engine, "mos_charge", False):
        # 'qi' slots (qd, qg, qs, qsb, qdb per MOS): the gate-charge
        # currents are state iff the device has oxide charge, the
        # junction ones iff it has CJ0 — a q ≡ 0 slot flips sign every
        # trap step (qi' = -qi), the same (−1)^K identity pathology as
        # the zero-C lumps above
        t = engine.topo
        coxwl = np.asarray(params["mos_coxwl"]) > 0.0
        cj0 = np.asarray(params["mos_cj0"]) > 0.0
        # degenerate junctions (S = B or D = B, e.g. grounded source with
        # the default grounded bulk) have v_j ≡ 0 so q_j ≡ 0 — same
        # pathology as above
        sb_ok = np.asarray(t.mos_es) != np.asarray(t.mos_eb)
        db_ok = np.asarray(t.mos_ed) != np.asarray(t.mos_eb)
        qm = np.stack([coxwl, coxwl, coxwl, cj0 & sb_ok, cj0 & db_ok],
                      axis=-1)
        parts.append(qm.reshape(-1))
    if engine.n_tl:
        parts.append(np.ones(dmax * 2 * engine.n_tl, bool))
    return np.concatenate(parts) if parts else np.zeros(0, bool)


def steady_state(engine: Engine, params, f0: float,
                 n_harm: int = 8,
                 steps_per_period: int = 512,
                 warmup_periods: int = 8,
                 max_newton: int = 15,
                 tol: float = 1e-9,
                 fd_eps: float = 1e-6):
    """Compute the periodic steady state.  Returns SteadyStateResult.

    mos_cap_model='charge': the shooting vector gains the trapezoidal
    charge-current slots (see _split); the accepted charges themselves
    are derived from x and carry no unknowns."""
    # trapezoidal + tight per-step tolerance (osc_engine): BE's numerical
    # damping costs O(dt) amplitude on every tank (measured 3e-3 at 512
    # steps/period on a matched line) and the 1e-6 early-stop biases the
    # map coherently — same findings as the autonomous solver
    engine = osc_engine(engine)
    dtype = engine.dtype
    T = 1.0 / f0
    K = int(steps_per_period)
    dt = jnp.asarray(T / K, dtype)
    step = transient_step_fn(engine, params, dt)
    ts = jnp.arange(1, K + 1, dtype=dtype) * dt
    dmax = int(engine.tl_ticks(dt).max()) if engine.n_tl else 0

    def propagate(s):
        x, state = _split(engine, s, dmax, params)
        failed = jnp.zeros(x.shape[:-1], dtype=bool)

        def body(c, t):
            c, _ = step(c, t)
            return c, None

        (x, state, _), _ = lax.scan(body, (x, state, failed), ts)
        return _join(x, state)

    def propagate_save(s):
        x, state = _split(engine, s, dmax, params)
        failed = jnp.zeros(x.shape[:-1], dtype=bool)

        def body(c, t):
            c, (xo, _) = step(c, t)
            return c, xo

        (xf, state, _), xs = lax.scan(body, (x, state, failed), ts)
        return _join(xf, state), xs

    # ---- initial state: DC + warm-up periods ----
    x0 = dc_operating_point(engine, params)
    s = _join(x0, engine.init_state(x0, params, dt))
    prop_jit = jax.jit(propagate)
    for _ in range(warmup_periods):
        s = prop_jit(s)

    n_full = s.shape[-1]
    # Newton runs on the DYNAMIC entries only: zero-C cap-like slots are
    # pass-throughs (and sign-flippers under trap) that make J - I
    # singular — see _dyn_mask
    dyn = np.nonzero(_dyn_mask(engine, params, dmax))[0]
    n_s = len(dyn)
    eye = jnp.eye(n_s, dtype=dtype)

    def embed(s_red, base):
        return base.at[dyn].set(s_red)

    @jax.jit
    def newton_step(s):
        s_red = s[dyn]
        phi0 = propagate(s)
        r = phi0[dyn] - s_red
        # batched finite-difference Jacobian of Phi (dynamic block)
        eps = jnp.asarray(fd_eps, dtype)
        pert = jax.vmap(lambda e: embed(s_red + eps * e, s))(eye)
        phis = jax.vmap(propagate)(pert)
        J = (phis[:, dyn] - phi0[None, dyn]).T / eps   # dPhi/ds
        A = J - eye                                    # d(Phi - id)/ds
        # The period-map Jacobian J - I carries exactly-neutral
        # directions the _dyn_mask cannot catch on ANY deck (pinned-node
        # cap modes — see _minnorm_solve's measured inverter spectrum;
        # charge decks add q-slot identities): min-norm SVD returns the
        # correct 0 update along them where a pivot-floored LU amplifies
        # garbage and freezes the Newton.  The cutoff must sit BELOW any
        # genuine slow mode's |Floquet multiplier - 1| ~ T/tau (a bias
        # filter with tau = 1e4 T gives sigma ~ 1e-4·kappa) yet above
        # the exact neutrals (measured <= 3e-12): f64 shooting uses
        # 1e-10 so slow-but-real modes keep their (large, correct)
        # Newton step; f32 keeps 1e-8 — below that is FD/roundoff noise.
        rc = 1e-10 if dtype == jnp.float64 else 1e-8
        ds = _minnorm_solve(A, -r, rcond=rc)
        res = jnp.linalg.norm(r)
        return embed(s_red + ds, phi0), res

    res = jnp.asarray(jnp.inf, dtype)
    iters = 0
    for i in range(max_newton):
        s_new, res = newton_step(s)
        iters = i + 1
        s_val = jax.device_get(res)
        s = jnp.where(jnp.isfinite(res), s_new, s)
        if float(s_val) < tol:
            break

    # final verification + one saved period
    s_out, xs = jax.jit(propagate_save)(s)
    final_res = jnp.linalg.norm(s_out - s)
    x_first, _ = _split(engine, s, dmax, params)
    xs_all = jnp.concatenate([x_first[None], xs], axis=0)
    times = jnp.concatenate([jnp.zeros((1,), dtype), ts])

    # harmonic spectrum: complex Fourier coefficients c_k = (2/K) sum x e^{-jkwt}
    # (k=0 term halved -> plain mean), from the K periodic samples xs[0:K]
    period_samples = xs_all[:K]
    fft = jnp.fft.rfft(period_samples, axis=0) / K
    nh = min(n_harm, fft.shape[0] - 1)
    coeffs = fft[: nh + 1] * 2.0
    coeffs = coeffs.at[0].divide(2.0)
    freqs = jnp.arange(nh + 1, dtype=dtype) * f0

    return SteadyStateResult(
        times=times, xs=xs_all, residual=final_res,
        newton_iters=iters, freqs=freqs, spectrum=coeffs,
        converged=final_res < tol * 10, s=s, f0=f0,
    )


@dataclasses.dataclass
class OscillatorResult:
    f0: Any          # solved oscillation frequency
    times: Any       # (K+1,) one period
    xs: Any          # (K+1, N)
    residual: Any
    newton_iters: int
    converged: Any
    s: Any = None    # converged shooting vector [x, vc, ic, il, vl] at t=0
                     # (the starting state of `xs`) — phase-noise analysis
                     # (analysis/oscnoise.py) re-propagates from it


def osc_engine(engine: Engine) -> Engine:
    """The engine clone oscillator shooting (and any analysis that must
    re-trace its limit cycle, e.g. phase noise) steps with: LU transient
    backend (a per-T Woodbury refactor buys nothing when T is a Newton
    unknown), TRAPEZOIDAL integration — BE's numerical damping acts
    like a parasitic conductance g ~ C·w^2·dt across every tank, visibly
    shrinking the limit cycle at practical steps/period — and a TIGHT
    per-step Newton tolerance: the default 1e-6 early-stop biases the
    period map coherently (measured ~1e-4 relative f0 error on van der
    Pol, NOT shrinking with steps/period); at 1e-9 the shooting f0
    converges O(dt²) onto the spectrally-exact autonomous-HB value
    (tests/test_hbosc.py)."""
    import jax.numpy as jnp
    opts = engine.opts
    tol = (min(float(opts.tran_tol), 1e-9)
           if engine.dtype == jnp.float64 else float(opts.tran_tol))
    if (opts.tran_solver == "lu" and opts.tran_method == "trap"
            and float(opts.tran_tol) <= tol):
        return engine
    import copy
    eng = copy.copy(engine)              # shared scatter patterns
    eng.opts = opts.replace(tran_solver="lu", tran_method="trap",
                            tran_tol=tol)
    return eng


def oscillator_steady_state(engine: Engine, params, f0_guess: float,
                            anchor_eq: int,
                            steps_per_period: int = 256,
                            warmup_periods: int = 30,
                            max_newton: int = 25,
                            tol: float = 1e-9,
                            fd_eps: float = 1e-7,
                            damping: float = 1.0,
                            kick: float = 0.5):
    """Periodic steady state of an AUTONOMOUS circuit (extension): the
    period is a Newton unknown alongside the state.

    Free-running oscillators have no drive to pin the period, and any time
    shift of a solution is another solution, so the shooting system is
    augmented the standard way: unknowns u = [s, T], equations
    Phi_T(s) - s = 0 plus a phase anchor pinning one state coordinate to
    its warmed-up value (removing the time-shift null direction).

    The propagator integrates a FIXED number of BE steps with dt = T/K, so
    T flows through the companion conductances as a traced value — the
    whole augmented Newton system stays one jitted program; the (n_s+1)
    finite-difference Jacobian columns run as one vmapped batch of
    propagations (the same fan-out the driven shooting uses).  The LU
    transient backend is forced (a per-T Woodbury refactor would buy
    nothing here).

    Warmup: run `warmup_periods` of the guessed period so the trajectory
    settles onto the limit cycle, then refine the period estimate from
    the anchor node's last two upward mean-crossings.
    """
    from .transient import transient_step_fn
    if engine.n_tl:
        raise NotImplementedError(
            "oscillator shooting does not support transmission lines: "
            "the unknown period makes dt — and with it the delay-ring "
            "length — change every Newton iteration (a dynamic state "
            "shape). Use the harmonic-balance oscillator instead "
            "(Simulator.oscillator_hb / analysis/hbosc.py), which "
            "treats T-line delays EXACTLY via band-limited shift "
            "operators traced through f0.")
    engine = osc_engine(engine)
    dtype = engine.dtype
    K = int(steps_per_period)

    # ---- warmup on the guessed period ----
    dt_w = jnp.asarray(1.0 / (f0_guess * K), dtype)
    step_w = transient_step_fn(engine, params, dt_w)
    x0 = dc_operating_point(engine, params)
    # an asymmetric kick so the trajectory leaves the unstable equilibrium
    # within the warmup budget: startup growth is slow (the envelope rate
    # g/(2C) fights BE's numerical damping ~ w^2 dt / 2), so a volt-scale
    # kick beats waiting out e-folding from microvolts
    x0 = x0.at[anchor_eq].add(jnp.asarray(kick, dtype))
    state = engine.init_state(x0, params, dt_w)
    carry = (x0, state, jnp.zeros(x0.shape[:-1], bool))
    n_w = warmup_periods * K
    tw = jnp.arange(1, n_w + 1, dtype=dtype) * dt_w

    def wbody(c, t):
        c, (xo, _) = step_w(c, t)
        return c, xo

    carry, xs_w = jax.jit(lambda c, t: lax.scan(wbody, c, t))(carry, tw)
    xs_w = np.asarray(xs_w)
    ya = xs_w[:, anchor_eq]
    mean = ya[-4 * K:].mean()
    up = np.nonzero((ya[:-1] < mean) & (ya[1:] >= mean))[0]
    if len(up) >= 2:
        T0 = float((up[-1] - up[-2]) * float(dt_w))
    else:
        T0 = 1.0 / f0_guess

    # restart the shooting state AT an upward mean-crossing so the phase
    # anchor is transversal (anchoring at a waveform extremum makes the
    # augmented Jacobian singular in the phase direction)
    def cbody(c, t):
        c, (xo, _) = step_w(c, t)
        return c, (c[0], c[1])

    carry2, (xs_c, st_c) = jax.jit(
        lambda c, t: lax.scan(cbody, c, t))(
            carry, tw[-1] + jnp.arange(1, 2 * K + 1, dtype=dtype) * dt_w)
    yc = np.asarray(xs_c)[:, anchor_eq]
    upc = np.nonzero((yc[:-1] < mean) & (yc[1:] >= mean))[0]
    idx = int(upc[0] + 1) if len(upc) else 0
    x_start = xs_c[idx]
    state_start = jax.tree.map(lambda a: a[idx], st_c)
    anchor_val = jnp.asarray(np.asarray(xs_c)[idx, anchor_eq], dtype)
    s0_full = _join(x_start, state_start)
    n_full = s0_full.shape[-1]
    mask = _dyn_mask(engine, params)
    dyn = np.nonzero(mask)[0]
    s0 = s0_full[dyn]
    n_s = s0.shape[-1]
    red_anchor = int(np.searchsorted(dyn, anchor_eq))

    def embed(s_red):
        return jnp.zeros((n_full,), dtype).at[dyn].set(s_red)

    # ---- augmented shooting: unknowns [s_dyn, T] ----
    def propagate(s_red, T):
        dt = T / K
        step = transient_step_fn(engine, params, dt)
        x, state = _split(engine, embed(s_red), params=params)
        failed = jnp.zeros(x.shape[:-1], dtype=bool)
        ts = jnp.arange(1, K + 1, dtype=dtype) * dt

        def body(c, t):
            c, _ = step(c, t)
            return c, None

        (xf, st, _), _ = lax.scan(body, (x, state, failed), ts)
        return _join(xf, st)[dyn]

    def residual(u):
        s, T = u[:-1], u[-1]
        r = propagate(s, T) - s
        return jnp.concatenate([r, (s[red_anchor] - anchor_val)[None]])

    @jax.jit
    def newton_step(u):
        r0 = residual(u)
        eps = jnp.asarray(fd_eps, dtype)
        # per-column FD scales: O(1) for the state entries (volts/amps),
        # RELATIVE for the period — T is ~1e-7 s, an absolute 1e-7
        # perturbation would be a ~full-period kick
        scale = jnp.concatenate(
            [jnp.maximum(jnp.abs(u[:-1]), 1.0), jnp.abs(u[-1:])])
        pert = u[None, :] + eps * scale[None, :] * jnp.eye(n_s + 1, dtype=dtype)
        rs = jax.vmap(residual)(pert)
        J = (rs - r0[None, :]).T / (eps * scale[None, :])
        # Unlike steady_state's period map, the AUGMENTED oscillator
        # system (phase anchor row + period column) is generically
        # nonsingular and its small-but-real modes matter: the SVD
        # cutoff clipped them on the VdP shooting decks (r4 regression —
        # frequency stalled at the guess), so non-charge decks solve by
        # LU.  Charge decks do carry exactly-neutral q-slot identities
        # (see _dyn_mask) and keep the min-norm pseudo-inverse.
        if getattr(engine, "mos_charge", False):
            du = _minnorm_solve(J, -r0)
        else:
            du = lu_solve(J, -r0, engine.opts.lu_pivot_floor)
        return u + damping * du, jnp.linalg.norm(r0)

    import os
    dbg = bool(os.environ.get("CSIM_OSC_DEBUG"))
    u = jnp.concatenate([s0, jnp.asarray([T0], dtype)])
    res = jnp.asarray(jnp.inf, dtype)
    iters = 0
    for i in range(max_newton):
        u_new, res = newton_step(u)
        iters = i + 1
        if dbg:
            du = np.asarray(u_new - u)
            print(f"osc newton {i}: res={float(res):.3e} "
                  f"T={float(u[-1]):.9e} dT={du[-1]:.3e} "
                  f"|du_s|={np.linalg.norm(du[:-1]):.3e}", flush=True)
        if not bool(jnp.isfinite(res)):
            break
        # keep T positive and sane
        u_new = u_new.at[-1].set(jnp.clip(u_new[-1], 0.2 * T0, 5.0 * T0))
        u = u_new
        if float(res) < tol:
            break

    s_fin, T_fin = embed(u[:-1]), u[-1]
    dt = T_fin / K
    step = transient_step_fn(engine, params, dt)
    x, state = _split(engine, s_fin, params=params)
    failed = jnp.zeros(x.shape[:-1], dtype=bool)
    ts = jnp.arange(1, K + 1, dtype=dtype) * dt

    def sbody(c, t):
        c, (xo, _) = step(c, t)
        return c, xo

    (xf, _, _), xs = jax.jit(
        lambda c, t: lax.scan(sbody, c, t))((x, state, failed), ts)
    xs_all = jnp.concatenate([x[None], xs], axis=0)
    times = jnp.concatenate([jnp.zeros((1,), dtype), ts])
    final = jnp.linalg.norm(residual(u))
    return OscillatorResult(
        f0=1.0 / float(T_fin), times=times, xs=xs_all, residual=final,
        newton_iters=iters, converged=float(final) < tol * 100,
        s=s_fin)


def harmonic_table(topo, result: SteadyStateResult, node_names=None) -> str:
    """Text table of harmonic magnitudes per node voltage column."""
    names = list(topo.volt_col_names)
    if node_names:
        sel = [n for n in node_names if n in names]
    else:
        sel = names
    spec = np.asarray(result.spectrum)
    freqs = np.asarray(result.freqs)
    lines = ["==== Steady-state harmonics (|V| per node) ===="]
    header = "freq(Hz)      " + "  ".join(f"V({n})".ljust(12) for n in sel)
    lines.append(header)
    for k, f in enumerate(freqs):
        row = [f"{f:.4e}"] + [
            f"{abs(spec[k, topo.volt_col_eqs[names.index(n)]]):.6e}"
            for n in sel]
        lines.append("  ".join(c.ljust(12) for c in row))
    return "\n".join(lines)
