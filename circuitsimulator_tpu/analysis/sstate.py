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


_STATE_KEYS = ("vc", "ic", "il", "vl")


def _split(engine: Engine, s, dmax: int = 0):
    """Flat shooting vector -> (x, TranState dict).  With transmission
    lines the delay-ring contents (dmax, 2*nT) are legitimate shooting
    unknowns too (a periodic line carries a periodic wave pattern)."""
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
    if engine.n_tl:
        n2 = 2 * engine.n_tl
        state["tlw"] = s[..., off:off + dmax * n2].reshape(
            *s.shape[:-1], dmax, n2)
    return x, state


def _join(x, state):
    parts = [x] + [state[k] for k in _STATE_KEYS]
    if "tlw" in state:
        ring = state["tlw"]
        parts.append(ring.reshape(*ring.shape[:-2], -1))
    return jnp.concatenate(parts, axis=-1)


def steady_state(engine: Engine, params, f0: float,
                 n_harm: int = 8,
                 steps_per_period: int = 512,
                 warmup_periods: int = 8,
                 max_newton: int = 15,
                 tol: float = 1e-9,
                 fd_eps: float = 1e-6):
    """Compute the periodic steady state.  Returns SteadyStateResult."""
    dtype = engine.dtype
    T = 1.0 / f0
    K = int(steps_per_period)
    dt = jnp.asarray(T / K, dtype)
    step = transient_step_fn(engine, params, dt)
    ts = jnp.arange(1, K + 1, dtype=dtype) * dt
    dmax = int(engine.tl_ticks(dt).max()) if engine.n_tl else 0

    def propagate(s):
        x, state = _split(engine, s, dmax)
        failed = jnp.zeros(x.shape[:-1], dtype=bool)

        def body(c, t):
            c, _ = step(c, t)
            return c, None

        (x, state, _), _ = lax.scan(body, (x, state, failed), ts)
        return _join(x, state)

    def propagate_save(s):
        x, state = _split(engine, s, dmax)
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

    n_s = s.shape[-1]
    eye = jnp.eye(n_s, dtype=dtype)

    @jax.jit
    def newton_step(s):
        phi0 = propagate(s)
        r = phi0 - s
        # batched finite-difference Jacobian of Phi
        eps = jnp.asarray(fd_eps, dtype)
        pert = s[None, :] + eps * eye
        phis = jax.vmap(propagate)(pert)
        J = (phis - phi0[None, :]).T / eps          # dPhi/ds
        A = J - eye                                  # d(Phi - id)/ds
        ds = lu_solve(A, -r, engine.opts.lu_pivot_floor)
        res = jnp.linalg.norm(r)
        return s + ds, res

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
    x_first, _ = _split(engine, s, dmax)
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
        converged=final_res < tol * 10,
    )


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
