"""Reverse-mode transient adjoint: d loss(waveform) / d ALL parameters in
one backward pass (extension, JAX-native).

Forward-mode JVP (analysis/sensitivity.transient_sensitivity) costs one
pass per parameter direction; this module provides the reverse: the BE/trap
timestep is wrapped in `jax.custom_vjp` whose backward rule uses the
implicit function theorem at the converged per-step solution

    r(x_k; p, state_{k-1}, t_k) = 0,     dr/dx = A(x_k)  (Newton identity)
    xbar -> lambda = A^T \\ xbar,  (pbar, sbar, tbar) = -lambda^T dr/d(...)

so reverse AD never differentiates through the Newton `lax.while_loop`
(which JAX cannot transpose).  The surrounding `lax.scan` then runs the
classic adjoint-in-time backward sweep automatically, and the DC operating
point gets the same treatment.  Memory is the stored trajectory
O(n_steps * (N + state)) — `jax.checkpoint` territory for very long runs.

Cost: forward transient + one backward sweep of (transposed solve + one
assembly VJP) per step — independent of the number of parameters.  This is
the optimization/fitting entry point: circuit calibration, corner tuning,
matching measured waveforms.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.assemble import Engine
from ..ops.lu import lu_solve
from .sensitivity import dc_residual, _polish
from .transient import n_steps_for


def _make_diff_dc(engine: Engine):
    """Differentiable DC solve: forward = ramped solver + polish; backward
    = implicit differentiation (same math as analysis/sensitivity.py)."""
    from .dc import dc_operating_point
    N = engine.N

    def _primal(params):
        return _polish(engine, params, dc_operating_point(engine, params))

    @jax.custom_vjp
    def dc_solve(params):
        return _primal(params)

    def fwd(params):
        x = _primal(params)
        return x, (params, x)

    def bwd(res, xbar):
        params, x = res
        G_s, I_s = engine.dc_static(params, jnp.ones((), engine.dtype))
        G, _ = engine.assemble_dc_iter(G_s, I_s, params, x, 0.0)
        lam = lu_solve(jnp.swapaxes(G[..., :N, :N], -1, -2), xbar,
                       engine.opts.lu_pivot_floor)
        _, vjp = jax.vjp(lambda p: dc_residual(engine, p, x), params)
        (pbar,) = vjp(-lam)
        return (pbar,)

    dc_solve.defvjp(fwd, bwd)
    return dc_solve


def _make_diff_step(engine: Engine, dt, method: str):
    """Differentiable converged BE/trap step x_new(params, state, t)."""
    opts = engine.opts
    N = engine.N
    gmin = opts.tran_gmin
    static_I_of = engine.make_tran_static_I(dt, method)

    def r_tran(x, params, state, t):
        """Exact per-step KCL residual at fixed dt (pure assembly).  `t`
        threads into the nonlinear tier so time-dependent behavioral
        expressions linearize (and differentiate) at the right time."""
        G_s = engine.tran_static_G(params, dt, gmin, method)
        I_s = static_I_of(params, state, t)
        G, I = engine.assemble_tran_iter(G_s, I_s, params, x, t)
        return (jnp.einsum("...ij,...j->...i", G[..., :N, :N], x)
                - I[..., :N])

    def newton(params, state, t, x_init):
        G_s = engine.tran_static_G(params, dt, gmin, method)
        I_s = static_I_of(params, state, t)

        def cond(c):
            return (~c["done"]) & (c["iter"] < opts.tran_max_newton_iters)

        def body(c):
            G, I = engine.assemble_tran_iter(G_s, I_s, params, c["x"], t)
            x_raw = lu_solve(G[..., :N, :N], I[..., :N],
                             opts.lu_pivot_floor)
            finite = jnp.all(jnp.isfinite(x_raw), axis=-1)
            err = jnp.linalg.norm(x_raw - c["x"], axis=-1)
            out = dict(c)
            out["x"] = jnp.where(finite, x_raw, c["x"])
            out["done"] = c["done"] | (finite & (err < opts.tran_tol)) \
                | ~finite
            out["iter"] = c["iter"] + 1
            return out

        init = dict(x=x_init, done=jnp.asarray(False),
                    iter=jnp.asarray(0, jnp.int32))
        return lax.while_loop(cond, body, init)["x"]

    @jax.custom_vjp
    def solve_step(params, state, t, x_init):
        return newton(params, state, t, x_init)

    def fwd(params, state, t, x_init):
        x = newton(params, state, t, x_init)
        return x, (params, state, t, x)

    def bwd(res, xbar):
        params, state, t, x = res
        G_s = engine.tran_static_G(params, dt, gmin, method)
        I_s = static_I_of(params, state, t)
        G, _ = engine.assemble_tran_iter(G_s, I_s, params, x, t)
        lam = lu_solve(jnp.swapaxes(G[..., :N, :N], -1, -2), xbar,
                       engine.opts.lu_pivot_floor)
        _, vjp = jax.vjp(
            lambda p, s, tt: r_tran(x, p, s, tt), params, state, t)
        pbar, sbar, tbar = vjp(-lam)
        return (pbar, sbar, tbar, jnp.zeros_like(x))

    solve_step.defvjp(fwd, bwd)
    return solve_step


# custom_vjp function objects must be created OUTSIDE any trace: a fresh
# custom_vjp identity per jit trace leaks tracers into while_loop constants
# ("No constant handler for DynamicJaxprTracer" at lowering).  Cache per
# (engine, dt, method); bounded like the Simulator's executable caches.
_DIFF_FNS_CACHE = {}


def _diff_fns(engine: Engine, tstep_f: float, method: str):
    key = (id(engine), float(tstep_f), method)
    if key not in _DIFF_FNS_CACHE:
        if len(_DIFF_FNS_CACHE) >= 16:
            _DIFF_FNS_CACHE.pop(next(iter(_DIFF_FNS_CACHE)))
        # the factory closures outlive any active trace: dt must be a real
        # constant, never a trace-lifted value, or later jit lowerings see
        # a foreign tracer ("No constant handler for DynamicJaxprTracer")
        with jax.ensure_compile_time_eval():
            dt = jnp.asarray(tstep_f, engine.dtype)
        _DIFF_FNS_CACHE[key] = (_make_diff_dc(engine),
                                _make_diff_step(engine, dt, method))
    return _DIFF_FNS_CACHE[key]


def diff_transient(engine: Engine, params, tstep, tstop):
    """Fully reverse-differentiable transient: returns (times, xs) with xs
    (n_steps+1, N); jax.grad of any function of xs flows back to params
    through the adjoint rules above."""
    opts = engine.opts
    dtype = engine.dtype
    method = opts.tran_method
    n_steps = n_steps_for(float(tstep), float(tstop))
    dc_solve, solve_step = _diff_fns(engine, float(tstep), method)
    with jax.ensure_compile_time_eval():
        dt = jnp.asarray(tstep, dtype)
        ts = jnp.arange(1, n_steps + 1, dtype=dtype) * dt
    update_state = engine.make_update_state(dt, method)

    x0 = dc_solve(params)
    # T-line decks carry the Branin delay ring in the state pytree; the
    # scan's reverse sweep differentiates the ring push (a concatenate)
    # and the custom_vjp step pulls cotangents through the delayed-wave
    # reads in make_tran_static_I automatically.
    state0 = (engine.init_state(x0, params=params, dt=float(tstep))
              if engine.n_tl else engine.init_state(x0))

    def step(carry, t):
        x, state = carry
        x_new = solve_step(params, state, t, x)
        state = update_state(params, x_new, state)
        return (x_new, state), x_new

    _, xs = lax.scan(step, (x0, state0), ts)
    times = jnp.concatenate([jnp.zeros((1,), dtype), ts])
    return times, jnp.concatenate([x0[None], xs], axis=0)


def transient_adjoint_gradient(engine: Engine, params, tstep, tstop,
                               loss_fn: Callable[[Any, Any], Any]):
    """(loss value, d loss / d params) for loss_fn(times, xs) -> scalar.
    Integer params leaves (waveform kinds, PWL counts) are structural —
    they pass through unchanged and get zero-gradient placeholders."""
    params = dict(params)
    fkeys = [k for k, v in params.items()
             if jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating)]
    rest = {k: v for k, v in params.items() if k not in fkeys}

    def objective(pf):
        times, xs = diff_transient(engine, {**pf, **rest}, tstep, tstop)
        return loss_fn(times, xs)

    val, g = jax.value_and_grad(objective)({k: params[k] for k in fkeys})
    grads = dict(g)
    for k, v in rest.items():
        grads[k] = jnp.zeros_like(jnp.asarray(v), dtype=engine.dtype) * 0
    return val, grads
