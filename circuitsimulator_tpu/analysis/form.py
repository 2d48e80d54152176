"""FORM worst-case analysis: most-probable-failure-point search.

First-Order Reliability Method on top of the reverse-differentiable
transient (analysis/adjoint.diff_transient) — a capability the
reference's one-deck-per-process C++ flow (SURVEY.md §2) cannot
express, enabled here by JAX end-to-end gradients.

The lognormal Monte-Carlo model (parallel/montecarlo.perturb_params)
maps a standard-normal vector z to parameters
``p_j = nominal_j · exp(sigma_j · z_j)``.  Given a limit-state function
``g(times, xs)`` with the convention **g < 0 = failure** (nominal must
pass), the most probable failure point is

    z* = argmin ||z||²  s.t.  g(z) = 0,

found by the Hasofer-Lind / Rackwitz-Fiessler iteration

    z_{k+1} = (∇g·z_k − g(z_k)) ∇g / ||∇g||²,

each step costing ONE differentiable transient (forward + adjoint
backward sweep, parameter-count independent).  The reliability index
β = ||z*|| yields the FORM failure estimate Φ(−β) — exact when the
failure boundary is linear in z, and the returned unit direction
``alpha = z*/β`` is the canonical importance-sampling shift /
design-centering direction for the parameters that matter.
"""

from __future__ import annotations

import math
from typing import Callable, Mapping

import jax
import jax.numpy as jnp

from ..ops.assemble import Engine
from .adjoint import diff_transient


def _phi_tail(beta: float) -> float:
    return 0.5 * math.erfc(beta / math.sqrt(2.0))


def mpp_search(engine: Engine, params, rel_sigma: Mapping[str, float],
               tstep, tstop,
               g_fn: Callable,
               max_iter: int = 25, tol: float = 1e-6,
               damping: float = 1.0,
               design_grads=None,
               analysis: str = "tran", freqs=None,
               sorm: bool = False, sorm_step: float = 1e-3):
    """Most-probable-failure-point search (HL-RF).

    rel_sigma maps param names to relative lognormal sigmas (the same
    contract as perturb_params / yield_analysis); every scalar dimension
    of each named leaf becomes one standard-normal coordinate.  g_fn
    takes the differentiable transient's (times, xs) and returns the
    scalar limit state (g < 0 = failure).

    analysis="ac" evaluates the limit state on the small-signal sweep
    instead: g_fn(freqs, xr, xi) over the differentiable AC solve at
    `freqs` (linearized at the differentiable DC operating point), so
    RF specs — gain, corner, matching — get the same FORM machinery;
    tstep/tstop are then ignored.  analysis="dc": g_fn(x_op) over the
    differentiable (polished) DC operating point — offset/bias specs.

    Returns a dict: beta (reliability index, sigmas-to-failure), p_fail
    (FORM estimate Φ(−β)), z_star, alpha (unit importance direction),
    params_star (the worst-case parameter set ON the failure boundary),
    g_nominal, n_iter, converged.

    design_grads: list of param names (e.g. ["res_r", "cap_c"]) to
    return dβ/d(nominal) for — the DESIGN-CENTERING gradient.  The FORM
    sensitivity identity dβ/dp = (∂g/∂p)/‖∇_z g‖ at the MPP makes this
    one extra VJP: gradient-ascend the returned "dbeta" pytree to
    maximize yield.  Names may overlap rel_sigma (the nominal inside
    the lognormal map) or be any other float parameter.

    sorm=True adds Breitung's second-order correction: the boundary's
    principal curvatures at the MPP (Hessian of g via central
    differences of the adjoint gradient — 2·dims extra solves, since
    custom_vjp rules block forward-over-reverse) refine the estimate to
    p_sorm = Φ(−β)·det(I + β·H_t/‖∇g‖)^(−1/2) over the tangent space —
    removing FORM's curved-boundary bias.
    """
    dtype = engine.dtype
    from ..parallel.montecarlo import _z_layout
    names, sizes, dims = _z_layout(params, rel_sigma)
    if not names:
        raise ValueError("rel_sigma names no perturbable parameter")

    def params_of_z_base(base, z):
        out = dict(base)
        off = 0
        for n, sz in zip(names, sizes):
            col = z[off:off + sz].reshape(base[n].shape)
            out[n] = base[n] * jnp.exp(rel_sigma[n]
                                       * col.astype(base[n].dtype))
            off += sz
        return out

    def params_of_z(z):
        return params_of_z_base(params, z)

    if analysis == "ac":
        if freqs is None:
            raise ValueError("analysis='ac' needs freqs")
        from .ac import ac_system_real, solve_ac_real
        from .adjoint import _make_diff_dc
        dc_solve = _make_diff_dc(engine)
        fr = jnp.asarray(freqs, dtype)

        def g_of(base, z):
            p = params_of_z_base(base, z)
            x_op = dc_solve(p)

            def one(f):
                G, B, br, bi = ac_system_real(engine, p, x_op,
                                              2.0 * jnp.pi * f)
                return solve_ac_real(engine, G, B, br, bi)

            xr, xi = jax.vmap(one)(fr)
            return jnp.asarray(g_fn(fr, xr, xi), dtype)
    elif analysis == "dc":
        from .adjoint import _make_diff_dc
        dc_solve = _make_diff_dc(engine)

        def g_of(base, z):
            x_op = dc_solve(params_of_z_base(base, z))
            return jnp.asarray(g_fn(x_op), dtype)
    else:
        def g_of(base, z):
            times, xs = diff_transient(engine, params_of_z_base(base, z),
                                       tstep, tstop)
            return jnp.asarray(g_fn(times, xs), dtype)

    def g(z):
        return g_of(params, z)

    g_grad = jax.jit(jax.value_and_grad(g))
    z = jnp.zeros((dims,), dtype)
    g0 = None
    converged = False
    it = 0
    for it in range(1, max_iter + 1):
        val, grad = g_grad(z)
        if g0 is None:
            g0 = float(val)
            if g0 < 0:
                raise ValueError(
                    f"nominal design already fails (g(0) = {g0:.3g}); "
                    "FORM needs a passing nominal")
        gg = float(jnp.dot(grad, grad))
        if not math.isfinite(gg) or gg == 0.0:
            break
        z_new = (jnp.dot(grad, z) - val) * grad / gg
        if damping != 1.0:
            z_new = z + damping * (z_new - z)
        step = float(jnp.linalg.norm(z_new - z))
        z = z_new
        if step < tol * max(1.0, float(jnp.linalg.norm(z))):
            converged = True
            break
    beta = float(jnp.linalg.norm(z))
    alpha = z / beta if beta > 0 else z
    extras = {}
    if sorm and beta > 0 and dims >= 1:
        import numpy as np
        _, grad_star = g_grad(z)
        gnorm = float(jnp.linalg.norm(grad_star))
        # Hessian of g at the MPP by central differences of the exact
        # adjoint gradient (2·dims extra solves)
        h = sorm_step * max(beta, 1.0)
        H = np.zeros((dims, dims))
        for i in range(dims):
            e = jnp.zeros((dims,), dtype).at[i].set(h)
            _, gp = g_grad(z + e)
            _, gm = g_grad(z - e)
            H[i] = np.asarray((gp - gm) / (2.0 * h))
        H = 0.5 * (H + H.T)
        if dims > 1:
            # tangent basis orthogonal to alpha (QR of [alpha | I])
            a = np.asarray(alpha).reshape(dims, 1)
            Q, _ = np.linalg.qr(np.concatenate(
                [a, np.eye(dims)], axis=1))
            Tt = Q[:, 1:dims]                    # (dims, dims-1)
            # curvature matrix: for the canonical Breitung form
            # g = β + ½Σκ_i z_i² − z_n (failure g<0), the tangent
            # Hessian IS diag(κ) and p = Φ(−β)·Π(1+βκ_i)^(−1/2), so
            # A = +(Tᵀ H T)/‖∇g‖ — positive κ bends the boundary away
            # from the origin and shrinks the failure probability
            A = (Tt.T @ H @ Tt) / gnorm
            det = float(np.linalg.det(np.eye(dims - 1) + beta * A))
        else:
            det = 1.0
        if det > 0:
            extras["p_fail_sorm"] = _phi_tail(beta) / math.sqrt(det)
        else:                                   # extreme curvature
            extras["p_fail_sorm"] = None
        extras["sorm_det"] = det
    if design_grads:
        # FORM design sensitivity at the MPP: dβ/dp = (∂g/∂p)/‖∇_z g‖
        _, grad_z = g_grad(z)
        gnorm = float(jnp.linalg.norm(grad_z))
        pdes = {k: params[k] for k in design_grads}
        rest = {k: v for k, v in params.items() if k not in design_grads}

        def g_of_design(pd):
            return g_of({**rest, **pd}, z)

        gp = jax.grad(g_of_design)(pdes)
        extras["dbeta"] = {k: v / gnorm for k, v in gp.items()}
        extras["grad_z_norm"] = gnorm
    return {
        **extras,
        "beta": beta,
        "p_fail": _phi_tail(beta),
        "z_star": z,
        "alpha": alpha,
        "params_star": params_of_z(z),
        "dims": dims,
        "names": names,
        "g_nominal": g0,
        "n_iter": it,
        "converged": converged,
    }


def mismatch_budget(engine: Engine, params, rel_sigma: Mapping[str, float],
                    tstep, tstop, m_fn: Callable,
                    analysis: str = "tran", freqs=None):
    """Linearized variance decomposition of a scalar metric over the
    mismatch space: ONE adjoint pass gives dM/dz_j for every dimension
    at the nominal point, so Var[M] ≈ Σ_j (dM/dz_j)² and each
    parameter's share is its squared sigma-weighted gradient — the
    designer's variance budget ("which device eats my margin"), at the
    cost of a single transient instead of a regression over a batch.

    m_fn(times, xs) -> scalar metric.  Returns a dict: sigma_m (the
    linearized metric sigma), m_nominal, and contributions — a list of
    (param_name, index_within_leaf, variance_share) sorted descending.

    analysis="ac": m_fn(freqs, xr, xi) evaluates on the differentiable
    small-signal solve at `freqs` (tstep/tstop ignored)."""
    dtype = engine.dtype
    from ..parallel.montecarlo import _z_layout
    names, sizes, dims = _z_layout(params, rel_sigma)
    if not names:
        raise ValueError("rel_sigma names no perturbable parameter")

    def params_of_z(z):
        out = dict(params)
        off = 0
        for n, sz in zip(names, sizes):
            col = z[off:off + sz].reshape(params[n].shape)
            out[n] = params[n] * jnp.exp(rel_sigma[n]
                                         * col.astype(params[n].dtype))
            off += sz
        return out

    if analysis == "ac":
        if freqs is None:
            raise ValueError("analysis='ac' needs freqs")
        from .ac import ac_system_real, solve_ac_real
        from .adjoint import _make_diff_dc
        dc_solve = _make_diff_dc(engine)
        fr = jnp.asarray(freqs, dtype)

        def m(z):
            p = params_of_z(z)
            x_op = dc_solve(p)

            def one(f):
                G, B, br, bi = ac_system_real(engine, p, x_op,
                                              2.0 * jnp.pi * f)
                return solve_ac_real(engine, G, B, br, bi)

            xr, xi = jax.vmap(one)(fr)
            return jnp.asarray(m_fn(fr, xr, xi), dtype)
    elif analysis == "dc":
        from .adjoint import _make_diff_dc
        dc_solve = _make_diff_dc(engine)

        def m(z):
            return jnp.asarray(m_fn(dc_solve(params_of_z(z))), dtype)
    else:
        def m(z):
            times, xs = diff_transient(engine, params_of_z(z), tstep,
                                       tstop)
            return jnp.asarray(m_fn(times, xs), dtype)

    m0, grad = jax.value_and_grad(m)(jnp.zeros((dims,), dtype))
    g2 = jnp.asarray(grad) ** 2
    var = float(g2.sum())
    shares = (g2 / var) if var > 0 else g2
    contributions = []
    off = 0
    for n, sz in zip(names, sizes):
        for i in range(sz):
            contributions.append((n, i, float(shares[off + i])))
        off += sz
    contributions.sort(key=lambda c: -c[2])
    return {
        "m_nominal": float(m0),
        "sigma_m": math.sqrt(var),
        "grad_z": grad,
        "contributions": contributions,
    }


def limit_state_measure(m, topo, low=None, high=None):
    """Limit state on a deck `.MEASURE TRAN` card via the differentiable
    measure layer (analysis/measure_diff.py): g < 0 when the measured
    value leaves the (low, high) window — FORM on timing/level specs
    exactly as the deck defines them."""
    from .measure_diff import diff_measure
    if low is None and high is None:
        raise ValueError("need at least one bound")
    f = diff_measure(m, topo)

    def g_fn(times, xs):
        v = f(times, xs)
        gs = []
        if low is not None:
            gs.append(v - low)
        if high is not None:
            gs.append(high - v)
        return gs[0] if len(gs) == 1 else jnp.minimum(*gs)

    return g_fn


def limit_state_measure_ac(m, topo, low=None, high=None):
    """Limit state on a deck `.MEASURE AC` card (differentiable measure
    layer): g < 0 when the value leaves the (low, high) window — FORM
    on bandwidth/gain specs exactly as the deck defines them."""
    from .measure_diff import diff_measure_ac
    if low is None and high is None:
        raise ValueError("need at least one bound")
    f = diff_measure_ac(m, topo)

    def g_fn(freqs, xr, xi):
        v = f(freqs, xr, xi)
        gs = []
        if low is not None:
            gs.append(v - low)
        if high is not None:
            gs.append(high - v)
        return gs[0] if len(gs) == 1 else jnp.minimum(*gs)

    return g_fn


def limit_state_dc(eq_index: int, low=None, high=None):
    """Limit state on a DC node voltage x_op[eq_index] against a
    (low, high) window.  g < 0 = out of window."""
    if low is None and high is None:
        raise ValueError("need at least one bound")

    def g_fn(x_op):
        v = x_op[eq_index]
        gs = []
        if low is not None:
            gs.append(v - low)
        if high is not None:
            gs.append(high - v)
        return gs[0] if len(gs) == 1 else jnp.minimum(*gs)

    return g_fn


def limit_state_ac_mag(eq_index: int, low=None, high=None,
                       f_index: int = 0):
    """Limit state on an AC magnitude: |V(node)| at freqs[f_index]
    against a (low, high) window.  g < 0 = out of window."""
    if low is None and high is None:
        raise ValueError("need at least one bound")

    def g_fn(freqs, xr, xi):
        m = jnp.sqrt(xr[f_index, eq_index] ** 2
                     + xi[f_index, eq_index] ** 2)
        gs = []
        if low is not None:
            gs.append(m - low)
        if high is not None:
            gs.append(high - m)
        return gs[0] if len(gs) == 1 else jnp.minimum(*gs)

    return g_fn


def limit_state_find_at(eq_index: int, t_at: float,
                        low=None, high=None):
    """Limit state for a `FIND V(node) AT=t` spec: linear interpolation
    of xs[:, eq_index] at t_at, against a (low, high) acceptance window
    (either bound may be None).  g < 0 = out of window."""
    if low is None and high is None:
        raise ValueError("need at least one bound")

    def g_fn(times, xs):
        v = jnp.interp(jnp.asarray(t_at, times.dtype), times,
                       xs[:, eq_index])
        gs = []
        if low is not None:
            gs.append(v - low)
        if high is not None:
            gs.append(high - v)
        return gs[0] if len(gs) == 1 else jnp.minimum(*gs)

    return g_fn
