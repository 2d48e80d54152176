"""Harmonic-balance sensitivities by implicit differentiation.

Gradient RF design: the converged HB system F(X*; p) = 0 (analysis/
hb.py) defines X*(p) implicitly, so for any scalar metric m(X, p)

    dm/dp = ∂m/∂p − λᵀ ∂F/∂p,      Jᵀ λ = (∂m/∂X)ᵀ,

one transposed HB-Jacobian solve + one VJP of the residual — the cost
is independent of the parameter count, exactly like the transient
adjoint (analysis/adjoint.py).  This makes large-signal RF metrics
(compression, harmonic levels, conversion gain) differentiable design
objectives.

The residual here mirrors analysis/hb.py's `residual`/`jacobian`
formula-for-formula but takes `params` as an argument (the solver
closes over it); both build
    F(X) = A(x_t)·x_t − b_nl − b_src + C·(D X)ᵀ-rows
on the K = 2H+1 collocation grid with the exact spectral
differentiation matrix.
"""

from __future__ import annotations

from typing import Callable, Mapping

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.assemble import Engine
from ..models import sources as srcmod
from .hb import spectral_diff_matrix, _reactive_structure


def make_hb_residual(engine: Engine, f0: float, n_harm: int,
                     gmin: float = 0.0):
    """Returns (ts, residual_fn) with residual_fn(X, params) -> (K, N)
    and the same fixpoint as analysis/hb.py's solver."""
    dtype = engine.dtype
    N = engine.N
    T = 1.0 / f0
    K = 2 * int(n_harm) + 1
    D = jnp.asarray(spectral_diff_matrix(K, T), dtype)
    ts = jnp.arange(K, dtype=dtype) * (T / K)

    def residual(X, params):
        C_struct = _reactive_structure(engine, params)

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
            terms = jnp.concatenate([vval, ival, zeros_l, zeros_c],
                                    axis=-1)
            return jnp.einsum("...j,jn->...n", terms, engine.rhs_mat)

        b_src = jax.vmap(sources_rhs)(ts)
        rows, cols, svals = engine.dc_static_entries(params)
        A_res = jnp.zeros((N + 1, N + 1), dtype).at[rows, cols].add(svals)
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
        dxdt = D @ X
        res_reac = jnp.einsum("ij,tj->ti", C_struct, dxdt)
        return res_cond + res_reac

    return ts, residual


def hb_gradient(engine: Engine, params, f0: float, n_harm: int,
                m_fn: Callable, x_star=None, gmin: float = 0.0,
                **hb_kw):
    """(value, grads) of m_fn(X, ts) over the converged HB solution.

    m_fn takes the (K, N) collocation-grid samples and the (K,) sample
    times (build spectral quantities with explicit cos/sin projections —
    everything stays complex-free and traceable).  Float parameter
    leaves get gradients; integer/structural leaves get zeros.  x_star
    may pass a pre-solved HBResult.xs to skip the forward solve."""
    from .hb import harmonic_balance
    if x_star is None:
        res = harmonic_balance(engine, params, f0, n_harm=n_harm, **hb_kw)
        x_star = res.xs
    X = jnp.asarray(x_star)
    K, N = X.shape
    ts, residual = make_hb_residual(engine, f0, n_harm, gmin=gmin)

    fkeys = [k for k, v in params.items()
             if jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating)]
    pf = {k: params[k] for k in fkeys}
    rest = {k: v for k, v in params.items() if k not in fkeys}

    def m_of(Xv, pv):
        return jnp.asarray(m_fn(Xv, ts), engine.dtype)

    val, (mX, mp) = jax.value_and_grad(m_of, argnums=(0, 1))(X, pf)

    # J = dF/dX at (X*, p): build via jacfwd over the flattened grid
    def F_flat(Xf):
        return residual(Xf.reshape(K, N), {**pf, **rest}).reshape(-1)

    J = jax.jacfwd(F_flat)(X.reshape(-1))          # (KN, KN)
    lam = jnp.linalg.solve(J.T, mX.reshape(-1))

    _, vjp_p = jax.vjp(lambda pv: residual(X, {**pv, **rest}), pf)
    (pbar,) = vjp_p(-lam.reshape(K, N))
    grads = {k: mp[k] + pbar[k] for k in fkeys}
    for k, v in rest.items():
        grads[k] = jnp.zeros_like(jnp.asarray(v), dtype=engine.dtype)
    return float(val), grads


def make_hbmulti_residual(engine: Engine, tones, nominal_params):
    """params-parametric residual of the multi-tone MPDE system
    (mirrors analysis/hbmulti.py formula-for-formula; tone assignment
    is STATIC, taken from the nominal SIN frequencies).  Returns
    (Ks, residual_fn) with residual_fn(X (Kt,N), params) -> (Kt, N)."""
    from .hbmulti import assign_tones, _mute
    dtype = engine.dtype
    N = engine.N
    freqs = [float(f) for f, _ in tones]
    Hs = [int(h) for _, h in tones]
    Ks = [2 * h + 1 for h in Hs]
    Kt = int(np.prod(Ks))
    D_axes = len(tones)
    Ds = [np.asarray(spectral_diff_matrix(K, 1.0 / f))
          for K, f in zip(Ks, freqs)]
    ts = [jnp.arange(K, dtype=dtype) * (1.0 / f / K)
          for K, f in zip(Ks, freqs)]
    T = np.zeros((Kt, Kt))
    for d in range(D_axes):
        M = np.ones((1, 1))
        for e in range(D_axes):
            M = np.kron(M, Ds[e] if e == d else np.eye(Ks[e]))
        T += M
    T = jnp.asarray(T, dtype)
    assign_v = assign_tones(np.asarray(engine.vs_kinds),
                            np.asarray(nominal_params["vs_sin"]), freqs)
    assign_i = assign_tones(np.asarray(engine.is_kinds),
                            np.asarray(nominal_params["is_sin"]), freqs)

    def residual(X, params):
        from .hbmulti import harmonic_balance_multi  # noqa: F401 (doc)
        C_struct = _reactive_structure(engine, params)

        def sources_rhs(p, t):
            vval = srcmod.eval_tran_static_kinds(
                engine.vs_kinds, p["vs_dc"], p["vs_pulse"], p["vs_sin"],
                p["vs_pwl_t"], p["vs_pwl_v"], p["vs_pwl_n"], t)
            ival = srcmod.eval_tran_static_kinds(
                engine.is_kinds, p["is_dc"], p["is_pulse"], p["is_sin"],
                p["is_pwl_t"], p["is_pwl_v"], p["is_pwl_n"], t)
            zeros_l = jnp.zeros(p["ind_l"].shape, dtype)
            zeros_c = jnp.zeros(engine._caplike_C(p).shape, dtype)
            terms = jnp.concatenate([vval, ival, zeros_l, zeros_c],
                                    axis=-1)
            return jnp.einsum("...j,jn->...n", terms, engine.rhs_mat)

        def tone_params(keep):
            p = dict(params)
            p["vs_sin"] = _mute(params, "vs_sin", assign_v, keep)
            p["is_sin"] = _mute(params, "is_sin", assign_i, keep)
            return p

        b_dc = sources_rhs(tone_params(None), jnp.zeros((), dtype))
        b_hat = jnp.broadcast_to(b_dc, tuple(Ks) + (N,))
        for d in range(D_axes):
            p_d = tone_params(d)
            bd = jax.vmap(lambda t: sources_rhs(p_d, t))(ts[d]) - b_dc
            shape = [1] * D_axes + [N]
            shape[d] = Ks[d]
            b_hat = b_hat + bd.reshape(shape)
        b_src = b_hat.reshape(Kt, N)

        rows, cols, svals = engine.dc_static_entries(params)
        A_res = jnp.zeros((N + 1, N + 1), dtype).at[rows, cols].add(svals)
        A_res = A_res[:N, :N]

        def assemble_t(x_t):
            gvals, rvals = engine._nl_vals(params, x_t)
            A = jnp.zeros((N + 1, N + 1), dtype)
            A = A.at[engine.nl_rows, engine.nl_cols].add(gvals)
            b = jnp.zeros((N + 1,), dtype).at[engine.nl_rhs_rows].add(
                rvals)
            return A_res + A[:N, :N], b[:N]

        A_t, b_nl = jax.vmap(assemble_t)(X)
        res_cond = jnp.einsum("tij,tj->ti", A_t, X) - b_nl - b_src
        res_reac = jnp.einsum("ij,tj->ti", C_struct, T @ X)
        return res_cond + res_reac

    return Ks, residual


def hbmulti_gradient(engine: Engine, params, tones, m_fn: Callable,
                     x_star=None, **hb_kw):
    """(value, grads) of m_fn(X, Ks) over the converged multi-tone HB
    solution — the quasi-periodic twin of hb_gradient (same implicit
    differentiation; tone assignment stays pinned to the nominal SIN
    frequencies)."""
    from .hbmulti import harmonic_balance_multi
    if x_star is None:
        res = harmonic_balance_multi(engine, params, tones, **hb_kw)
        x_star = res.xs
    Ks, residual = make_hbmulti_residual(engine, tones, params)
    Kt = int(np.prod(Ks))
    N = engine.N
    X = jnp.asarray(x_star).reshape(Kt, N)

    fkeys = [k for k, v in params.items()
             if jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating)]
    pf = {k: params[k] for k in fkeys}
    rest = {k: v for k, v in params.items() if k not in fkeys}

    val, (mX, mp) = jax.value_and_grad(
        lambda Xv, pv: jnp.asarray(m_fn(Xv, Ks), engine.dtype),
        argnums=(0, 1))(X, pf)

    def F_flat(Xf):
        return residual(Xf.reshape(Kt, N), {**pf, **rest}).reshape(-1)

    J = jax.jacfwd(F_flat)(X.reshape(-1))
    lam = jnp.linalg.solve(J.T, mX.reshape(-1))
    _, vjp_p = jax.vjp(lambda pv: residual(X, {**pv, **rest}), pf)
    (pbar,) = vjp_p(-lam.reshape(Kt, N))
    grads = {k: mp[k] + pbar[k] for k in fkeys}
    for k, v in rest.items():
        grads[k] = jnp.zeros_like(jnp.asarray(v), dtype=engine.dtype)
    return float(val), grads


def mixed_harmonic_metric(eq_index: int, harmonics):
    """m_fn measuring the one-sided amplitude of the mixed harmonic
    (k_1, ..., k_D) of x[eq_index] on the multi-tone grid (two-sided
    grid coefficients: amplitude = 2·|c|), via cos/sin projections."""

    def m_fn(X, Ks):
        Xg = X.reshape(tuple(Ks) + (X.shape[-1],))
        y = Xg[..., eq_index]
        ph = 0.0
        for d, (K, k) in enumerate(zip(Ks, harmonics)):
            idx = jnp.arange(K, dtype=X.dtype)
            shape = [1] * len(Ks)
            shape[d] = K
            ph = ph + (2.0 * jnp.pi * k * idx / K).reshape(shape)
        Kt = 1
        for K in Ks:
            Kt *= K
        re = (y * jnp.cos(ph)).sum() / Kt
        im = -(y * jnp.sin(ph)).sum() / Kt
        return 2.0 * jnp.sqrt(re * re + im * im)

    return m_fn


def fundamental_metric(eq_index: int, harmonic: int = 1):
    """m_fn measuring the one-sided amplitude of the given harmonic of
    x[eq_index] via explicit cos/sin projections of the grid samples
    (matches hb.py's host-side rfft convention)."""

    def m_fn(X, ts):
        K = X.shape[0]
        k = jnp.arange(K, dtype=X.dtype)
        c = jnp.cos(2.0 * jnp.pi * harmonic * k / K)
        s = jnp.sin(2.0 * jnp.pi * harmonic * k / K)
        y = X[:, eq_index]
        re = (y * c).sum() * (2.0 / K)
        im = (y * s).sum() * (2.0 / K)
        return jnp.sqrt(re * re + im * im)

    return m_fn
