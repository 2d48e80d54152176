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
