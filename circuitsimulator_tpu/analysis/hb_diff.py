"""Harmonic-balance sensitivities by implicit differentiation.

Gradient RF design: the converged HB system F(X*; p) = 0 defines X*(p)
implicitly, so for any scalar metric m(X, p)

    dm/dp = ∂m/∂p − λᵀ ∂F/∂p,      Jᵀ λ = (∂m/∂X)ᵀ,

one transposed HB-Jacobian solve (the analytic blockdiag(A_t) +
kron(D, C) form, not a jacfwd sweep) plus one VJP of the residual —
the cost is independent of the parameter count, exactly like the
transient adjoint (analysis/adjoint.py).  This makes large-signal RF
metrics (compression, harmonic levels, conversion gain)
differentiable design objectives.

The residual/jacobian are the SAME objects the Newton solvers iterate
on: `hb.make_hb_system` / `hbmulti.make_hbmulti_system` build them
params-parametric, the solvers close them over one params, and this
module differentiates through params.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.assemble import Engine
from .hb import make_hb_system


def _implicit_grads(engine: Engine, params, X, m_of, residual, jacobian):
    """Shared adjoint core: value + dm/d(float leaves) of m_of(X, pf)
    at the converged X with residual(X, params, with_At) = 0."""
    fkeys = [k for k, v in params.items()
             if jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating)]
    pf = {k: params[k] for k in fkeys}
    rest = {k: v for k, v in params.items() if k not in fkeys}
    full = lambda pv: {**pv, **rest}

    val, (mX, mp) = jax.value_and_grad(m_of, argnums=(0, 1))(X, pf)
    _, A_t = residual(X, full(pf), with_At=True)
    J = jacobian(A_t, full(pf))
    lam = jnp.linalg.solve(J.T, mX.reshape(-1))
    _, vjp_p = jax.vjp(lambda pv: residual(X, full(pv)), pf)
    (pbar,) = vjp_p(-lam.reshape(X.shape))
    grads = {k: mp[k] + pbar[k] for k in fkeys}
    for k, v in rest.items():
        grads[k] = jnp.zeros_like(jnp.asarray(v), dtype=engine.dtype)
    return float(val), grads


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
        x_star = harmonic_balance(engine, params, f0, n_harm=n_harm,
                                  **hb_kw).xs
    X = jnp.asarray(x_star)
    ts, residual, jacobian = make_hb_system(engine, f0, n_harm, gmin=gmin)
    m_of = lambda Xv, pv: jnp.asarray(m_fn(Xv, ts), engine.dtype)
    return _implicit_grads(engine, params, X, m_of, residual, jacobian)


def hbmulti_gradient(engine: Engine, params, tones, m_fn: Callable,
                     x_star=None, **hb_kw):
    """(value, grads) of m_fn(X, Ks) over the converged multi-tone HB
    solution — the quasi-periodic twin of hb_gradient (same implicit
    differentiation; tone assignment stays pinned to the nominal SIN
    frequencies)."""
    from .hbmulti import harmonic_balance_multi, make_hbmulti_system
    if x_star is None:
        x_star = harmonic_balance_multi(engine, params, tones,
                                        **hb_kw).xs
    Ks, _, residual, jacobian = make_hbmulti_system(engine, tones, params)
    X = jnp.asarray(x_star).reshape(int(np.prod(Ks)), engine.N)
    m_of = lambda Xv, pv: jnp.asarray(m_fn(Xv, Ks), engine.dtype)
    return _implicit_grads(engine, params, X, m_of, residual, jacobian)


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
        re = (y * jnp.cos(ph)).sum() / y.size
        im = -(y * jnp.sin(ph)).sum() / y.size
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
