"""Junction diode model (extension: the reference has no diode device;
BASELINE.json's synthetic "RC ladder + diode chain" stress config requires
one).  Shockley equation with a linearized continuation above a critical
voltage to keep Newton iterations finite:

    I(V) = Is * (e(V / (n*Vt)) - 1),   e(u) = exp(u)                u <= U
                                       e(u) = exp(U) * (1 + u - U)  u >  U

which keeps I and dI/dV continuous at u = U (standard SPICE-style
exponential limiting).
"""

from __future__ import annotations

import jax.numpy as jnp

VT_THERMAL = 0.025852  # kT/q at 300 K, volts
EXP_LIMIT = 40.0


def diode_linearize(i_sat, n_ideal, vp, vm, vt=VT_THERMAL, u_max=EXP_LIMIT,
                    bv=None, ibv=None):
    """Per-device linearization I ~= g*(Vp-Vm) + cst.

    Returns (g, cst), each (nD,).

    bv/ibv (extension, reverse breakdown; None = structurally absent):
    standard SPICE form — for V below -BV the reverse current grows as
    I_bd = -IBV * exp(-(BV+V)/Vt) (ideality 1), with the same linearized
    continuation as the forward exponential.  Per-device gated on bv > 0.
    """
    v = vp - vm
    nvt = n_ideal * vt
    u = v / nvt
    exp_u = jnp.where(u <= u_max,
                      jnp.exp(jnp.minimum(u, u_max)),
                      jnp.exp(u_max) * (1.0 + (u - u_max)))
    i = i_sat * (exp_u - 1.0)
    g = jnp.where(u <= u_max,
                  i_sat * jnp.exp(jnp.minimum(u, u_max)) / nvt,
                  i_sat * jnp.exp(u_max) / nvt)
    if bv is not None:
        on = bv > 0.0
        ub = jnp.where(on, -(v + bv) / vt, -jnp.inf)
        exp_b = jnp.where(ub <= u_max,
                          jnp.exp(jnp.minimum(ub, u_max)),
                          jnp.exp(u_max) * (1.0 + (ub - u_max)))
        dexp_b = jnp.where(ub <= u_max,
                           jnp.exp(jnp.minimum(ub, u_max)),
                           jnp.exp(u_max))
        i = i - jnp.where(on, ibv * exp_b, 0.0)
        g = g + jnp.where(on, ibv * dexp_b / vt, 0.0)
    cst = i - g * v
    return g, cst


def diode_stamp_vals(i_sat, n_ideal, vp, vm, vt=VT_THERMAL,
                     bv=None, ibv=None):
    """(G-entry values (4*nD,), RHS values (2*nD,)).

    Entry order per device matches ir/lower.py's pattern:
    rows [P,P,M,M], cols [P,M,P,M] with vals [g,-g,-g,g];
    RHS rows [P,M] with vals [-cst,+cst].
    """
    g, cst = diode_linearize(i_sat, n_ideal, vp, vm, vt, bv=bv, ibv=ibv)
    gvals = jnp.stack([g, -g, -g, g], axis=-1).reshape(*g.shape[:-1], -1)
    rhs = jnp.stack([-cst, cst], axis=-1).reshape(*cst.shape[:-1], -1)
    return gvals, rhs
