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


def diode_linearize(i_sat, n_ideal, vp, vm, vt=VT_THERMAL, u_max=EXP_LIMIT):
    """Per-device linearization I ~= g*(Vp-Vm) + cst.

    Returns (g, cst), each (nD,).
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
    cst = i - g * v
    return g, cst


def diode_stamp_vals(i_sat, n_ideal, vp, vm, vt=VT_THERMAL):
    """(G-entry values (4*nD,), RHS values (2*nD,)).

    Entry order per device matches ir/lower.py's pattern:
    rows [P,P,M,M], cols [P,M,P,M] with vals [g,-g,-g,g];
    RHS rows [P,M] with vals [-cst,+cst].
    """
    g, cst = diode_linearize(i_sat, n_ideal, vp, vm, vt)
    gvals = jnp.stack([g, -g, -g, g], axis=-1).reshape(*g.shape[:-1], -1)
    rhs = jnp.stack([-cst, cst], axis=-1).reshape(*cst.shape[:-1], -1)
    return gvals, rhs
