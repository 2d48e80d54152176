"""Voltage/current-controlled switches (S / W elements — extension; the
reference has no switch devices).

Model card:  .MODEL <id> SW  [RON=] [ROFF=] [VT=] [VH=]
             .MODEL <id> CSW [RON=] [ROFF=] [IT=] [IH=]

Smooth-transition switch (the ngspice recommendation): the conductance
interpolates LOG-linearly (cubic smoothstep) between 1/ROFF and 1/RON over
the control window [VT-VH, VT+VH], so Newton sees a C1-continuous device
instead of a hard step.  VH == 0 degenerates to an ideal step (zero
derivative, still convergent because G is bounded).  No hysteresis state is
kept — VH is the transition half-width, matching ngspice's non-hysteretic
"smooth" interpretation.

The W element is the same device with the controlling quantity being a V
source's branch current: the lowering maps its control pair to
(branch_eq, dump), so one stamp routine serves both.

Stamp (per device, control voltage vc = V(cp) - V(cm), vd = V(p) - V(m)):
    i(vd, vc)    = G(vc) * vd
    d i / d vd   = G(vc)           =: gd
    d i / d vc   = G'(vc) * vd     =: gc
    Newton RHS constant: cst = i0 - gd*vd0 - gc*vc0,  I(p) -= cst, I(m) += cst
    G-matrix block: rows [p,p,m,m,p,p,m,m] x cols [p,m,p,m,cp,cm,cp,cm]
                    vals [gd,-gd,-gd,gd, gc,-gc,-gc,gc]
"""

from __future__ import annotations

import jax.numpy as jnp


def switch_conductance(ron, roff, vt, vh, vc):
    """G(vc) and dG/dvc (log-smoothstep between 1/roff and 1/ron)."""
    g_on = 1.0 / ron
    g_off = 1.0 / roff
    l_on = jnp.log(g_on)
    l_off = jnp.log(g_off)
    has_win = vh > 0.0
    width = jnp.where(has_win, 2.0 * vh, 1.0)
    u = jnp.clip((vc - (vt - vh)) / width, 0.0, 1.0)
    u = jnp.where(has_win, u, (vc > vt).astype(vc.dtype))
    s = u * u * (3.0 - 2.0 * u)
    G = jnp.exp(l_off + (l_on - l_off) * s)
    dsdu = 6.0 * u * (1.0 - u)
    dG = jnp.where(has_win, G * (l_on - l_off) * dsdu / width, 0.0)
    return G, dG


def switch_stamp_vals(ron, roff, vt, vh, vp, vm, vcp, vcm):
    """Vectorized Newton linearization of all switches.

    Returns (gvals, rhs): gvals (..., nS*8) in the pattern order
    [p,p,m,m,p,p,m,m] x [p,m,p,m,cp,cm,cp,cm]; rhs (..., nS*2) for rows
    [p, m] (the -cst / +cst pair)."""
    vd = vp - vm
    vc = vcp - vcm
    G, dG = switch_conductance(ron, roff, vt, vh, vc)
    gd = G
    gc = dG * vd
    i0 = G * vd
    cst = i0 - gd * vd - gc * vc      # == -gc*vc when i is exactly G*vd
    gvals = jnp.stack([gd, -gd, -gd, gd, gc, -gc, -gc, gc], axis=-1)
    gvals = gvals.reshape(*gd.shape[:-1], -1)
    rhs = jnp.stack([-cst, cst], axis=-1).reshape(*cst.shape[:-1], -1)
    return gvals, rhs
