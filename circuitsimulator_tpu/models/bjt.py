"""Ebers-Moll BJT model (extension; the reference has no BJT — BASELINE.json
names the diode/BJT/MOSFET exponential class).

Standard injection form, NPN (PNP via polarity p = -1 applied to all
terminal voltages and currents):

    If  = Is (e(Vbe/Vt) - 1)        Ir = Is (e(Vbc/Vt) - 1)
    Ic  = If - Ir - Ir/br           Ib = If/bf + Ir/br
    Ie  = -(Ic + Ib)

with the same linearized-exponential limiting as the diode model.  Each
device contributes two independent KCL row patterns:

    (e_C - e_E) Ic + (e_B - e_E) Ib

i.e. a RANK-2 update of the MNA matrix — handled by the same Woodbury
machinery as MOSFETs (rank-1) with two U columns per device.
"""

from __future__ import annotations

import jax.numpy as jnp

from .diode import VT_THERMAL, EXP_LIMIT


def _exp_lim(u, u_max=EXP_LIMIT):
    e = jnp.exp(jnp.minimum(u, u_max))
    return jnp.where(u <= u_max, e, jnp.exp(u_max) * (1.0 + (u - u_max))), \
        jnp.where(u <= u_max, e, jnp.exp(u_max))


def bjt_linearize(i_sat, bf, br, p, vc, vb, ve, vt=VT_THERMAL, vaf=None):
    """Linearize (Ic, Ib) around the physical terminal voltages.

    p = +1 NPN, -1 PNP.  Returns per-current gradients wrt (Vc, Vb, Ve) and
    constants:  I ~= g_c*Vc + g_b*Vb + g_e*Ve + cst  for I in {Ic, Ib}.

    vaf (extension, Gummel-Poon-style Early voltage; None/0 = off): the
    TRANSPORT current If - Ir is scaled by kq = 1 - Vbc_eff/VAF (the
    Gummel-Poon 1/qb with VAR = inf, clamped away from zero for large
    forward Vbc), giving the finite output conductance
    gce ~ Ic/(VAF - Vbc) ~ Ic/(VAF + Vce) real BJTs show; base currents
    are unscaled.
    """
    vbe = p * (vb - ve)
    vbc = p * (vb - vc)
    ef, def_ = _exp_lim(vbe / vt)
    er, der_ = _exp_lim(vbc / vt)
    i_f = i_sat * (ef - 1.0)
    i_r = i_sat * (er - 1.0)
    gf = i_sat * def_ / vt          # dIf/dVbe
    gr = i_sat * der_ / vt          # dIr/dVbc

    if vaf is not None:
        on = vaf > 0.0
        raw = 1.0 - vbc / jnp.where(on, vaf, 1.0)
        kq = jnp.where(on, jnp.maximum(raw, 0.05), 1.0)
        # d kq / d vbc = -1/vaf inside the unclamped region
        dkq = jnp.where(on & (raw > 0.05),
                        -1.0 / jnp.where(on, vaf, 1.0), 0.0)
    else:
        kq = 1.0
        dkq = 0.0

    ict = (i_f - i_r) * kq
    ic_eff = ict - i_r / br
    ib_eff = i_f / bf + i_r / br

    # effective-voltage gradients
    dic_dvbe = gf * kq
    dic_dvbc = -gr * kq + (i_f - i_r) * dkq - gr / br
    dib_dvbe = gf / bf
    dib_dvbc = gr / br

    # chain rule to physical nodes; p^2 == 1 cancels as with the MOSFET
    def phys(di_dvbe, di_dvbc):
        g_b = di_dvbe + di_dvbc
        g_e = -di_dvbe
        g_c = -di_dvbc
        return g_c, g_b, g_e

    ic = p * ic_eff
    ib = p * ib_eff
    gc_c, gc_b, gc_e = phys(dic_dvbe, dic_dvbc)
    gb_c, gb_b, gb_e = phys(dib_dvbe, dib_dvbc)
    cst_c = ic - gc_c * vc - gc_b * vb - gc_e * ve
    cst_b = ib - gb_c * vc - gb_b * vb - gb_e * ve
    return (gc_c, gc_b, gc_e, cst_c), (gb_c, gb_b, gb_e, cst_b)


def bjt_stamp_vals(i_sat, bf, br, p, vc, vb, ve, vt=VT_THERMAL, vaf=None):
    """COO values for the Newton stamp.

    G entry order per device (18 entries) matches ir/lower.py's pattern:
      rows [C,C,C, B,B,B, E,E,E,E,E,E] x cols [C,B,E, C,B,E, C,B,E,C,B,E]
    where the E row carries -(Ic+Ib) gradients; RHS rows [C, B, E] get
    [-cst_c, -cst_b, +cst_c+cst_b].
    """
    (gcc, gcb, gce, cc), (gbc, gbb, gbe, cb) = bjt_linearize(
        i_sat, bf, br, p, vc, vb, ve, vt, vaf=vaf)
    ge_c, ge_b, ge_e = -(gcc + gbc), -(gcb + gbb), -(gce + gbe)
    gvals = jnp.stack([gcc, gcb, gce,
                       gbc, gbb, gbe,
                       ge_c, ge_b, ge_e], axis=-1).reshape(*gcc.shape[:-1], -1)
    rhs = jnp.stack([-cc, -cb, cc + cb],
                    axis=-1).reshape(*cc.shape[:-1], -1)
    return gvals, rhs
