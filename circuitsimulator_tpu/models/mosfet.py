"""Level-1 (square-law) MOSFET Newton-Raphson linearization, vectorized.

jnp re-expression of the reference's per-device stamp (src/element.cpp:181-307),
evaluating ALL MOSFETs of a circuit in one shot.  The reference's exact
semantics are kept (SURVEY.md §2 "key device-physics semantics"):

- PMOS is mapped to an effective NMOS with p = -1: Vgs_eff = p(Vg-Vs),
  Vds_eff = p(Vd-Vs)  (element.cpp:207-211).
- The device is "on" iff Vgs_eff > Vth AND Vds_eff >= 0; there is NO
  reverse-region (drain/source swap) handling (element.cpp:223).
- Triode: Ids0 = K(Vov*Vds - Vds^2/2); saturation: Ids0 = K*Vov^2/2
  (element.cpp:232-242).
- Off state leaks with gds = 1e-12 (element.cpp:245-252).
- Channel-length modulation multiplies by factor = max(1 + lambda*Vds_eff, 0)
  (element.cpp:254-257); dIds/dVgs deliberately omits the lambda term
  (gm0*factor only, element.cpp:263) — replicated bug-for-bug.
- Bulk is ignored for conduction (element.cpp:204).

Returns the 6 conductance entries (rows D,D,D,S,S,S x cols D,G,S) and the 2
RHS entries (-cst at D, +cst at S) per device, flattened in device order.
"""

from __future__ import annotations

import jax.numpy as jnp


def mos_linearize(vth, k, lam, p, vd, vg, vs, off_gds=1e-12,
                  reverse_region=False, gamma=None, phi=None):
    """Linearize Ids(Vd,Vg,Vs) around the given voltages.

    All args are (nM,) arrays (p is +1 for NMOS, -1 for PMOS).
    Returns (gd, gg, gs, cst) with Ids ~= gd*Vd + gg*Vg + gs*Vs + cst.

    reverse_region=True (SolverOptions.mos_reverse_region, extension) makes
    the device symmetric: when Vds_eff < 0 the physical drain/source roles
    swap (standard MOS physics).  The reference deliberately has no such
    handling (element.cpp:223) and treats reverse bias as "off", so this is
    opt-in and off in reference-parity mode.

    gamma/phi (extension, default off): body effect with the bulk at its
    reference-forced ground (circuit.cpp:142), so Vsb_eff = p*Vs and
        Vth_eff = VT + GAMMA*(sqrt(PHI + max(Vsb_eff, 0)) - sqrt(PHI)).
    The derivative d Ids/d Vs gains the -gm0*dVth/dVsb term (standard
    physics — this is a fidelity extension, not a reference quirk).
    """
    if reverse_region:
        swap = p * (vd - vs) < 0.0
        vd2 = jnp.where(swap, vs, vd)
        vs2 = jnp.where(swap, vd, vs)
        gd2, gg2, gs2, cst2 = mos_linearize(vth, k, lam, p, vd2, vg, vs2,
                                            off_gds, gamma=gamma, phi=phi)
        # current into the physical drain is -Ids' of the swapped device;
        # re-express the linearization in the physical terminal voltages
        gd = jnp.where(swap, -gs2, gd2)
        gg = jnp.where(swap, -gg2, gg2)
        gs = jnp.where(swap, -gd2, gs2)
        cst = jnp.where(swap, -cst2, cst2)
        return gd, gg, gs, cst
    vgs_eff = p * (vg - vs)
    vds_eff = p * (vd - vs)

    if gamma is not None:
        vsb_eff = jnp.maximum(p * vs, 0.0)
        phi_s = jnp.maximum(phi, 1e-12)
        root = jnp.sqrt(phi_s + vsb_eff)
        vth_eff = vth + gamma * (root - jnp.sqrt(phi_s))
        dvth_dvsb = jnp.where((gamma != 0.0) & (p * vs > 0.0),
                              gamma / (2.0 * root), 0.0)
    else:
        vth_eff = vth
        dvth_dvsb = 0.0

    on = (vgs_eff > vth_eff) & (vds_eff >= 0.0)
    vov = vgs_eff - vth_eff
    triode = vds_eff < vov

    ids0 = jnp.where(
        on,
        jnp.where(triode,
                  k * (vov * vds_eff - 0.5 * vds_eff * vds_eff),
                  0.5 * k * vov * vov),
        0.0)
    gds0 = jnp.where(on, jnp.where(triode, k * (vov - vds_eff), 0.0), off_gds)
    gm0 = jnp.where(on, jnp.where(triode, k * vds_eff, k * vov), 0.0)

    factor = jnp.maximum(1.0 + lam * vds_eff, 0.0)
    ids_eff = ids0 * factor
    d_vds = gds0 * factor + ids0 * lam
    d_vgs = gm0 * factor
    # body effect: d Ids_eff / d vsb_eff = -gm0 * dVth/dVsb (same quirky
    # lambda treatment as gm: gm0 * factor)
    d_vsb = -gm0 * dvth_dvsb * factor

    ids = p * ids_eff
    # Chain rule back to physical node voltages; p^2 == 1 cancels
    # (element.cpp:266-271).  vsb_eff = p*vs adds d_vsb straight onto gs.
    gd = d_vds
    gg = d_vgs
    gs = -(d_vds + d_vgs) + d_vsb
    cst = ids - gd * vd - gg * vg - gs * vs
    return gd, gg, gs, cst


def mos_stamp_vals(vth, k, lam, p, vd, vg, vs, off_gds=1e-12,
                   reverse_region=False, gamma=None, phi=None):
    """(G-entry values (6*nM,), RHS values (2*nM,)) for the conduction stamp.

    Entry order per device matches the static index pattern built in
    ir/lower.py: rows [D,D,D,S,S,S], cols [D,G,S,D,G,S]; RHS rows [D,S].
    """
    gd, gg, gs, cst = mos_linearize(vth, k, lam, p, vd, vg, vs, off_gds,
                                    reverse_region, gamma=gamma, phi=phi)
    gvals = jnp.stack([gd, gg, gs, -gd, -gg, -gs],
                      axis=-1).reshape(*gd.shape[:-1], -1)
    rhs = jnp.stack([-cst, cst], axis=-1).reshape(*cst.shape[:-1], -1)
    return gvals, rhs
