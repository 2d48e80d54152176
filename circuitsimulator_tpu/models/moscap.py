"""Charge-conserving MOS capacitance model (opt-in extension,
`.OPTIONS MOSCAP=CHARGE` / SolverOptions.mos_cap_model="charge").

The reference lumps fixed, bias-independent junction caps on every MOS
(Cgs=Cgd=Cj0/2, Csb=Cdb=Cj0, /root/reference/src/tanalisis.cpp:321-353)
— replicated bit-for-bit as the default "fixed" model.  This module is
the standard fidelity step past it: TERMINAL CHARGES, not capacitances,
so the transient integrates i_t = dq_t/dt and charge is conserved
exactly over any closed bias loop (sum of per-step charge deltas
telescopes to q_end - q_start).

Gate model — strong-inversion sheet charge with Ward-Dutton partition
(Tsividis; the classic SPICE charge-conserving MOS cap model):
with vgt = vgs_eff - vth, d = vds_eff, D = vgt*d - d^2/2, Cox = COXWL:

  triode (0 <= d < vgt):
    q_G =  Cox * (vgt^3 - (vgt-d)^3) / (3 D)
    q_D = -Cox * (vgt^3 d^2/2 - 5 vgt^2 d^3/6 + vgt d^4/2 - d^5/10) / D^2
    q_S = -(q_G + q_D)
  saturation (d >= vgt > 0):
    q_G = (2/3) Cox vgt,  q_D = -(4/15) Cox vgt,  q_S = -(2/5) Cox vgt
    (the 40/60 Ward-Dutton split of the channel charge)
  cutoff (vgt <= 0): all zero.

Limits check out: d->0 gives q_G -> Cox*vgt with a 50/50 D/S split;
d->vgt matches the saturation row exactly (C^0 region boundaries).
PMOS rides the same p=-1 voltage mirror as the conduction model
(models/mosfet.py), with physical charges q_phys = p * q_eff;
vds_eff < 0 swaps drain/source roles (the charge sheet is symmetric
physics — unlike the reference's conduction model there is no "reverse
= off" quirk to replicate, the fixed model keeps that).

Junction model — the standard SPICE depletion charge for the S-B / D-B
junctions (bulk is reference-forced to ground, circuit.cpp:142):

  q(v) = CJ0*PB/(1-MJ) * (1 - (1 - v/PB)^(1-MJ))        v <= FC*PB
  linearized beyond FC*PB with the standard F1/F2/F3 coefficients
  (C(v) = CJ0*(F3 + MJ*v/PB)/F2), PB=0.8, MJ=0.5, FC=0.5 fixed.

Both are plain charge functions; every consumer gets capacitance
matrices via jax.jacfwd, so the Newton Jacobian and the AC/small-signal
trans-capacitances are exact derivatives of the same q.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# fixed junction-grading constants (the reference card carries CJ0 only)
PB = 0.8
MJ = 0.5
FC = 0.5


def mos_gate_charges(vd, vg, vs, vth, coxwl, p):
    """Ward-Dutton terminal charges at the PHYSICAL (d, g, s) terminals.

    All args broadcastable (nM,) arrays; p = +1 NMOS / -1 PMOS.
    Returns (q_d, q_g, q_s) with q_d + q_g + q_s = 0 identically.
    """
    vgs = p * (vg - vs)
    vds = p * (vd - vs)
    swap = vds < 0.0
    d_ = jnp.where(swap, -vds, vds)
    vgt = jnp.where(swap, vgs - vds, vgs) - vth   # vgd when swapped
    on = vgt > 0.0
    vgt = jnp.maximum(vgt, 0.0)
    sat = d_ >= vgt
    d_t = jnp.minimum(d_, vgt)                    # triode-clamped vds
    # safe denominators (double-where: NaN-free values AND gradients)
    D = vgt * d_t - 0.5 * d_t * d_t
    D_ok = D > 0.0
    Ds = jnp.where(D_ok, D, 1.0)
    qg_tri = coxwl * (vgt ** 3 - (vgt - d_t) ** 3) / (3.0 * Ds)
    qd_tri = -coxwl * (0.5 * vgt ** 3 * d_t ** 2
                       - (5.0 / 6.0) * vgt ** 2 * d_t ** 3
                       + 0.5 * vgt * d_t ** 4
                       - 0.1 * d_t ** 5) / (Ds * Ds)
    qg_sat = (2.0 / 3.0) * coxwl * vgt
    qd_sat = -(4.0 / 15.0) * coxwl * vgt
    # D == 0 means d_t == 0 (deep triode limit): qg = Cox*vgt, 50/50 split
    qg = jnp.where(D_ok, qg_tri, coxwl * vgt)
    qd = jnp.where(D_ok, qd_tri, -0.5 * coxwl * vgt)
    qg = jnp.where(sat, qg_sat, qg)
    qd = jnp.where(sat, qd_sat, qd)
    qg = jnp.where(on, qg, 0.0)
    qd = jnp.where(on, qd, 0.0)
    qs = -(qg + qd)
    # undo the role swap, then mirror PMOS back to physical charges
    qd_phys = p * jnp.where(swap, qs, qd)
    qs_phys = p * jnp.where(swap, qd, qs)
    return qd_phys, p * qg, qs_phys


def depletion_charge(v, cj0):
    """SPICE depletion charge vs FORWARD junction bias v (scalar/array).

    q'(v) = CJ0 / (1 - v/PB)^MJ for v <= FC*PB; beyond, the standard
    linearized capacitance C(v) = CJ0*(F3 + MJ*v/PB)/F2 integrated from
    the breakpoint (C^1 continuous)."""
    f1 = PB / (1.0 - MJ) * (1.0 - (1.0 - FC) ** (1.0 - MJ))
    f2 = (1.0 - FC) ** (1.0 + MJ)
    f3 = 1.0 - FC * (1.0 + MJ)
    vb = FC * PB
    v_lo = jnp.minimum(v, vb)
    arg = jnp.maximum(1.0 - v_lo / PB, 1e-6)
    q_lo = cj0 * PB / (1.0 - MJ) * (1.0 - arg ** (1.0 - MJ))
    dv = jnp.maximum(v - vb, 0.0)
    q_hi = cj0 / f2 * (f3 * dv
                       + 0.5 * (MJ / PB) * ((vb + dv) ** 2 - vb * vb))
    return jnp.where(v <= vb, q_lo, cj0 * f1 + q_hi)


def mos_junction_charges(vs, vd, cj0, p):
    """Depletion charges on the (S,B) and (D,B) junctions, as element
    charges q_el(v_node - v_bulk) with bulk grounded: i = dq_el/dt flows
    node -> ground, and dq_el/dv = +C_dep > 0 for both polarities.
    The reference's fixed model uses CJ0 per junction; the same CJ0 is
    the zero-bias depletion value here."""
    qsb = -p * depletion_charge(-p * vs, cj0)
    qdb = -p * depletion_charge(-p * vd, cj0)
    return qsb, qdb


def mos_all_charges(vd, vg, vs, vth, coxwl, cj0, p):
    """(q_d, q_g, q_s, q_sb, q_db) per device — the single source of
    truth every consumer differentiates.  Gate charges inject at
    (d, g, s); junction charges are node-to-ground elements at d and s.
    """
    qd, qg, qs = mos_gate_charges(vd, vg, vs, vth, coxwl, p)
    qsb, qdb = mos_junction_charges(vs, vd, cj0, p)
    return qd, qg, qs, qsb, qdb


def charges_of_x(vdgs, params):
    """Charge vector from per-device terminal voltages vdgs (..., nM, 3)
    ordered (vd, vg, vs): returns (..., nM, 5) in the order
    (q_d, q_g, q_s, q_sb, q_db)."""
    qd, qg, qs, qsb, qdb = mos_all_charges(
        vdgs[..., 0], vdgs[..., 1], vdgs[..., 2],
        params["mos_vth"], params["mos_coxwl"], params["mos_cj0"],
        params["mos_p"])
    return jnp.stack([qd, qg, qs, qsb, qdb], axis=-1)


def charge_jacobian(vdgs, params):
    """(q, dq/dv): charges (..., nM, 5) and their exact Jacobian
    (..., nM, 5, 3) w.r.t. (vd, vg, vs), via forward-mode AD of
    charges_of_x (three JVP passes — the charge functions are cheap)."""
    def qfun(v):
        return charges_of_x(v, params)

    q = qfun(vdgs)
    eye = jnp.eye(3, dtype=vdgs.dtype)
    cols = [jax.jvp(qfun, (vdgs,), (jnp.broadcast_to(eye[j], vdgs.shape),))[1]
            for j in range(3)]
    return q, jnp.stack(cols, axis=-1)
