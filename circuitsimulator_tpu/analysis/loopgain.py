"""Loop-gain / stability analysis via Bode's return ratio.

For a feedback loop closed through a VCVS (`E` source — the standard
way to model an error amplifier), the exact return ratio is computed
WITHOUT breaking the loop: null the dependent source (gain → 0), drive
its branch equation with a unit test voltage, and measure the control
voltage the loop returns:

    T(jω) = −gain · (V(cp) − V(cm)) |_(gain=0, V(p,m)=1)

one modified small-signal solve per frequency (the same real-2N system
as `.AC`).  Phase margin is read at the unity-gain crossover (log-f
interpolated), gain margin at the −180° crossing.  The reference has no
stability analysis (SURVEY.md §2); this is Bode's classic method made
trivial by the parameterized assembly.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.assemble import Engine
from .ac import ac_system_real, solve_ac_real


def loop_gain(engine: Engine, params, vcvs_index: int, freqs, x_op):
    """Return ratio of the `vcvs_index`-th E source over `freqs`.
    Returns complex (F,) T."""
    t = engine.topo
    k = int(t.vcvs_k[vcvs_index])
    cp = int(t.vcvs_ecp[vcvs_index])
    cm = int(t.vcvs_ecm[vcvs_index])
    N = engine.N
    gain = params["vcvs_gain"][vcvs_index]
    p0 = dict(params)
    p0["vcvs_gain"] = params["vcvs_gain"].at[vcvs_index].set(0.0)
    dtype = engine.dtype

    def one(f):
        G, B, _, _ = ac_system_real(engine, p0, x_op, 2.0 * jnp.pi * f)
        br = jnp.zeros((N,), dtype).at[k].set(1.0)
        bi = jnp.zeros((N,), dtype)
        xr, xi = solve_ac_real(engine, G, B, br, bi)
        vr = (xr[cp] if cp < N else 0.0) - (xr[cm] if cm < N else 0.0)
        vi = (xi[cp] if cp < N else 0.0) - (xi[cm] if cm < N else 0.0)
        return vr, vi

    fr = jnp.asarray(freqs, dtype)
    vr, vi = jax.jit(jax.vmap(one))(fr)
    return -float(gain) * (np.asarray(vr) + 1j * np.asarray(vi))


def margins(freqs, T):
    """Phase margin at |T| = 1, gain margin at phase = −180°, both
    log-f interpolated; None when the sweep does not cross."""
    freqs = np.asarray(freqs, float)
    mag = np.abs(T)
    ph = np.unwrap(np.angle(T))
    out = {"f_unity": None, "phase_margin_deg": None,
           "f_180": None, "gain_margin_db": None}
    lm = np.log10(mag)
    lf = np.log10(freqs)
    cross = np.flatnonzero((lm[:-1] > 0) & (lm[1:] <= 0))
    if len(cross):
        i = cross[0]
        w = lm[i] / (lm[i] - lm[i + 1])
        lfu = lf[i] + w * (lf[i + 1] - lf[i])
        phu = ph[i] + w * (ph[i + 1] - ph[i])
        out["f_unity"] = 10.0 ** lfu
        out["phase_margin_deg"] = 180.0 + np.degrees(phu)
    target = -np.pi
    cr = np.flatnonzero((ph[:-1] > target) & (ph[1:] <= target))
    if len(cr):
        i = cr[0]
        w = (ph[i] - target) / (ph[i] - ph[i + 1])
        lmx = lm[i] + w * (lm[i + 1] - lm[i])
        out["f_180"] = 10.0 ** (lf[i] + w * (lf[i + 1] - lf[i]))
        out["gain_margin_db"] = -20.0 * lmx
    return out
