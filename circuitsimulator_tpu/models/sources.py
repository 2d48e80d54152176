"""Vectorized independent-source waveform evaluation.

jnp twin of the scalar evaluators in netlist/circuit.py (reference:
sim.hpp:75-162).  All functions evaluate *all* sources of a class at once:
parameters are struct-of-arrays over the sources, ``t``/``scale`` are scalars
(or batched via vmap at a higher level).

Source parameter pack layout (see ir/lower.py):
  kind : (nS,) int32   0=NONE 1=PULSE 2=SIN 3=PWL
  pulse: (nS, 7) [v1, v2, td, tr, tf, ton, per]
  sin  : (nS, 5) [v0, va, freq, td, phi]
  pwl_t, pwl_v: (nS, P) padded; pwl_n: (nS,) valid count
"""

from __future__ import annotations

import jax.numpy as jnp

from ..netlist.circuit import (WAVE_PULSE, WAVE_SIN, WAVE_PWL, WAVE_EXP,
                               WAVE_SFFM)


def _clamp01(x):
    return jnp.clip(x, 0.0, 1.0)


def _safe_div(num, den):
    """num/den with den==0 mapped to +/-inf by the sign of num (IEEE x/0
    semantics, matching the C++ evaluators' unguarded divisions) except that
    0/0 yields +inf rather than NaN so downstream clamps stay NaN-free."""
    num = jnp.asarray(num)
    inf = jnp.asarray(jnp.inf, dtype=num.dtype)
    zero_den = jnp.where(num < 0.0, -inf, inf)
    return jnp.where(den != 0.0, num / jnp.where(den != 0.0, den, 1.0), zero_den)


def eval_pulse(pulse, t):
    v1, v2, td, tr, tf, ton, per = [pulse[..., i] for i in range(7)]
    # --- single-shot branch (per <= 0), sim.hpp:81-95 ---
    tau1 = t - td
    rise1 = v1 + _clamp01(_safe_div(tau1, tr)) * (v2 - v1)
    tfall1 = tau1 - (tr + ton)
    fall1 = v2 + _clamp01(_safe_div(tfall1, tf)) * (v1 - v2)
    single = jnp.where(
        tau1 <= 0.0, v1,
        jnp.where(tau1 < tr, rise1,
                  jnp.where(tau1 < tr + ton, v2, fall1)))
    # --- periodic branch (per > 0), sim.hpp:96-114 ---
    # jnp.mod returns a value in [0, per) for positive per, matching the
    # reference's fmod-then-fixup (sim.hpp:99-100)
    safe_per = jnp.where(per > 0.0, per, 1.0)
    tau2 = jnp.mod(t - td, safe_per)
    rise2 = v1 + (v2 - v1) * _clamp01(_safe_div(tau2, tr))
    tfall2 = tau2 - (tr + ton)
    fall2 = v2 + (v1 - v2) * _clamp01(_safe_div(tfall2, tf))
    periodic = jnp.where(
        t < td, v1,
        jnp.where(tau2 < tr, rise2,
                  jnp.where(tau2 < tr + ton, v2,
                            jnp.where(tau2 < tr + ton + tf, fall2, v1))))
    return jnp.where(per <= 0.0, single, periodic)


def eval_sin(sin, t):
    v0, va, freq, td, phi = [sin[..., i] for i in range(5)]
    tau = t - td
    w = 2.0 * jnp.pi * freq
    return jnp.where(t < td, v0, v0 + va * jnp.sin(w * tau + phi))


def eval_pwl(pwl_t, pwl_v, pwl_n, t):
    P = pwl_t.shape[-1]
    idx = jnp.arange(P)
    valid = idx[None, :] < pwl_n[:, None]
    big = jnp.asarray(jnp.finfo(pwl_t.dtype).max, dtype=pwl_t.dtype)
    tt = jnp.where(valid, pwl_t, big)
    # i = (# of breakpoints with tt[i] < t) - 1, matching the reference's
    # "tt[i] < t <= tt[i+1]" scan (sim.hpp:131-136)
    cnt = jnp.sum((tt < t) & valid, axis=-1)
    i = jnp.clip(cnt - 1, 0, P - 1)
    ip1 = jnp.clip(cnt, 0, P - 1)
    t_i = jnp.take_along_axis(pwl_t, i[:, None], axis=-1)[:, 0]
    t_ip1 = jnp.take_along_axis(pwl_t, ip1[:, None], axis=-1)[:, 0]
    v_i = jnp.take_along_axis(pwl_v, i[:, None], axis=-1)[:, 0]
    v_ip1 = jnp.take_along_axis(pwl_v, ip1[:, None], axis=-1)[:, 0]
    k = _safe_div(t - t_i, t_ip1 - t_i)
    mid = v_i + (v_ip1 - v_i) * k
    first_t = pwl_t[:, 0]
    lastidx = jnp.clip(pwl_n - 1, 0, P - 1)
    last_t = jnp.take_along_axis(pwl_t, lastidx[:, None], axis=-1)[:, 0]
    first_v = pwl_v[:, 0]
    last_v = jnp.take_along_axis(pwl_v, lastidx[:, None], axis=-1)[:, 0]
    out = jnp.where(t <= first_t, first_v,
                    jnp.where(t >= last_t, last_v, mid))
    return jnp.where(pwl_n == 0, jnp.zeros_like(out), out)


def eval_exp(pulse, t):
    """EXP(v1 v2 td1 tau1 td2 tau2) packed into the 7-slot PULSE block
    [v1, v2, td1, tau1, td2, tau2, -] (see netlist/circuit.py WAVE_EXP)."""
    v1, v2, td1, tau1, td2, tau2 = [pulse[..., i] for i in range(6)]
    dv = v2 - v1

    def seg(td, tau, amp):
        full = jnp.where(t > td, amp, 0.0)
        decay = amp * (1.0 - jnp.exp(-jnp.maximum(t - td, 0.0)
                                     / jnp.where(tau > 0.0, tau, 1.0)))
        return jnp.where(tau > 0.0, jnp.where(t > td, decay, 0.0), full)

    return v1 + seg(td1, tau1, dv) + seg(td2, tau2, -dv)


def eval_sffm(sin, t):
    """SFFM(vo va fc mdi fs) packed into the 5-slot SIN block
    [vo, va, fc, mdi, fs] (see netlist/circuit.py WAVE_SFFM)."""
    vo, va, fc, mdi, fs = [sin[..., i] for i in range(5)]
    two_pi = 2.0 * jnp.pi
    return vo + va * jnp.sin(two_pi * fc * t + mdi * jnp.sin(two_pi * fs * t))


def eval_waveform(kind, pulse, sin, pwl_t, pwl_v, pwl_n, t):
    out = jnp.zeros(kind.shape, dtype=pulse.dtype)
    out = jnp.where(kind == WAVE_PULSE, eval_pulse(pulse, t), out)
    out = jnp.where(kind == WAVE_SIN, eval_sin(sin, t), out)
    if pwl_t.shape[-1] > 0:
        out = jnp.where(kind == WAVE_PWL, eval_pwl(pwl_t, pwl_v, pwl_n, t), out)
    out = jnp.where(kind == WAVE_EXP, eval_exp(pulse, t), out)
    out = jnp.where(kind == WAVE_SFFM, eval_sffm(sin, t), out)
    return out


def eval_dc(dc, kind, sin, scale, pulse=None):
    """SourceSpec::evalDC (sim.hpp:152-158): SIN folds its v0 offset in;
    EXP folds v1 (its t<=td1 value) and SFFM its carrier offset vo."""
    base = dc + jnp.where((kind == WAVE_SIN) | (kind == WAVE_SFFM),
                          sin[..., 0], 0.0)
    if pulse is not None:
        base = base + jnp.where(kind == WAVE_EXP, pulse[..., 0], 0.0)
    return base * scale


def eval_tran(dc, kind, pulse, sin, pwl_t, pwl_v, pwl_n, t):
    """SourceSpec::evalTran (sim.hpp:160-162)."""
    return dc + eval_waveform(kind, pulse, sin, pwl_t, pwl_v, pwl_n, t)


def eval_tran_static_kinds(kinds_np, dc, pulse, sin, pwl_t, pwl_v, pwl_n, t):
    """eval_tran specialized on a *static* waveform-kind vector: only the
    formulas for kinds actually present in the circuit are emitted (waveform
    kinds are structural — a Monte-Carlo sweep perturbs float parameters,
    never the kind), so e.g. a SIN-only netlist compiles to a single fused
    sin expression with no selects, gathers, or dead PULSE/PWL code."""
    out = dc
    if (kinds_np == WAVE_PULSE).any():
        mask = jnp.asarray(kinds_np == WAVE_PULSE)
        out = out + jnp.where(mask, eval_pulse(pulse, t), 0.0)
    if (kinds_np == WAVE_SIN).any():
        mask = jnp.asarray(kinds_np == WAVE_SIN)
        out = out + jnp.where(mask, eval_sin(sin, t), 0.0)
    if (kinds_np == WAVE_PWL).any() and pwl_t.shape[-1] > 0:
        mask = jnp.asarray(kinds_np == WAVE_PWL)
        out = out + jnp.where(mask, eval_pwl(pwl_t, pwl_v, pwl_n, t), 0.0)
    if (kinds_np == WAVE_EXP).any():
        mask = jnp.asarray(kinds_np == WAVE_EXP)
        out = out + jnp.where(mask, eval_exp(pulse, t), 0.0)
    if (kinds_np == WAVE_SFFM).any():
        mask = jnp.asarray(kinds_np == WAVE_SFFM)
        out = out + jnp.where(mask, eval_sffm(sin, t), 0.0)
    return out
