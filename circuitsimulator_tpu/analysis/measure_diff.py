"""Differentiable `.MEASURE` evaluation (jnp twin of analysis/measure.py).

The host evaluator (`run_measures`) is numpy — fine for reporting, but
opaque to JAX.  This module compiles a MeasureSpec into a pure-jnp
function `f(times, xs) -> scalar` whose VALUE matches the host
evaluator and whose GRADIENT flows through the differentiable transient
(analysis/adjoint.diff_transient), so FORM worst-case searches,
mismatch budgets, and calibration can target the deck's own measure
cards — including crossing times and TRIG/TARG delays (timing yield).

Non-differentiable selections (which interval brackets the n-th
crossing, which sample is the extremum) are frozen with
`lax.stop_gradient`; the measured VALUE (interpolated crossing time,
window integral, extremum) stays differentiable through that frozen
selection — the standard subgradient treatment, exact wherever the
selection is locally stable.

Supported kinds: stat (AVG/RMS/INTEG/MIN/MAX/PP over FROM/TO),
find_at, when, trig_targ, find_when.  A missing event returns NaN like
the host evaluator.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..ir.lower import Topology


def diff_probe(topo: Topology, probe) -> Callable:
    """ProbeSpec -> fn(xs) -> (T,) waveform (transient data)."""
    v_by_name = dict(zip(topo.volt_col_names,
                         [int(e) for e in topo.volt_col_eqs]))
    i_by_name = dict(zip(topo.branch_col_names,
                         [int(e) for e in topo.branch_col_eqs]))
    mod = getattr(probe, "mod", "")

    def veq(name):
        if name in v_by_name:
            return v_by_name[name]
        return -1 if name.lower() in ("0", "gnd") else None

    if probe.kind == "nv":
        eq = veq(probe.node1)
        if eq is None:
            raise KeyError(f"unresolvable probe node {probe.node1!r}")
        if eq < 0:
            base = lambda xs: jnp.zeros(xs.shape[0], xs.dtype)
        else:
            base = lambda xs: xs[:, eq]
    elif probe.kind == "dv":
        ea, eb = veq(probe.node1), veq(probe.node2)
        if ea is None or eb is None:
            raise KeyError("unresolvable differential probe")
        base = lambda xs: ((xs[:, ea] if ea >= 0 else 0.0)
                           - (xs[:, eb] if eb >= 0 else 0.0))
    elif probe.kind == "br" and probe.ele_name in i_by_name:
        eq = i_by_name[probe.ele_name]
        base = lambda xs: xs[:, eq]
    else:
        raise KeyError(f"unresolvable probe {probe!r}")
    if mod == "db":
        return lambda xs: 20.0 * jnp.log10(
            jnp.maximum(jnp.abs(base(xs)), 1e-300))
    return base


def diff_event_time(t, y, val, edge: str, td: float, n: int):
    """Interpolated n-th crossing time (n = -1: last); NaN if absent.
    Matches measure._event_time; selection is stop_gradient-frozen."""
    d = y - val
    rise = (d[:-1] < 0) & (d[1:] >= 0)
    fall = (d[:-1] > 0) & (d[1:] <= 0)
    hits = rise if edge == "rise" else fall if edge == "fall" \
        else (rise | fall)
    denom = d[1:] - d[:-1]
    safe = jnp.where(jnp.abs(denom) > 0, denom, 1.0)
    frac = jnp.where(hits, d[:-1] / -safe, 0.0)
    tc = t[:-1] + frac * (t[1:] - t[:-1])
    hits = hits & (tc >= td)
    hits = jax.lax.stop_gradient(hits)
    cnt = jnp.cumsum(hits.astype(jnp.int32))
    total = cnt[-1]
    want = jnp.where(jnp.asarray(n) == -1, total, jnp.asarray(n))
    sel = (hits & (cnt == want)).astype(y.dtype)
    sel = jax.lax.stop_gradient(sel)
    found = (total >= jnp.maximum(want, 1)) & (want >= 1)
    t_hit = (sel * tc).sum()
    return jnp.where(found, t_hit, jnp.nan)


def diff_interp_at(t, y, when):
    inside = (t[0] <= when) & (when <= t[-1])
    return jnp.where(inside, jnp.interp(jnp.asarray(when, t.dtype), t, y),
                     jnp.nan)


def _window_weights(t, t0: float, t1: float):
    """Per-interval clipped endpoints (a_i, b_i) of [t0,t1]∩[t_i,t_i+1]."""
    a = jnp.maximum(t[:-1], t0)
    b = jnp.minimum(t[1:], t1)
    w = jnp.maximum(b - a, 0.0)
    return a, b, w


def diff_stat(stat: str, t_from: float, t_to: float):
    """Windowed statistic fn(t, y) — the piecewise-linear integrals
    match the host's interpolated-endpoint trapezoids exactly."""

    def f(t, y):
        t0 = jnp.maximum(jnp.asarray(t_from, t.dtype), t[0])
        t1 = jnp.minimum(jnp.asarray(t_to, t.dtype), t[-1])
        dt_ = t[1:] - t[:-1]
        slope = (y[1:] - y[:-1]) / jnp.where(dt_ > 0, dt_, 1.0)
        a, b, w = _window_weights(t, t0, t1)
        ya = y[:-1] + slope * (a - t[:-1])
        yb = y[:-1] + slope * (b - t[:-1])
        span = t1 - t0
        if stat == "integ":
            return (w * (ya + yb) / 2.0).sum()
        if stat == "avg":
            integ = (w * (ya + yb) / 2.0).sum()
            y0 = jnp.interp(t0, t, y)
            return jnp.where(span > 0, integ / span, y0)
        if stat == "rms":
            # trapezoid of the SQUARED samples — matches the host
            # evaluator (np.trapezoid(yw², tw)), not the exact segment
            # integral, so both paths report identical values
            integ2 = (w * (ya * ya + yb * yb) / 2.0).sum()
            y0 = jnp.abs(jnp.interp(t0, t, y))
            return jnp.where(span > 0, jnp.sqrt(integ2 / span), y0)
        # extremum stats over interior samples + interpolated endpoints
        inside = (t > t0) & (t < t1)
        ybig = jnp.where(inside, y, jnp.inf)
        ysml = jnp.where(inside, y, -jnp.inf)
        ends = jnp.stack([jnp.interp(t0, t, y), jnp.interp(t1, t, y)])
        vmin = jnp.minimum(ybig.min(), ends.min())
        vmax = jnp.maximum(ysml.max(), ends.max())
        if stat == "min":
            return vmin
        if stat == "max":
            return vmax
        if stat == "pp":
            return vmax - vmin
        raise NotImplementedError(f"stat {stat!r} not differentiable "
                                  "(min_at/max_at: use the host path)")

    return f


def diff_probe_ac(topo: Topology, probe) -> Callable:
    """ProbeSpec -> fn(xr, xi) -> (F,) real AC waveform with the probe
    modifier applied (default magnitude; VDB/VP/VR/VI)."""
    v_by_name = dict(zip(topo.volt_col_names,
                         [int(e) for e in topo.volt_col_eqs]))
    i_by_name = dict(zip(topo.branch_col_names,
                         [int(e) for e in topo.branch_col_eqs]))
    mod = getattr(probe, "mod", "")

    def veq(name):
        if name in v_by_name:
            return v_by_name[name]
        return -1 if name.lower() in ("0", "gnd") else None

    if probe.kind == "nv":
        eq = veq(probe.node1)
        if eq is None:
            raise KeyError(f"unresolvable probe node {probe.node1!r}")
        pair = lambda xr, xi: ((xr[:, eq], xi[:, eq]) if eq >= 0 else
                               (jnp.zeros(xr.shape[0], xr.dtype),) * 2)
    elif probe.kind == "dv":
        ea, eb = veq(probe.node1), veq(probe.node2)
        if ea is None or eb is None:
            raise KeyError("unresolvable differential probe")
        pair = lambda xr, xi: (
            (xr[:, ea] if ea >= 0 else 0.0)
            - (xr[:, eb] if eb >= 0 else 0.0),
            (xi[:, ea] if ea >= 0 else 0.0)
            - (xi[:, eb] if eb >= 0 else 0.0))
    elif probe.kind == "br" and probe.ele_name in i_by_name:
        eq = i_by_name[probe.ele_name]
        pair = lambda xr, xi: (xr[:, eq], xi[:, eq])
    else:
        raise KeyError(f"unresolvable probe {probe!r}")

    def f(xr, xi):
        r, i = pair(xr, xi)
        if mod == "db":
            return 20.0 * jnp.log10(
                jnp.maximum(jnp.sqrt(r * r + i * i), 1e-300))
        if mod == "ph":
            return jnp.degrees(jnp.arctan2(i, r))
        if mod == "re":
            return r
        if mod == "im":
            return i
        return jnp.sqrt(r * r + i * i)

    return f


def diff_measure_ac(m, topo: Topology) -> Callable:
    """MeasureSpec (analysis == "ac") -> differentiable
    fn(freqs, xr, xi) -> scalar; the sweep axis plays the role of time
    (a WHEN VDB(out)=-3 card measures the -3 dB frequency)."""
    if m.kind == "stat":
        probe = diff_probe_ac(topo, m.probe)
        stat = diff_stat(m.stat, m.t_from, m.t_to)
        return lambda f, xr, xi: stat(f, probe(xr, xi))
    if m.kind == "find_at":
        probe = diff_probe_ac(topo, m.probe)
        return lambda f, xr, xi: diff_interp_at(f, probe(xr, xi), m.at)
    if m.kind == "when":
        probe = diff_probe_ac(topo, m.ev1.probe)
        ev = m.ev1
        return lambda f, xr, xi: diff_event_time(
            f, probe(xr, xi), ev.val, ev.edge, ev.td, ev.n)
    if m.kind == "trig_targ":
        p1 = diff_probe_ac(topo, m.ev1.probe)
        p2 = diff_probe_ac(topo, m.ev2.probe)
        e1, e2 = m.ev1, m.ev2
        return lambda f, xr, xi: (
            diff_event_time(f, p2(xr, xi), e2.val, e2.edge, e2.td, e2.n)
            - diff_event_time(f, p1(xr, xi), e1.val, e1.edge, e1.td,
                              e1.n))
    if m.kind == "find_when":
        probe = diff_probe_ac(topo, m.probe)
        pw = diff_probe_ac(topo, m.ev1.probe)
        ev = m.ev1
        return lambda f, xr, xi: diff_interp_at(
            f, probe(xr, xi),
            diff_event_time(f, pw(xr, xi), ev.val, ev.edge, ev.td, ev.n))
    raise NotImplementedError(f"AC measure kind {m.kind!r} is not "
                              "differentiable")


def diff_measure(m, topo: Topology) -> Callable:
    """MeasureSpec -> differentiable fn(times, xs) -> scalar (transient
    analysis only; value-parity with evaluate_measure)."""
    if m.kind == "stat":
        probe = diff_probe(topo, m.probe)
        stat = diff_stat(m.stat, m.t_from, m.t_to)
        return lambda t, xs: stat(t, probe(xs))
    if m.kind == "find_at":
        probe = diff_probe(topo, m.probe)
        return lambda t, xs: diff_interp_at(t, probe(xs), m.at)
    if m.kind == "when":
        probe = diff_probe(topo, m.ev1.probe)
        ev = m.ev1
        return lambda t, xs: diff_event_time(t, probe(xs), ev.val,
                                             ev.edge, ev.td, ev.n)
    if m.kind == "trig_targ":
        p1 = diff_probe(topo, m.ev1.probe)
        p2 = diff_probe(topo, m.ev2.probe)
        e1, e2 = m.ev1, m.ev2
        return lambda t, xs: (
            diff_event_time(t, p2(xs), e2.val, e2.edge, e2.td, e2.n)
            - diff_event_time(t, p1(xs), e1.val, e1.edge, e1.td, e1.n))
    if m.kind == "find_when":
        probe = diff_probe(topo, m.probe)
        pw = diff_probe(topo, m.ev1.probe)
        ev = m.ev1
        return lambda t, xs: diff_interp_at(
            t, probe(xs),
            diff_event_time(t, pw(xs), ev.val, ev.edge, ev.td, ev.n))
    raise NotImplementedError(f"measure kind {m.kind!r} is not "
                              "differentiable (PARAM: derive on host)")
