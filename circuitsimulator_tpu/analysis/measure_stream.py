"""Streaming `.MEASURE` evaluation inside the transient scan (extension).

The host-side evaluator (analysis/measure.py) needs the full (T, N)
waveform array; at Monte-Carlo / .STEP scale (8192 lanes x 50k steps) that
is tens of gigabytes.  This module evaluates the same measurements as
O(1)-memory accumulators carried through the `lax.scan` — per-lane
min/max/integrals and interpolated crossing times update each step, and
nothing but the (B,)-shaped results ever materializes.  This is the
TPU-native answer to "measure a sweep": the waveform lives and dies in
VMEM/registers, the statistics come home.

Semantics match analysis/measure.py with one documented approximation:
window statistics (FROM/TO on AVG/RMS/INTEG) clip to whole grid segments
instead of interpolating fractional window endpoints — an O(dt/window)
difference.  Crossing times are linearly interpolated exactly like the
host path.

Usage:
    sm = StreamingMeasures(measures, topo, dtype)
    res, vals = run_transient_streaming(engine, params, tstep, tstop, sm)
    # vals: {measure_name: per-lane value}
Batched: jax.vmap / parallel.montecarlo.batched_transient_measures.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..ir.lower import Topology
from ..netlist.parser import EventSpec, MeasureSpec
from ..ops.assemble import Engine


def _probe_pair(topo: Topology, probe) -> Optional[Tuple[int, int, str]]:
    """(a, b, mod) with value = xe[a] - xe[b] then the modifier applied
    (dump slot = 0 handles ground/absent); None if unresolvable.  Transient
    data is real, so only the "db" modifier acts (matching
    measure._apply_mod); VP/VR/VI pass the raw value through."""
    v_by = dict(zip(topo.volt_col_names, [int(e) for e in topo.volt_col_eqs]))
    i_by = dict(zip(topo.branch_col_names,
                    [int(e) for e in topo.branch_col_eqs]))
    dump = topo.n_unknowns

    def veq(name):
        if name in v_by:
            return v_by[name]
        return dump if name.lower() in ("0", "gnd") else None

    mod = getattr(probe, "mod", "")
    if probe.kind == "nv":
        a = veq(probe.node1)
        return None if a is None else (a, dump, mod)
    if probe.kind == "dv":
        a, b = veq(probe.node1), veq(probe.node2)
        return None if a is None or b is None else (a, b, mod)
    if probe.kind == "br" and probe.ele_name in i_by:
        return (i_by[probe.ele_name], dump, mod)
    return None


def _edge_hit(prev_y, y, ev: EventSpec):
    """(hit, frac): a crossing of ev.val in this segment with the wanted
    edge direction; frac is the linear-interpolation fraction."""
    val = ev.val
    rising = (prev_y < val) & (y >= val)
    falling = (prev_y > val) & (y <= val)
    if ev.edge == "rise":
        hit = rising
    elif ev.edge == "fall":
        hit = falling
    else:
        hit = rising | falling
    denom = jnp.where(y == prev_y, 1.0, y - prev_y)
    frac = jnp.clip((val - prev_y) / denom, 0.0, 1.0)
    return hit, frac


class _Crossing:
    """Streaming n-th / LAST crossing tracker for one EventSpec."""

    def __init__(self, ev: EventSpec, pair):
        self.ev = ev
        self.pair = pair

    def init(self, y0):
        z = jnp.zeros_like(y0)
        return {"prev": y0, "count": jnp.zeros_like(y0, jnp.int32),
                "t": jnp.full_like(z, jnp.nan), "aux": jnp.full_like(z,
                                                                    jnp.nan)}

    def update(self, c, y, t, dt, aux_prev=None, aux=None):
        """aux/aux_prev: a second waveform sampled at the crossing
        (FIND ... WHEN); interpolated with the same fraction."""
        hit, frac = _edge_hit(c["prev"], y, self.ev)
        tc = t - dt + frac * dt
        hit = hit & (tc >= self.ev.td)
        count = c["count"] + hit.astype(jnp.int32)
        if self.ev.n == -1:      # LAST: keep overwriting
            record = hit
        else:
            record = hit & (count == self.ev.n)
        t_new = jnp.where(record, tc, c["t"])
        out = {"prev": y, "count": count, "t": t_new, "aux": c["aux"]}
        if aux is not None:
            a_int = aux_prev + frac * (aux - aux_prev)
            out["aux"] = jnp.where(record, a_int, c["aux"])
        return out


class StreamingMeasures:
    """Compiled accumulator set for a list of TRAN MeasureSpecs.

    All probe reads funnel through ONE one-hot matmul per step: dynamic
    gathers inside a TPU scan body cost ~0.1 ms each at batch scale (see
    ops/assemble.py hot-path notes), so the probes are compiled into a
    (nP, N) selection matrix and each accumulator reads its value by a
    static index into the tiny result vector."""

    def __init__(self, measures: List[MeasureSpec], topo: Topology, dtype):
        self.dtype = dtype
        self.specs = []
        self._pairs: List[Tuple[int, int, str]] = []

        def intern(pair):
            if pair is None:
                return None
            if pair not in self._pairs:
                self._pairs.append(pair)
            return self._pairs.index(pair)

        for m in measures:
            if m.analysis != "tran" or m.kind == "param":
                # derived (PARAM=) measures are evaluated on the host from
                # the finished results — apply_derived_measures
                continue
            entry = {"m": m}
            if m.kind == "stat":
                entry["p"] = intern(_probe_pair(topo, m.probe))
            elif m.kind == "when":
                entry["c1"] = _Crossing(
                    m.ev1, intern(_probe_pair(topo, m.ev1.probe)))
            elif m.kind == "trig_targ":
                entry["c1"] = _Crossing(
                    m.ev1, intern(_probe_pair(topo, m.ev1.probe)))
                entry["c2"] = _Crossing(
                    m.ev2, intern(_probe_pair(topo, m.ev2.probe)))
            elif m.kind == "find_at":
                entry["p"] = intern(_probe_pair(topo, m.probe))
            elif m.kind == "find_when":
                entry["p"] = intern(_probe_pair(topo, m.probe))
                entry["c1"] = _Crossing(
                    m.ev1, intern(_probe_pair(topo, m.ev1.probe)))
            self.specs.append(entry)
        N = topo.n_unknowns
        P = np.zeros((max(len(self._pairs), 1), N))
        for j, (a, b, _) in enumerate(self._pairs):
            if a < N:
                P[j, a] += 1.0
            if b < N:
                P[j, b] -= 1.0
        self._P = jnp.asarray(P, dtype)
        self._db = [mod == "db" for (_, _, mod) in self._pairs]

    @property
    def probe_matrix(self):
        """(nP, N) one-hot probe-selection matrix — external steppers
        (e.g. the fused Pallas chunk kernel, ops/pallas_step.py) read raw
        probe values with it and feed them back via vals_from_raw /
        init_vals / update_vals."""
        return self._P

    def vals_from_raw(self, raw):
        """Apply the probe modifiers (db) to raw (..., nP) matmul reads."""
        if any(self._db):
            tiny = jnp.finfo(raw.dtype).tiny
            db = 20.0 * jnp.log10(jnp.maximum(jnp.abs(raw), tiny))
            mask = jnp.asarray(self._db)
            raw = jnp.where(mask, db, raw)
        return raw

    def _probe_vals(self, x):
        """(..., nP) probe values via the one-hot matmul."""
        return self.vals_from_raw(jnp.einsum("...n,pn->...p", x, self._P))

    @staticmethod
    def _val(ys, idx):
        return ys[..., idx]

    def init(self, engine: Engine, x0):
        return self.init_vals(self._probe_vals(x0))

    def init_vals(self, ys):
        """Accumulator init from probe VALUES (..., nP) at t = 0."""
        accs = []
        nan = jnp.asarray(jnp.nan, self.dtype)
        for e in self.specs:
            m = e["m"]
            lane = ys[..., 0] * 0.0       # (lanes,) zeros of the right shape
            if m.kind == "stat":
                if e["p"] is None:
                    accs.append({"bad": lane})
                    continue
                y0 = self._val(ys, e["p"])
                in_w = m.t_from <= 0.0
                big = jnp.asarray(jnp.inf, self.dtype)
                accs.append({
                    "prev": y0,
                    "min": jnp.where(in_w, y0, big),
                    "max": jnp.where(in_w, y0, -big),
                    "tmin": lane, "tmax": lane,
                    "integ": lane, "integ2": lane, "span": lane,
                })
            elif m.kind == "when":
                if e["c1"].pair is None:
                    accs.append({"bad": lane})
                    continue
                accs.append(e["c1"].init(self._val(ys, e["c1"].pair)))
            elif m.kind == "trig_targ":
                if e["c1"].pair is None or e["c2"].pair is None:
                    accs.append({"bad": lane})
                    continue
                accs.append({"a": e["c1"].init(self._val(ys, e["c1"].pair)),
                             "b": e["c2"].init(self._val(ys, e["c2"].pair))})
            elif m.kind == "find_at":
                if e["p"] is None:
                    accs.append({"bad": lane})
                    continue
                y0 = self._val(ys, e["p"])
                accs.append({"prev": y0,
                             "y": jnp.where(m.at <= 0.0, y0, nan)})
            elif m.kind == "find_when":
                if e["p"] is None or e["c1"].pair is None:
                    accs.append({"bad": lane})
                    continue
                c = e["c1"].init(self._val(ys, e["c1"].pair))
                accs.append({"c": c, "prev_main": self._val(ys, e["p"])})
        return tuple(accs)

    def update(self, engine: Engine, accs, x, t, dt):
        return self.update_vals(accs, self._probe_vals(x), t, dt)

    def update_vals(self, accs, ys, t, dt):
        """Accumulator update from probe VALUES (..., nP) at time t."""
        out = []
        for e, a in zip(self.specs, accs):
            m = e["m"]
            if "bad" in a:
                out.append(a)
                continue
            if m.kind == "stat":
                y = self._val(ys, e["p"])
                in_pt = (t >= m.t_from) & (t <= m.t_to)
                seg = (t - dt >= m.t_from) & (t <= m.t_to)
                mn = jnp.where(in_pt & (y < a["min"]), y, a["min"])
                mx = jnp.where(in_pt & (y > a["max"]), y, a["max"])
                out.append({
                    "prev": y,
                    "min": mn, "max": mx,
                    "tmin": jnp.where(in_pt & (y < a["min"]), t, a["tmin"]),
                    "tmax": jnp.where(in_pt & (y > a["max"]), t, a["tmax"]),
                    "integ": a["integ"]
                    + jnp.where(seg, 0.5 * (y + a["prev"]) * dt, 0.0),
                    "integ2": a["integ2"]
                    + jnp.where(seg,
                                0.5 * (y * y + a["prev"] * a["prev"]) * dt,
                                0.0),
                    "span": a["span"] + jnp.where(seg, dt, 0.0),
                })
            elif m.kind == "when":
                out.append(e["c1"].update(a, self._val(ys, e["c1"].pair),
                                          t, dt))
            elif m.kind == "trig_targ":
                out.append({
                    "a": e["c1"].update(a["a"],
                                        self._val(ys, e["c1"].pair), t, dt),
                    "b": e["c2"].update(a["b"],
                                        self._val(ys, e["c2"].pair), t, dt),
                })
            elif m.kind == "find_at":
                y = self._val(ys, e["p"])
                inside = (t - dt < m.at) & (m.at <= t)
                frac = jnp.clip((m.at - (t - dt)) / dt, 0.0, 1.0)
                y_at = a["prev"] + frac * (y - a["prev"])
                out.append({"prev": y,
                            "y": jnp.where(inside, y_at, a["y"])})
            elif m.kind == "find_when":
                y_main = self._val(ys, e["p"])
                c = e["c1"].update(a["c"], self._val(ys, e["c1"].pair),
                                   t, dt, aux_prev=a["prev_main"],
                                   aux=y_main)
                out.append({"c": c, "prev_main": y_main})
        return tuple(out)

    def finalize(self, accs) -> Dict[str, Any]:
        vals = {}
        nan = jnp.asarray(jnp.nan, self.dtype)
        for e, a in zip(self.specs, accs):
            m = e["m"]
            if "bad" in a:
                vals[m.name] = a["bad"] + nan
                continue
            if m.kind == "stat":
                span = a["span"]
                safe = jnp.where(span > 0, span, 1.0)
                table = {
                    "min": a["min"], "max": a["max"],
                    "pp": a["max"] - a["min"],
                    "min_at": a["tmin"], "max_at": a["tmax"],
                    "integ": a["integ"],
                    "avg": jnp.where(span > 0, a["integ"] / safe, nan),
                    "rms": jnp.where(span > 0,
                                     jnp.sqrt(a["integ2"] / safe), nan),
                }
                vals[m.name] = table[m.stat]
            elif m.kind == "when":
                vals[m.name] = a["t"]
            elif m.kind == "trig_targ":
                vals[m.name] = a["b"]["t"] - a["a"]["t"]
            elif m.kind == "find_at":
                vals[m.name] = a["y"]
            elif m.kind == "find_when":
                vals[m.name] = a["c"]["aux"]
        return vals


def run_transient_streaming(engine: Engine, params, tstep, tstop,
                            sm: StreamingMeasures,
                            x0: Optional[Any] = None,
                            noise_key=None):
    """Transient with save_xs=False semantics plus streaming measures.
    Returns (TransientResult-without-xs, {name: per-lane value}).
    noise_key activates TRNOISE sources (see transient.run_transient)."""
    from .dc import dc_operating_point
    from .transient import (TransientResult, n_steps_for, transient_step_fn)
    dtype = engine.dtype
    with jax.ensure_compile_time_eval():
        dt = jnp.asarray(tstep, dtype)
    n_steps = n_steps_for(float(tstep), float(tstop))
    if x0 is None:
        x0 = dc_operating_point(engine, params)
    state0 = engine.init_state(x0, params, dt, noise_key=noise_key)
    failed0 = jnp.zeros(x0.shape[:-1], dtype=bool)
    predictor = engine.opts.tran_predictor
    carry0 = (x0, x0, state0, failed0) if predictor else (x0, state0, failed0)
    ts = jnp.arange(1, n_steps + 1, dtype=dtype) * dt
    step = transient_step_fn(engine, params, dt, predictor=predictor)
    acc0 = sm.init(engine, x0)

    def body(c, t):
        inner, acc = c
        inner, (x, iters) = step(inner, t)
        acc = sm.update(engine, acc, x, t, dt)
        return (inner, acc), iters

    (carry, acc), iters = lax.scan(body, (carry0, acc0), ts)
    res = TransientResult(times=ts, xs=None, x_final=carry[0],
                          newton_iters=iters, failed=carry[-1],
                          n_steps=n_steps)
    return res, sm.finalize(acc)


def apply_derived_measures(measures, vals, bindings=None):
    """Evaluate kind == "param" derived measures over concrete per-lane
    result arrays (host-side; call AFTER the device computation).  Returns
    vals with the derived names added, preserving card order semantics."""
    from ..utils.expr import eval_expr, ExprError
    derived = [m for m in measures
               if m.analysis == "tran" and m.kind == "param"]
    if not derived:
        return vals
    vals = dict(vals)
    names = [m.name for m in measures if m.analysis == "tran"]
    some = next(iter(vals.values()))
    shape = np.shape(some)
    for m in derived:
        outv = np.empty(shape)
        it = np.ndindex(shape) if shape else [()]
        for idx in it:
            env = dict(bindings or {})
            for n in names:
                if n in vals:
                    env[n] = float(np.asarray(vals[n])[idx]) if shape                         else float(vals[n])
            try:
                outv[idx] = eval_expr(m.expr, env)
            except ExprError:
                outv[idx] = np.nan
        vals[m.name] = outv if shape else float(outv)
    return vals
