"""`.STEP` parameter sweeps (extension; standard SPICE card).

TPU-native execution model: a `.STEP` does NOT re-run the simulator per
value the way SPICE engines loop.  The circuit topology is unchanged
across step values, so only the lowered params pytree differs — each step
value produces one params instance, the instances stack along a leading
batch axis, and the whole sweep runs as ONE vmapped (and shardable)
program through the already-compiled engine (parallel/montecarlo.py).
A 100-point step costs one compile plus one batched run.

For `.STEP PARAM name ...` the netlist is re-parsed per value with the
parameter override bound (host-side, microseconds) because a parameter
can feed arbitrarily many element values through `{...}` expressions.
For `.STEP <srcname> ...` the swept value maps directly onto the
vs_dc/is_dc leaf.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass
class StepResult:
    name: str                 # stepped parameter / source name
    kind: str                 # "param" | "source"
    values: Any               # (B,) swept values
    analysis: str             # "tran" | "op"
    result: Any               # batched TransientResult or (B, N) DC array
    measures: Optional[List] = None   # [(measure_name, (B,) values)]


def _combo_params(sim, cfgs, combo):
    """One unbatched params pytree with every .STEP card's value bound."""
    from ..analysis.sweep import find_source
    from ..netlist.circuit import KIND_V
    from ..netlist.parser import parse_netlist_text
    from ..ir.lower import lower
    overrides = {cfg.name: float(v) for cfg, v in zip(cfgs, combo)
                 if cfg.kind == "param"}
    if overrides:
        if sim.netlist_text is None:
            raise ValueError(".STEP PARAM needs the original netlist text "
                             "(construct via from_file/from_text)")
        ckt2, _ = parse_netlist_text(sim.netlist_text,
                                     param_overrides=overrides)
        ckt2.assign_equation_indices()
        p = dict(lower(ckt2, dtype=sim.opts.dtype).params)
        if "vt_thermal" in sim.params:
            p["vt_thermal"] = jnp.asarray(sim.params["vt_thermal"])
            p["temp_delta_c"] = jnp.asarray(sim.params["temp_delta_c"])
            from ..utils.temp import has_is_temp, apply_is_temp
            if has_is_temp(p) and not any(c.kind == "temp" for c in cfgs):
                # apply the .TEMP card's IS(T); when a .STEP TEMP is also
                # present, the temp branch below does the (re)scaling
                p = apply_is_temp(p)
    else:
        p = dict(sim.params)
    k_b, q_e = 1.380649e-23, 1.602176634e-19
    for cfg, v in zip(cfgs, combo):
        if cfg.kind == "source":
            kind, idx = find_source(sim.circuit, cfg.name)
            key = "vs_dc" if kind == KIND_V else "is_dc"
            p[key] = jnp.asarray(p[key]).at[idx].set(float(v))
        elif cfg.kind == "temp":
            p["vt_thermal"] = jnp.asarray(
                k_b * (273.15 + float(v)) / q_e, sim.engine.dtype)
            p["temp_delta_c"] = jnp.asarray(float(v) - 27.0,
                                            sim.engine.dtype)
            from ..utils.temp import has_is_temp, apply_is_temp
            if has_is_temp(p):
                # rescale from NOMINAL saturation currents — p's may
                # already carry a .TEMP-card scaling (no double-scaling)
                if not overrides:
                    p["dio_is"] = jnp.asarray(
                        sim.lowered.params["dio_is"], sim.engine.dtype)
                    p["bjt_is"] = jnp.asarray(
                        sim.lowered.params["bjt_is"], sim.engine.dtype)
                p = apply_is_temp(p)
    return p


def run_step(sim, cfgs, save_xs: bool = True) -> StepResult:
    """Execute the .STEP card(s) over the netlist's primary analysis
    (.TRAN if present, else the DC operating point).  Several cards form
    a cartesian grid — still ONE vmapped batch over the flattened grid."""
    import itertools
    from ..parallel.montecarlo import batched_dc, batched_transient
    from .measure import run_measures
    if not isinstance(cfgs, (list, tuple)):
        cfgs = [cfgs]
    combos = list(itertools.product(*[cfg.values for cfg in cfgs]))
    plist = [_combo_params(sim, cfgs, combo) for combo in combos]
    bparams = jax.tree.map(lambda *xs: jnp.stack(xs), *plist)
    values = ([c[0] for c in combos] if len(cfgs) == 1
              else combos)
    name = ",".join(cfg.name for cfg in cfgs)
    kind = ",".join(cfg.kind for cfg in cfgs)
    tran = sim.config.tran
    if tran.enabled:
        tran_measures = [m for m in sim.config.measures
                         if m.analysis == "tran"]
        if not save_xs and tran_measures:
            # waveform-free sweep: measures evaluate as streaming
            # accumulators inside the scan (analysis/measure_stream.py)
            from ..parallel.montecarlo import batched_transient_measures
            res, vals = batched_transient_measures(
                sim.engine, bparams, tran.tstep, tran.tstop,
                tran_measures, sim.topo,
                bindings=sim.config.param_values)
            measures = [(m.name, np.asarray(vals[m.name]))
                        for m in tran_measures]
            return StepResult(name=name, kind=kind, values=values,
                              analysis="tran", result=res,
                              measures=measures)
        res = batched_transient(sim.engine, bparams, tran.tstep, tran.tstop,
                                save_xs=save_xs)
        measures = None
        if save_xs and sim.config.measures:
            per_step = []
            xs = np.asarray(res.xs)
            times = np.asarray(res.times)
            t_rows = times[0] if times.ndim == 2 else times
            for b in range(len(values)):
                per_step.append(run_measures(
                    sim.config.measures, sim.topo, t_rows, xs[b],
                    bindings=sim.config.param_values))
            if per_step:
                measures = [(nm, np.array([row[i][1] for row in per_step]))
                            for i, (nm, _) in enumerate(per_step[0])]
        return StepResult(name=name, kind=kind, values=values,
                          analysis="tran", result=res, measures=measures)
    hb = sim.config.hb
    if hb.enabled and not hb.extra_tones:
        # .STEP × .hb: every step point's periodic steady state solves as
        # one batched HB program (hb.harmonic_balance_batched)
        from .hb import harmonic_balance_batched
        res = harmonic_balance_batched(sim.engine, bparams, hb.f0,
                                       n_harm=hb.n_harm or 8)
        return StepResult(name=name, kind=kind, values=values,
                          analysis="hb", result=res)
    xs = batched_dc(sim.engine, bparams)
    return StepResult(name=name, kind=kind, values=values,
                      analysis="op", result=xs)


def write_step_csv(path: str, topo, sres: StepResult) -> None:
    """One row per step point.  Columns: the stepped value(s) (one column
    per .STEP card), then either the .MEASURE results (transient steps)
    or every node voltage / branch current (operating-point steps), %.9e
    like the reference CSV."""
    import numpy as np
    name_cols = sres.name.split(",")

    def val_cols(val):
        return list(val) if isinstance(val, tuple) else [val]

    with open(path, "w") as f:
        if sres.analysis == "tran" and sres.measures is not None:
            f.write(",".join(name_cols + [nm for nm, _ in sres.measures])
                    + "\n")
            cols = [np.asarray(v) for _, v in sres.measures]
            for b, val in enumerate(sres.values):
                row = val_cols(val) + [c[b] for c in cols]
                f.write(",".join(f"{v:.9e}" for v in row) + "\n")
            return
        if sres.analysis == "hb":
            # per step point: fundamental magnitude + THD of every node
            spec = np.abs(np.asarray(sres.result.spectrum))  # (B, H+1, N)
            eqs = np.asarray(topo.volt_col_eqs, int)
            names = list(topo.volt_col_names)
            fund = spec[:, 1, :][:, eqs]
            thd = (np.sqrt((spec[:, 2:, :][:, :, eqs] ** 2).sum(axis=1))
                   / np.maximum(fund, 1e-30))
            hdr = ([f"VM1({n})" for n in names]
                   + [f"THD({n})" for n in names])
            f.write(",".join(name_cols + hdr) + "\n")
            for b, val in enumerate(sres.values):
                row = val_cols(val) + list(fund[b]) + list(thd[b])
                f.write(",".join(f"{v:.9e}" for v in row) + "\n")
            return
        if sres.analysis == "tran":
            xs = np.asarray(sres.result.x_final)
        else:
            xs = np.asarray(sres.result)
        from ..io.csvout import format_header
        hdr = format_header(topo).split(",")
        f.write(",".join(name_cols + hdr[1:]) + "\n")
        col_eqs = np.concatenate([topo.volt_col_eqs,
                                  topo.branch_col_eqs]).astype(int)
        for b, val in enumerate(sres.values):
            row = val_cols(val) + list(xs[b][col_eqs])
            f.write(",".join(f"{v:.9e}" for v in row) + "\n")
