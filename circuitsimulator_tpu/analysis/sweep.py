"""DC sweep analysis (the `.DC <source> start stop step` card).

NEW WORK: the reference parses the card into `sim.dcSweeps`
(parser.cpp:476-495) but never executes it (SURVEY.md §2 "parsed -> never
executed").  Semantics implemented here: sweep the named independent
source's DC value over [start, stop] in `step` increments, solving the full
(nonlinear) operating point at every value — all sweep points vmapped into
one batched solve.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from ..netlist.circuit import KIND_V, KIND_I
from ..ops.assemble import Engine
from .dc import dc_operating_point


@dataclasses.dataclass
class DCSweepResult:
    source: str
    values: Any        # (S,) inner swept DC values (flattened grid order)
    xs: Any            # (S, N) operating points
    # nested sweep (`.DC s1 ... s2 ...`, extension): outer source name and
    # its per-row values; rows run outer-major (s2 slowest), matching the
    # classic SPICE print order.  Empty/None for single sweeps.
    source2: str = ""
    values2: Any = None


def sweep_values(start: float, stop: float, step: float) -> np.ndarray:
    if step == 0.0:
        raise ValueError(".DC step must be nonzero")
    n = int(np.floor((stop - start) / step + 1e-9)) + 1
    if n <= 0:
        raise ValueError(".DC sweep range is empty")
    return start + step * np.arange(n)


def find_source(circuit, name: str):
    """Locate an independent source by element name (exact match first, then
    case-insensitive).  Returns (kind, index within its class)."""
    for exact in (True, False):
        vi = ii = 0
        for e in circuit.elements:
            if e.kind not in (KIND_V, KIND_I):
                continue
            match = (e.name == name) if exact \
                else (e.name.lower() == name.lower())
            if match:
                return e.kind, (vi if e.kind == KIND_V else ii)
            if e.kind == KIND_V:
                vi += 1
            else:
                ii += 1
    raise KeyError(f"no independent source named {name!r}")


def dc_sweep(engine: Engine, params, circuit, source_name: str,
             values, source2: str = "", values2=None) -> DCSweepResult:
    """Batched operating-point sweep.  With `source2`/`values2` the full
    cartesian grid (outer-major) solves in ONE vmapped batch — every grid
    point is an independent Newton solve, the natural TPU shape."""
    kind, idx = find_source(circuit, source_name)
    key = "vs_dc" if kind == KIND_V else "is_dc"
    values = jnp.asarray(values, engine.dtype)

    if source2 and values2 is not None:
        kind2, idx2 = find_source(circuit, source2)
        key2 = "vs_dc" if kind2 == KIND_V else "is_dc"
        values2 = jnp.asarray(values2, engine.dtype)
        v2g, v1g = jnp.meshgrid(values2, values, indexing="ij")
        v1f, v2f = v1g.ravel(), v2g.ravel()

        def solve_point2(v1, v2):
            p2 = dict(params)
            p2[key] = params[key].at[idx].set(v1)
            p2[key2] = p2[key2].at[idx2].set(v2)
            return dc_operating_point(engine, p2)

        xs = jax.jit(jax.vmap(solve_point2))(v1f, v2f)
        return DCSweepResult(source=source_name, values=v1f, xs=xs,
                             source2=source2, values2=v2f)

    def solve_point(v):
        p2 = dict(params)
        p2[key] = params[key].at[idx].set(v)
        return dc_operating_point(engine, p2)

    xs = jax.jit(jax.vmap(solve_point))(values)
    return DCSweepResult(source=source_name, values=values, xs=xs)


def write_sweep_csv(path: str, topo, result: DCSweepResult) -> None:
    """CSV schema mirrors the transient writer with the swept value as the
    first column."""
    values = np.asarray(result.values)
    xs = np.asarray(result.xs)
    col_eqs = np.concatenate([topo.volt_col_eqs,
                              topo.branch_col_eqs]).astype(int)
    cols = [f"V({n})" for n in topo.volt_col_names]
    cols += [f"I({n})" for n in topo.branch_col_names]
    v2 = np.asarray(result.values2) if result.values2 is not None else None
    with open(path, "w") as f:
        head = f"{result.source}," + ",".join(cols)
        if v2 is not None:
            head = f"{result.source2}," + head
        f.write(head + "\n")
        for i, (v, row) in enumerate(zip(values, xs[:, col_eqs])):
            line = f"{v:.9e}," + ",".join(f"{x:.9e}" for x in row)
            if v2 is not None:
                line = f"{v2[i]:.9e}," + line
            f.write(line + "\n")
