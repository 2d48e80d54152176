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
    values: Any   # (S,) swept DC values
    xs: Any       # (S, N) operating points


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
             values) -> DCSweepResult:
    kind, idx = find_source(circuit, source_name)
    key = "vs_dc" if kind == KIND_V else "is_dc"
    values = jnp.asarray(values, engine.dtype)

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
    with open(path, "w") as f:
        f.write(f"{result.source}," + ",".join(cols) + "\n")
        for v, row in zip(values, xs[:, col_eqs]):
            f.write(f"{v:.9e}," + ",".join(f"{x:.9e}" for x in row) + "\n")
