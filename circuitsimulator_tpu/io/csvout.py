"""Transient CSV writer, byte-compatible with the reference's schema
(src/tanalisis.cpp:182-231):

- header: ``time,V(<node>)...,I(<element>)...`` — node voltages for eq>=0 in
  node-creation order, then branch currents for V sources and inductors in
  element order;
- every value (including time) formatted as C++
  ``std::scientific << std::setprecision(9)`` == ``%.9e``;
- rows with t < tstart are suppressed (including the t=0 row).
"""

from __future__ import annotations

import numpy as np

from ..ir.lower import Topology


def format_header(topo: Topology) -> str:
    cols = ["time"]
    cols += [f"V({n})" for n in topo.volt_col_names]
    cols += [f"I({n})" for n in topo.branch_col_names]
    return ",".join(cols)


def write_transient_csv(path: str, topo: Topology, times, xs,
                        tstart: float = 0.0) -> None:
    times = np.asarray(times)
    xs = np.asarray(xs)
    col_eqs = np.concatenate([topo.volt_col_eqs, topo.branch_col_eqs]).astype(int)
    data = xs[:, col_eqs]
    with open(path, "w") as f:
        f.write(format_header(topo) + "\n")
        for t, row in zip(times, data):
            if t < tstart:
                continue
            f.write(f"{t:.9e}," + ",".join(f"{v:.9e}" for v in row) + "\n")


def read_csv(path: str):
    """Read a transient CSV -> (header list, (rows, cols) float array)."""
    with open(path) as f:
        header = f.readline().strip().split(",")
        data = np.loadtxt(f, delimiter=",", ndmin=2)
    return header, data
