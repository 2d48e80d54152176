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


def probe_selection(topo: Topology, print_commands, analysis=None):
    """Resolve .PLOTNV/.PLOTNC/.PRINT probes to CSV columns.

    Returns [(label, spec)] where spec is an eq index, or a (eq_a, eq_b)
    pair for differential V(a,b) probes.  Unresolvable probes are skipped
    (consistent with the reference's attitude to its dead probe config).
    `analysis` (an AN_* string) keeps only .PRINT commands for that
    analysis plus analysis-less .PLOTNV/.PLOTNC probes."""
    v_by_name = dict(zip(topo.volt_col_names, topo.volt_col_eqs))
    i_by_name = dict(zip(topo.branch_col_names, topo.branch_col_eqs))
    sel = []
    seen = set()

    def add(label, spec):
        if label not in seen:
            seen.add(label)
            sel.append((label, spec))

    def veq(name):
        if name in v_by_name:
            return int(v_by_name[name])
        low = name.lower()
        return -1 if low in ("0", "gnd") else None

    for pc in print_commands:
        if analysis is not None and pc.analysis not in (analysis, "none", ""):
            continue
        for p in pc.probes:
            if p.kind == "nv":
                eq = veq(p.node1)
                if eq is not None:
                    add(f"V({p.node1})", eq)
            elif p.kind == "dv":
                ea, eb = veq(p.node1), veq(p.node2)
                if ea is not None and eb is not None:
                    add(f"V({p.node1})-V({p.node2})", (ea, eb))  # comma-free CSV label
            elif p.kind == "br":
                if p.ele_name in i_by_name:
                    add(f"I({p.ele_name})", int(i_by_name[p.ele_name]))
    return sel


def write_transient_csv(path: str, topo: Topology, times, xs,
                        tstart: float = 0.0, selection=None) -> None:
    """Reference-schema CSV; `selection` (from probe_selection) restricts
    and re-orders columns (extension — the reference always writes all)."""
    times = np.asarray(times)
    xs = np.asarray(xs)
    xs0 = np.concatenate([xs, np.zeros_like(xs[:, :1])], axis=1)  # eq -1 -> 0
    if selection is None:
        header = format_header(topo)
        col_eqs = np.concatenate([topo.volt_col_eqs,
                                  topo.branch_col_eqs]).astype(int)
        data = xs[:, col_eqs]
    else:
        header = ",".join(["time"] + [lbl for lbl, _ in selection])
        cols = []
        for _, spec in selection:
            if isinstance(spec, tuple):
                cols.append(xs0[:, spec[0]] - xs0[:, spec[1]])
            else:
                cols.append(xs0[:, spec])
        data = np.stack(cols, axis=1) if cols else np.zeros((len(xs), 0))
    keep = times >= tstart
    out = np.column_stack([times[keep], data[keep]])
    with open(path, "w") as f:
        f.write(header + "\n")
        # %.9e matches C++ scientific<<setprecision(9) byte-for-byte
        np.savetxt(f, out, fmt="%.9e", delimiter=",")


def read_csv(path: str):
    """Read a transient CSV -> (header list, (rows, cols) float array)."""
    with open(path) as f:
        header = f.readline().strip().split(",")
        data = np.loadtxt(f, delimiter=",", ndmin=2)
    return header, data
