"""DC result table formatting, matching the reference CLI printout
(src/main.cpp:36-93): circuit summary, node-voltage table (fixed, 6 decimal
places, ground rows marked [GND]) and branch-current table for V sources and
inductors."""

from __future__ import annotations

import numpy as np

from ..ir.lower import Topology
from ..netlist.circuit import KIND_V


def circuit_summary(topo: Topology) -> str:
    lines = [
        "",
        "==== Circuit summary ====",
        f"Node count   : {topo.n_nodes}",
        f"Element count: {topo.n_elements}",
        (f"Unknowns     : {topo.n_unknowns}  "
         f"(nodeEq={topo.n_node_eq}, "
         f"branchEq={topo.n_unknowns - topo.n_node_eq})"),
    ]
    return "\n".join(lines)


def dc_table(topo: Topology, x) -> str:
    x = np.asarray(x)
    lines = ["", "==== DC node voltages ===="]
    for name, eq in topo.node_table:
        if eq >= 0:
            lines.append(f"V({name}) = {x[eq]:.6f} V   [eqIndex={eq}]")
        else:
            lines.append(f"V({name}) = 0.000000 V   [GND]")
    lines.append("")
    lines.append("==== DC branch currents (voltage sources / inductors) ====")
    for kind, name, np_name, nm_name, eq in topo.branch_table:
        cur = x[eq] if 0 <= eq < len(x) else 0.0
        if kind == KIND_V:
            lines.append(f"I({name}, +{np_name} -> -{nm_name}) = {cur:.6f} A"
                         f"   [branchEq={eq}]")
        else:
            lines.append(f"I({name}, {np_name} -> {nm_name}) = {cur:.6f} A"
                         f"   [branchEq={eq}]")
    return "\n".join(lines)


def parse_dc_table(text: str):
    """Parse 'V(name) = x V' / 'I(name, ...) = x A' lines from a reference
    stdout dump -> ({node: volts}, {element: amps}).  Used by the golden
    tests."""
    volts, amps = {}, {}
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("V(") and " = " in line:
            name = line[2:line.index(")")]
            val = float(line.split(" = ")[1].split()[0])
            volts[name] = val
        elif line.startswith("I(") and " = " in line:
            name = line[2:line.index(",")] if "," in line else line[2:line.index(")")]
            val = float(line.split(" = ")[1].split()[0])
            amps[name] = val
    return volts, amps
