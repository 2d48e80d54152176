"""Synthetic stress-circuit generators (BASELINE.md config #4: 10k-node RC
ladder + diode chain, exercising large-N MNA assembly and the banded solve
path)."""

from __future__ import annotations


def rc_ladder_netlist(n_nodes: int,
                      r: float = 100.0,
                      c: float = 1e-12,
                      diode_every: int = 10,
                      i_sat: float = 1e-14,
                      vdrive: float = 0.5,
                      drive: str = "pulse",
                      tstep: float = 1e-11,
                      tstop: float = 1e-9) -> str:
    """An n-node RC ladder driven from node 1, with a diode to ground every
    `diode_every`-th node.  Node names are 1..n in chain order, so the MNA
    pattern is bordered-tridiagonal (see ops/banded.py)."""
    lines = [f"* synthetic RC ladder, {n_nodes} nodes"]
    if drive == "pulse":
        lines.append(f"V1 1 0 PULSE(0 {vdrive} 0 {tstep} {tstep} {tstop} 0)")
    elif drive == "sin":
        lines.append(f"V1 1 0 SIN 0 {vdrive} {1.0 / (200 * tstep)}")
    else:
        lines.append(f"V1 1 0 DC {vdrive}")
    for i in range(1, n_nodes):
        lines.append(f"R{i} {i} {i + 1} {r}")
    for i in range(1, n_nodes + 1):
        lines.append(f"C{i} {i} 0 {c}")
    for i in range(diode_every, n_nodes + 1, diode_every):
        lines.append(f"D{i} {i} 0 IS={i_sat} N=1")
    lines.append(f".TRAN {tstep} {tstop}")
    return "\n".join(lines) + "\n"
