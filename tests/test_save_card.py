""".SAVE/.PROBE output-selection cards (extension; .PRINT aliases with an
optional analysis keyword)."""

import pytest

from circuitsimulator_tpu.cli import main
from circuitsimulator_tpu.netlist.parser import parse_netlist_text, AN_NONE


DECK = """* save card
V1 in 0 SIN 0 1 1k
R1 in out 1k
C1 out 0 1u
.SAVE V(out) I(V1)
.TRAN 1e-4 1e-3
.end
"""


def test_save_parses_analysis_less_probes():
    _, sim = parse_netlist_text(DECK)
    pc = sim.print_commands[0]
    assert pc.analysis == AN_NONE
    kinds = [(p.kind, p.node1 or p.ele_name) for p in pc.probes]
    assert kinds == [("nv", "out"), ("br", "V1")]


def test_probe_with_analysis_keyword():
    _, sim = parse_netlist_text(".PROBE TRAN V(a)\nR1 a 0 1k\n.op\n")
    assert sim.print_commands[0].analysis == "tran"


def test_save_selects_csv_columns(tmp_path):
    deck = tmp_path / "s.sp"
    deck.write_text(DECK)
    out = tmp_path / "t.csv"
    rc = main([str(deck), str(out), "--probes-only"])
    assert rc == 0
    header = out.read_text().splitlines()[0]
    assert header == "time,V(out),I(V1)"


def test_native_parity_save():
    from circuitsimulator_tpu import native
    if not native.available():
        pytest.skip("native frontend not built")
    _, sim_py = parse_netlist_text(DECK)
    _, sim_nat = native.parse_netlist_text_native(DECK)
    py_probes = [(pc.analysis, p.kind, p.node1 or p.ele_name)
                 for pc in sim_py.print_commands for p in pc.probes]
    nat_probes = [(pc.analysis, p.kind, p.node1 or p.ele_name)
                  for pc in sim_nat.print_commands for p in pc.probes]
    assert py_probes == nat_probes
