"""URC distributed RC lines (U element, text-expansion extension)."""

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator
from circuitsimulator_tpu.netlist.urc import expand_urc


DECK = """* rc interconnect
.MODEL wire URC RPERL=1k CPERL=1n
V1 in 0 PULSE(0 1 0 1n 1n 1 1)
U1 in out 0 wire L=1 N=8
Rload out 0 1e9
.TRAN 2e-5 5e-3
.MEASURE TRAN t50 WHEN V(out)=0.5 RISE=1
.end
"""


def test_expansion_structure():
    out = expand_urc(DECK)
    # 8 series resistors + 9 capacitors, model card commented out
    assert out.count("RU1.") == 8
    assert out.count("CU1.") == 9
    assert "* .MODEL wire URC" in out
    # total R = 1k, each lump 125
    assert "1.250000000e+02" in out


def test_distributed_delay_matches_elmore():
    # distributed RC line: 50% step-response delay ~ 0.38*R*C (N large);
    # R = 1k, C = 1n -> t50 ~ 0.38 us... with R*C = 1e-6 s
    sim = Simulator.from_text(DECK.replace("N=8", "N=24").replace(
        ".TRAN 2e-5 5e-3", ".TRAN 2e-8 5e-6"))
    res = sim.transient()
    vals = dict(sim.measure(res))
    t50 = float(vals["t50"])
    assert t50 == pytest.approx(0.38e-6, rel=0.15)


def test_lump_count_convergence():
    # more lumps converge: N=4 vs N=32 delays within ~10%
    def t50(n):
        sim = Simulator.from_text(
            DECK.replace("N=8", f"N={n}").replace(
                ".TRAN 2e-5 5e-3", ".TRAN 2e-8 5e-6"))
        res = sim.transient()
        return float(dict(sim.measure(res))["t50"])
    assert t50(4) == pytest.approx(t50(32), rel=0.12)


def test_urc_both_frontends_identical():
    from circuitsimulator_tpu import native
    if not native.available():
        pytest.skip("native frontend not built")
    import dataclasses
    s_py = Simulator.from_text(DECK)
    s_nat = Simulator.from_text(DECK, frontend="native")
    for a, b in zip(s_nat.circuit.elements, s_py.circuit.elements):
        assert dataclasses.asdict(a) == dataclasses.asdict(b), (a, b)
    names = [e.name for e in s_py.circuit.elements]
    assert "RU1.1" in names and "CU1.0" in names


def test_unknown_model_warns(capsys):
    out = expand_urc(".MODEL w URC\nU1 a b 0 nosuch L=1\n")
    assert "unknown model" in capsys.readouterr().err
    assert "U1 a b 0 nosuch L=1" in out
