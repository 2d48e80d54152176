"""Diode junction capacitance (CJO, extension): rides the static
cap-like class like the MOS junction caps."""

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator
from circuitsimulator_tpu.netlist.parser import parse_netlist_text


def node_eq(sim, name):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index


def test_reverse_biased_diode_is_rc():
    # reverse-biased diode conducts ~nothing; its CJO forms an RC with R1:
    # step response tau = R*CJO
    sim = Simulator.from_text(
        "V1 in 0 PULSE(0 -1 0 1n 1n 1 2)\nR1 in a 1k\n"
        "D1 a 0 IS=1e-14 CJO=1n\n.TRAN 10n 5u\n")
    res = sim.transient()
    t = np.asarray(res.times)
    v = np.asarray(res.xs)[:, node_eq(sim, "a")]
    expect = -(1 - np.exp(-t / 1e-6))
    np.testing.assert_allclose(v, expect, atol=8e-3)


def test_cjo_in_ac():
    # reverse-biased: AC sees R1 + CJO lowpass, f3db = 1/(2 pi R CJO)
    sim = Simulator.from_text(
        "V1 in 0 DC -5 AC 1\nR1 in a 1k\nD1 a 0 IS=1e-14 CJO=1n\n"
        ".AC lin 1 159.155k 159.155k\n")
    acres = sim.ac()
    vmag = abs(np.asarray(acres.xs)[0, node_eq(sim, "a")])
    assert vmag == pytest.approx(1 / np.sqrt(2), rel=1e-3)


def test_cjo_native_parity():
    from circuitsimulator_tpu import native
    if not native.available():
        pytest.skip("native frontend not built")
    import dataclasses
    text = "V1 a 0 1\nD1 a 0 IS=2e-15 N=1.2 CJO=3p\nR1 a 0 1k\n.op\n"
    ckt_py, _ = parse_netlist_text(text)
    ckt_nat, _ = native.parse_netlist_text_native(text)
    ckt_py.assign_equation_indices()
    ckt_nat.assign_equation_indices()
    for a, b in zip(ckt_nat.elements, ckt_py.elements):
        assert dataclasses.asdict(a) == dataclasses.asdict(b), (a, b)
    d = next(e for e in ckt_py.elements if e.name == "D1")
    assert d.cj0 == pytest.approx(3e-12)
