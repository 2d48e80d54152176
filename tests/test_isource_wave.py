"""Waveforms on current sources (extension; the reference parses only
`I name np nm [DC] v`, parser.cpp:358-379)."""

import math

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator
from circuitsimulator_tpu.netlist.parser import parse_netlist_text


def test_sin_current_into_resistor():
    sim = Simulator.from_text(
        "I1 0 a SIN 0 1m 1e6\nR1 a 0 1k\n.TRAN 1n 2u\n")
    res = sim.transient()
    t = np.asarray(res.times)
    v = np.asarray(res.xs)[:, 0]
    expect = 1.0 * np.sin(2 * np.pi * 1e6 * t)   # 1mA * 1k
    np.testing.assert_allclose(v, expect, atol=2e-3)


def test_pulse_current_rc():
    # current step into RC: v = I*R*(1-exp(-t/tau))
    sim = Simulator.from_text(
        "I1 0 a PULSE(0 1m 0 1n 1n 1 2)\nR1 a 0 1k\nC1 a 0 1n\n"
        ".TRAN 10n 10u\n")
    res = sim.transient()
    v = np.asarray(res.xs)[:, 0]
    # ~1e-3 short of 1.0: damped-Newton step-size stopping rule (reference
    # parity), on top of 1-exp(-10)
    assert v[-1] == pytest.approx(1.0, abs=3e-3)
    t63 = np.asarray(res.times)[np.searchsorted(v, 0.632)]
    assert t63 == pytest.approx(1e-6, rel=5e-2)


def test_pwl_current():
    sim = Simulator.from_text(
        "I1 0 a PWL(0 0 1u 1m 2u 0)\nR1 a 0 1k\n.TRAN 10n 2u\n")
    res = sim.transient()
    t = np.asarray(res.times)
    v = np.asarray(res.xs)[:, 0]
    np.testing.assert_allclose(v, np.interp(t, [0, 1e-6, 2e-6], [0, 1, 0]),
                               atol=2e-3)


def test_sin_dc_op_includes_v0_offset():
    # evalDC adds the sine's v0 offset (sim.hpp:152-158) — same rule for I
    sim = Simulator.from_text("I1 0 a SIN 2m 1m 1e6\nR1 a 0 1k\n.op\n")
    x = sim.dc()
    assert float(x[0]) == pytest.approx(2.0, rel=1e-9)


def test_isource_wave_native_parity():
    from circuitsimulator_tpu import native
    if not native.available():
        pytest.skip("native frontend not built")
    import dataclasses
    text = ("I1 0 a SIN 0 1m 1e6 1n 0.2\nI2 a 0 PULSE(0 1m 1n 1n 1n 5n 10n)\n"
            "I3 a 0 PWL(0 0 1u 1m)\nI4 a 0 DC 1m AC 0.5 45\nR1 a 0 1k\n"
            ".TRAN 1n 10n\n")
    ckt_py, _ = parse_netlist_text(text)
    ckt_nat, _ = native.parse_netlist_text_native(text)
    ckt_py.assign_equation_indices()
    ckt_nat.assign_equation_indices()
    for a, b in zip(ckt_nat.elements, ckt_py.elements):
        assert dataclasses.asdict(a) == dataclasses.asdict(b), (a, b)
