"""Degenerate-circuit robustness: empty systems, singular matrices, and
other corners the reference handles by warning and carrying on."""

import numpy as np
import pytest

from circuitsimulator_tpu.api import Simulator


def test_no_unknowns():
    # everything at ground: N = 0 (reference prints "no unknowns" and
    # returns an empty vector)
    sim = Simulator.from_text("R1 0 gnd 1k\n.op\n")
    assert sim.topo.n_unknowns == 0
    x = np.asarray(sim.dc())
    assert x.shape == (0,)


def test_floating_node_singular_dc():
    # node 2 only reachable through a capacitor: singular DC matrix ->
    # reference's LU zero-pivot path returns the zero vector for that row
    sim = Simulator.from_text("V1 1 0 2\nR1 1 0 1k\nC1 1 2 1n\n.op\n")
    x = np.asarray(sim.dc())
    assert x.shape == (3,)
    # the whole solve collapses to zeros on decomposition failure
    # (solver.hpp:94-97) — matching the reference exactly
    np.testing.assert_array_equal(x, np.zeros(3))


def test_vsource_loop_singular():
    # two parallel V sources with different values: inconsistent ->
    # singular; must not crash
    sim = Simulator.from_text("V1 1 0 1\nV2 1 0 2\nR1 1 0 1k\n.op\n")
    x = np.asarray(sim.dc())
    assert np.all(np.isfinite(x))


def test_ground_aliases():
    # "0" and "gnd" are both ground *by name* but are distinct node table
    # entries (utils.hpp:76-79); both rows print as GND
    sim = Simulator.from_text("V1 1 gnd 2\nR1 1 0 1k\n.op\n")
    assert sim.topo.n_unknowns == 2
    x = np.asarray(sim.dc())
    assert x[0] == pytest.approx(2.0)
    report = sim.dc_report(x)
    assert report.count("[GND]") == 2


def test_single_resistor_no_sources():
    sim = Simulator.from_text("R1 1 0 1k\n.op\n")
    x = np.asarray(sim.dc())
    np.testing.assert_array_equal(x, np.zeros(1))


def test_transient_no_reactive_elements():
    # purely resistive transient: every step solves the same algebraic
    # system driven by the source value
    sim = Simulator.from_text("V1 1 0 SIN 0 1 1e6\nR1 1 2 1k\nR2 2 0 1k\n"
                              ".TRAN 1e-7 1e-6\n")
    res = sim.transient()
    xs = np.asarray(res.xs)
    ts = np.asarray(res.times)
    # divider ratio includes the transient gmin at node 2
    ratio = 1e-3 / (2e-3 + 1e-6)
    np.testing.assert_allclose(xs[:, 1],
                               np.sin(2 * np.pi * 1e6 * ts) * ratio,
                               atol=5e-6)


def test_mos_all_terminals_grounded():
    sim = Simulator.from_text(
        ".MODEL 2 VT 0.5 MU 1e-2 COX 1e-3\nM1 0 0 0 n 1e-6 1e-6 2\n"
        "V1 1 0 1\nR1 1 0 1k\n.op\n")
    x = np.asarray(sim.dc())
    assert x[0] == pytest.approx(1.0)


def test_zero_step_tran_rejected():
    sim = Simulator.from_text("V1 1 0 1\nR1 1 0 1\n.TRAN 0 1e-6\n")
    # the parser accepts the card; the engine rejects it like the reference
    # ("tstep and tstop must be > 0", tanalisis.cpp:94-97)
    with pytest.raises(ValueError):
        sim.transient()


def test_duplicate_element_names_tolerated():
    # the reference never checks for duplicate names; both elements stamp
    sim = Simulator.from_text("R1 1 0 2\nR1 1 0 2\nV1 1 0 1\n.op\n")
    x = np.asarray(sim.dc())
    # two 2-ohm resistors in parallel -> 1 A total through the source
    assert x[-1] == pytest.approx(-1.0, rel=1e-9)
