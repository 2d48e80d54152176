"""DC operating point: analytic linear circuits + golden parity with the
reference on the bundled netlists (SURVEY.md §4 items 1-3)."""

import numpy as np
import pytest

from circuitsimulator_tpu.api import Simulator
from circuitsimulator_tpu.io.table import parse_dc_table


def test_divider():
    sim = Simulator.from_text("V1 1 0 10\nR1 1 2 1k\nR2 2 0 3k\n.op\n")
    x = np.asarray(sim.dc())
    # V(1)=10, V(2)=7.5, I(V1)=-10/4k
    np.testing.assert_allclose(x, [10.0, 7.5, -2.5e-3], rtol=1e-12)


def test_current_source_into_resistor():
    sim = Simulator.from_text("I1 0 1 2m\nR1 1 0 1k\n.op\n")
    x = np.asarray(sim.dc())
    np.testing.assert_allclose(x, [2.0], rtol=1e-12)


def test_inductor_dc_short():
    sim = Simulator.from_text("V1 1 0 1\nL1 1 2 1u\nR1 2 0 2\n.op\n")
    x = np.asarray(sim.dc())
    # V(1)=1, V(2)=1, I(V1)=-0.5, I(L1)=+0.5
    np.testing.assert_allclose(x, [1.0, 1.0, -0.5, 0.5], rtol=1e-12)


def test_capacitor_dc_open():
    sim = Simulator.from_text("V1 1 0 1\nR1 1 2 1k\nC1 2 0 1u\nR2 2 0 1k\n.op\n")
    x = np.asarray(sim.dc())
    np.testing.assert_allclose(x[:2], [1.0, 0.5], rtol=1e-12)


@pytest.mark.parametrize("netlist", ["buffer", "dbmixer"])
def test_dc_matches_reference_goldens(netlist, goldens_dir):
    sim = Simulator.from_file(f"tests/netlists/{netlist}.sp")
    x = np.asarray(sim.dc())
    ref_volts, ref_amps = parse_dc_table(
        (goldens_dir / f"{netlist}_stdout.txt").read_text())
    mine_volts, mine_amps = parse_dc_table(sim.dc_report(x))
    assert set(ref_volts) == set(mine_volts)
    for name, v in ref_volts.items():
        # reference prints %.6f — compare at that resolution
        assert mine_volts[name] == pytest.approx(v, abs=1.5e-6), f"V({name})"
    for name, v in ref_amps.items():
        assert mine_amps[name] == pytest.approx(v, abs=1.5e-6), f"I({name})"


def test_dc_report_format_matches_reference_stdout(goldens_dir):
    """Byte-level format parity of the DC tables (main.cpp:62-91)."""
    sim = Simulator.from_file("tests/netlists/buffer.sp")
    x = np.asarray(sim.dc())
    report = sim.dc_report(x)
    ref = (goldens_dir / "buffer_stdout.txt").read_text()
    ref_v_lines = [l for l in ref.splitlines() if l.startswith("V(")]
    my_v_lines = [l for l in report.splitlines() if l.startswith("V(")]
    assert my_v_lines == ref_v_lines
    ref_i_lines = [l for l in ref.splitlines() if l.startswith("I(")]
    my_i_lines = [l for l in report.splitlines() if l.startswith("I(")]
    assert my_i_lines == ref_i_lines


def test_circuit_summary_format(goldens_dir):
    sim = Simulator.from_file("tests/netlists/dbmixer.sp")
    ref = (goldens_dir / "dbmixer_stdout.txt").read_text()
    for line in sim.summary().splitlines():
        if line.strip():
            assert line in ref, line


def test_vmapped_dc_equals_single():
    import jax
    import jax.numpy as jnp
    sim = Simulator.from_file("tests/netlists/buffer.sp")
    x1 = np.asarray(sim.dc())
    B = 4
    bparams = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), sim.params)
    from circuitsimulator_tpu.analysis.dc import dc_operating_point
    xb = np.asarray(jax.vmap(lambda p: dc_operating_point(sim.engine, p))(bparams))
    assert xb.shape == (B, len(x1))
    for i in range(B):
        np.testing.assert_allclose(xb[i], x1, rtol=0, atol=0)


def test_nonstrict_mode_converges_to_same_op_point():
    """strict_reference_mode=False uses the adaptive damping the reference's
    ConvController apparently intended (its alpha is otherwise pinned to
    0.35 by the re-clamp bug, dcanalysis.cpp:274); the converged operating
    point must agree to solver tolerance."""
    import jax.numpy as jnp
    from circuitsimulator_tpu.utils.options import DEFAULT_OPTIONS
    sane = DEFAULT_OPTIONS.replace(dtype=jnp.float64,
                                   strict_reference_mode=False)
    for name in ("buffer", "dbmixer"):
        s1 = Simulator.from_file(f"tests/netlists/{name}.sp")
        s2 = Simulator.from_file(f"tests/netlists/{name}.sp", opts=sane)
        np.testing.assert_allclose(np.asarray(s2.dc()), np.asarray(s1.dc()),
                                   atol=1e-8)
