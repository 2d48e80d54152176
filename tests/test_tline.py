"""T lossless transmission lines (extension): Branin method of
characteristics in the transient, exact phase in AC, DC short."""

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator
from circuitsimulator_tpu.netlist.parser import parse_netlist_text


def node_eq(sim, name):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index


MATCHED = """* matched 50-ohm line, TD=10ns
V1 src 0 PULSE(0 1 0 1p 1p 1 2)
Rs src in 50
T1 in 0 out 0 Z0=50 TD=10n
Rl out 0 50
.TRAN 0.1n 40n
"""


def test_matched_line_delay_and_amplitude():
    sim = Simulator.from_text(MATCHED)
    res = sim.transient()
    t = np.asarray(res.times)
    vin = np.asarray(res.xs)[:, node_eq(sim, "in")]
    vout = np.asarray(res.xs)[:, node_eq(sim, "out")]
    # launch side: matched divider -> 0.5 V immediately, stays (no echo)
    assert np.allclose(vin[(t > 1e-9) & (t < 39e-9)], 0.5, atol=2e-3)
    # far side: 0 before TD, 0.5 after (no reflection into matched load)
    assert np.allclose(vout[(t > 1e-10) & (t < 9.9e-9)], 0.0, atol=1e-6)
    assert np.allclose(vout[t > 10.2e-9], 0.5, atol=2e-3)


def test_open_line_reflection_doubles():
    net = MATCHED.replace("Rl out 0 50", "Rl out 0 1e9")
    sim = Simulator.from_text(net)
    res = sim.transient()
    t = np.asarray(res.times)
    vin = np.asarray(res.xs)[:, node_eq(sim, "in")]
    vout = np.asarray(res.xs)[:, node_eq(sim, "out")]
    # incident 0.5 arrives at TD and doubles at the open end
    assert np.allclose(vout[(t > 10.3e-9) & (t < 39e-9)], 1.0, atol=5e-3)
    # the reflection reaches the (matched) source side at 2*TD -> 1.0
    assert np.allclose(vin[(t > 1e-9) & (t < 19.8e-9)], 0.5, atol=2e-3)
    assert np.allclose(vin[t > 20.3e-9], 1.0, atol=5e-3)


def test_dc_line_is_short():
    sim = Simulator.from_text("""* dc through line
V1 a 0 DC 3
R1 a in 1k
T1 in 0 out 0 Z0=75 TD=5n
R2 out 0 2k
.op
""")
    x = sim.dc()
    # divider 1k/2k across the (transparent) line
    assert float(x[node_eq(sim, "out")]) == pytest.approx(2.0, rel=1e-9)
    assert float(x[node_eq(sim, "in")]) == pytest.approx(2.0, rel=1e-9)


def test_ac_matched_line_phase():
    net = """* ac matched line
V1 src 0 DC 0 AC 1
Rs src in 50
T1 in 0 out 0 Z0=50 TD=10n
Rl out 0 50
.AC lin 5 1e6 9e6
"""
    sim = Simulator.from_text(net)
    acres = sim.ac()
    xs = np.asarray(acres.xs)
    f = np.asarray(acres.freqs)
    vin = xs[:, node_eq(sim, "in")]
    vout = xs[:, node_eq(sim, "out")]
    np.testing.assert_allclose(np.abs(vin), 0.5, rtol=1e-9)
    np.testing.assert_allclose(np.abs(vout), 0.5, rtol=1e-9)
    # exact delay: vout = vin * e^{-j w TD}
    ratio = vout / vin
    expect = np.exp(-1j * 2 * np.pi * f * 10e-9)
    np.testing.assert_allclose(ratio, expect, rtol=1e-9)


def test_ac_quarter_wave_transformer():
    # at f0 = 1/(4 TD) a Z0 line transforms RL: Zin = Z0^2/RL
    # Z0=100, RL=50 -> Zin=200; with Rs=200 the input divider gives 0.5
    net = """* quarter wave
V1 src 0 DC 0 AC 1
Rs src in 200
T1 in 0 out 0 Z0=100 TD=2.5n
Rl out 0 50
.AC lin 1 1e8 1e8
"""
    sim = Simulator.from_text(net)
    acres = sim.ac()
    xs = np.asarray(acres.xs)
    vin = xs[0, node_eq(sim, "in")]
    assert abs(vin) == pytest.approx(0.5, rel=1e-9)


def test_tline_shooting_steady_state():
    # periodic drive through a matched line: shooting must converge and
    # reproduce the delayed sine
    net = """* pss with line
V1 src 0 SIN 0 1 1e8
Rs src in 50
T1 in 0 out 0 Z0=50 TD=2.5n
Rl out 0 50
.hb 1e8 5
"""
    sim = Simulator.from_text(net)
    pss = sim.steady_state(steps_per_period=128, warmup_periods=4)
    assert bool(pss.converged)
    xs = np.asarray(pss.xs)
    t = np.asarray(pss.times)
    vout = xs[:, node_eq(sim, "out")]
    expect = 0.5 * np.sin(2 * np.pi * 1e8 * (t - 2.5e-9))
    np.testing.assert_allclose(vout, expect, atol=2e-2)


def test_tline_native_frontend_parity():
    from circuitsimulator_tpu import native
    if not native.available():
        pytest.skip("native frontend not built")
    import dataclasses
    text = ("V1 a 0 1\nT1 a 0 b 0 Z0=75 TD=3n\n"
            "T2 b 0 c 0 Z0=50 F=1e9 NL=0.5\nRl c 0 50\n.op\n")
    ckt_py, _ = parse_netlist_text(text)
    ckt_nat, _ = native.parse_netlist_text_native(text)
    ckt_py.assign_equation_indices()
    ckt_nat.assign_equation_indices()
    assert len(ckt_nat.elements) == len(ckt_py.elements) == 4
    for a, b in zip(ckt_nat.elements, ckt_py.elements):
        assert dataclasses.asdict(a) == dataclasses.asdict(b), (a, b)


def test_tline_csv_columns():
    sim = Simulator.from_text(MATCHED)
    assert "T1.1" in sim.topo.branch_col_names
    assert "T1.2" in sim.topo.branch_col_names
