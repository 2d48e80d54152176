"""EXP and SFFM source waveforms (extensions; standard SPICE shapes)."""

import math

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator
from circuitsimulator_tpu.netlist.circuit import (
    Waveform, WAVE_EXP, WAVE_SFFM, eval_waveform)
from circuitsimulator_tpu.netlist.parser import parse_netlist_text


def node_eq(sim, name):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index


EXP_DECK = """* exp source
V1 in 0 EXP(0 5 1e-6 2e-7 3e-6 4e-7)
R1 in 0 1k
.TRAN 1e-7 5e-6
.end
"""

SFFM_DECK = """* sffm source
I1 0 in SFFM 0.5 2 1e6 4 1e5
R1 in 0 1
.TRAN 1e-8 4e-6
.end
"""


def exp_analytic(t):
    v1, v2, td1, tau1, td2, tau2 = 0.0, 5.0, 1e-6, 2e-7, 3e-6, 4e-7
    out = v1
    if t > td1:
        out += (v2 - v1) * (1.0 - math.exp(-(t - td1) / tau1))
    if t > td2:
        out += (v1 - v2) * (1.0 - math.exp(-(t - td2) / tau2))
    return out


def sffm_analytic(t):
    return 0.5 + 2.0 * math.sin(2e6 * math.pi * t
                                + 4.0 * math.sin(2e5 * math.pi * t))


def test_exp_transient_matches_analytic():
    sim = Simulator.from_text(EXP_DECK)
    res = sim.transient()
    v = np.asarray(res.xs)[:, node_eq(sim, "in")]
    # waveform slope up to v2/tau = 2.5e7 V/s; the scan's accumulated-t
    # drift (~5e-14 s over 50 steps) shows up as ~1e-6 V
    want = np.array([exp_analytic(t) for t in np.asarray(res.times)])
    assert np.abs(v - want).max() < 1e-4


def test_sffm_transient_matches_analytic():
    sim = Simulator.from_text(SFFM_DECK)
    res = sim.transient()
    v = np.asarray(res.xs)[:, node_eq(sim, "in")]
    want = np.array([sffm_analytic(t) for t in np.asarray(res.times)])
    assert np.abs(v - want).max() < 1e-4


def test_exp_dc_value_is_v1():
    sim = Simulator.from_text("""* exp dc
V1 in 0 EXP(3 5 1e-6 2e-7)
R1 in 0 1k
.op
""")
    x = sim.dc()
    assert float(x[node_eq(sim, "in")]) == pytest.approx(3.0, abs=1e-6)


def test_sffm_dc_value_is_vo():
    sim = Simulator.from_text("""* sffm dc
V1 in 0 SFFM(1.5 2 1e6)
R1 in 0 1k
.op
""")
    x = sim.dc()
    assert float(x[node_eq(sim, "in")]) == pytest.approx(1.5, abs=1e-6)


def test_scalar_vs_vector_evaluators_agree():
    import jax.numpy as jnp
    from circuitsimulator_tpu.models.sources import eval_exp, eval_sffm
    we = Waveform(kind=WAVE_EXP, v1=-1.0, v2=2.0, ptd=1e-6, tr=3e-7,
                  tf=2e-6, ton=5e-7)
    ws = Waveform(kind=WAVE_SFFM, v0=0.2, va=1.0, freq=2e6, std=3.0, phi=2e5)
    pulse = jnp.asarray([[-1.0, 2.0, 1e-6, 3e-7, 2e-6, 5e-7, 0.0]])
    sin = jnp.asarray([[0.2, 1.0, 2e6, 3.0, 2e5]])
    for t in [0.0, 5e-7, 1e-6, 1.5e-6, 2e-6, 2.5e-6, 7e-6]:
        assert float(eval_exp(pulse, t)[0]) == pytest.approx(
            eval_waveform(we, t), abs=1e-12)
        assert float(eval_sffm(sin, t)[0]) == pytest.approx(
            eval_waveform(ws, t), abs=1e-12)


def test_exp_zero_tau_is_step():
    # tau <= 0 degenerates to an instantaneous step at td (documented)
    w = Waveform(kind=WAVE_EXP, v1=0.0, v2=4.0, ptd=1e-6, tr=0.0,
                 tf=math.inf)
    assert eval_waveform(w, 0.5e-6) == 0.0
    assert eval_waveform(w, 1.5e-6) == 4.0


def test_exp_without_decay_args_is_pure_rise():
    # EXP(v1 v2 td1 tau1) — td2 defaults to +inf (no decay segment)
    sim = Simulator.from_text("""* exp rise only
V1 in 0 EXP(0 5 0 1e-6)
R1 in 0 1k
.op
""")
    e = next(el for el in sim.circuit.elements if el.name == "V1")
    assert eval_waveform(e.spec.wave, 1e-6) == pytest.approx(
        5.0 * (1.0 - math.exp(-1.0)), abs=1e-12)
    assert eval_waveform(e.spec.wave, 100.0) == pytest.approx(5.0, abs=1e-9)


def test_native_parity_exp_sffm():
    from circuitsimulator_tpu import native
    if not native.available():
        pytest.skip("native frontend not built")
    import dataclasses
    for deck in (EXP_DECK, SFFM_DECK):
        ckt_py, _ = parse_netlist_text(deck)
        ckt_nat, _ = native.parse_netlist_text_native(deck)
        ckt_py.assign_equation_indices()
        ckt_nat.assign_equation_indices()
        for a, b in zip(ckt_nat.elements, ckt_py.elements):
            assert dataclasses.asdict(a) == dataclasses.asdict(b), (a, b)
