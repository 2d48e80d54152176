"""Differentiable .MEASURE layer (analysis/measure_diff.py): value
parity with the host evaluator, gradient correctness, and FORM on a
deck-defined timing spec."""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from circuitsimulator_tpu import Simulator
from circuitsimulator_tpu.analysis.measure import run_measures
from circuitsimulator_tpu.analysis.measure_diff import diff_measure


DECK = """* measure zoo
V1 in 0 PULSE(0 1 1e-5 1e-5 1e-5 2e-4 5e-4)
R1 in out 1k
C1 out 0 20n
RL out 0 10k
.TRAN 2e-6 1e-3
.MEASURE TRAN m_avg AVG V(out) FROM=1e-4 TO=6e-4
.MEASURE TRAN m_rms RMS V(out) FROM=5e-5 TO=9e-4
.MEASURE TRAN m_min MIN V(out) FROM=0 TO=1e-3
.MEASURE TRAN m_max MAX V(out)
.MEASURE TRAN m_pp PP V(out) FROM=1e-5 TO=9e-4
.MEASURE TRAN m_integ INTEG V(out) FROM=0 TO=5e-4
.MEASURE TRAN m_when WHEN V(out)=0.4 RISE=1
.MEASURE TRAN m_when2 WHEN V(out)=0.3 FALL=1 TD=2e-4
.MEASURE TRAN m_find FIND V(out) AT=3e-4
.MEASURE TRAN m_delay TRIG V(in) VAL=0.5 RISE=1 TARG V(out) VAL=0.5 RISE=1
.MEASURE TRAN m_fw FIND V(in) WHEN V(out)=0.35 RISE=1
.end
"""


def test_value_parity_with_host():
    sim = Simulator.from_text(DECK)
    res = sim.transient()
    t = np.asarray(res.times)
    xs = np.asarray(res.xs)
    host = dict(run_measures(sim.config.measures, sim.topo, t, xs))
    tj = jnp.asarray(res.times)
    xj = jnp.asarray(res.xs)
    for m in sim.config.measures:
        f = diff_measure(m, sim.topo)
        v = float(f(tj, xj))
        h = host[m.name]
        assert v == pytest.approx(h, rel=1e-9, abs=1e-15), m.name
        assert math.isfinite(v), m.name


def test_gradient_of_delay_matches_fd():
    # d(delay)/d(cap_c): the RC output crossing moves with C
    sim = Simulator.from_text(DECK)
    from circuitsimulator_tpu.analysis.adjoint import diff_transient
    m = next(x for x in sim.config.measures if x.name == "m_delay")
    f = diff_measure(m, sim.topo)

    def delay_of(p):
        t, xs = diff_transient(sim.engine, p, 2e-6, 1e-3)
        return f(t, xs)

    g = jax.grad(lambda c: delay_of(
        {**sim.params, "cap_c": c}))(sim.params["cap_c"])
    h = 1e-12
    p1 = dict(sim.params); p1["cap_c"] = sim.params["cap_c"].at[0].add(h)
    p2 = dict(sim.params); p2["cap_c"] = sim.params["cap_c"].at[0].add(-h)
    fd = (float(delay_of(p1)) - float(delay_of(p2))) / (2 * h)
    assert float(g[0]) == pytest.approx(fd, rel=1e-4)
    assert float(g[0]) > 0                 # bigger C -> longer delay


def test_mismatch_budget_on_measure():
    # budget of the TRIG/TARG delay: R1 (sets tau with C) dominates,
    # the 10k load shifts the level only weakly
    sim = Simulator.from_text(DECK)
    out = sim.mismatch_budget({"res_r": 0.05, "cap_c": 0.05},
                              measure="m_delay")
    assert out["sigma_m"] > 0
    shares = {(n, i): s for n, i, s in out["contributions"]}
    assert shares[("cap_c", 0)] > 0.3          # C sets tau directly
    assert shares[("res_r", 0)] > 0.3          # R1 sets tau directly
    assert shares[("res_r", 1)] < 0.2          # RL is second order


def test_fit_measures_hits_target_delay():
    # tune C so the deck's delay card reads 40 us (nominal ~16 us)
    sim = Simulator.from_text(DECK)
    target = 4e-5
    fitted, hist = sim.fit_measures({"m_delay": target}, ["cap_c"],
                                    steps=120, lr=0.1)
    assert hist[-1] < 1e-6
    # verify on a fresh host-evaluated run
    res = sim.transient(params=fitted)
    vals = dict(sim.measure(res))
    assert vals["m_delay"] == pytest.approx(target, rel=2e-3)
    assert float(fitted["cap_c"][0]) > float(sim.params["cap_c"][0])


def test_worst_case_on_timing_spec():
    # timing yield on the deck's own delay measure: the crossing time of
    # the RC rise at 0.5 is tau*ln(2) (+ input ramp offsets), lognormal
    # in tau -> linear boundary in z; beta recovered within a few %
    sim = Simulator.from_text(DECK)
    sig = 0.05
    nominal = sim.worst_case({"res_r": sig}, measure="m_delay",
                             high=1e9)["g_nominal"]
    d0 = 1e9 - nominal                     # nominal delay
    # place the spec at ~2.5 sigma on the R1 dimension alone: delay
    # scales with tau = R1*C (R1 is res_r[0]; RL shifts the gain a bit)
    c = 2.5
    d_max = d0 * math.exp(c * sig)
    out = sim.worst_case({"res_r": sig}, measure="m_delay", high=d_max)
    assert out["converged"]
    # RL also perturbs (second res_r dim) but only weakly: beta is
    # dominated by the R1 axis
    assert out["beta"] == pytest.approx(c, rel=0.15)
    a = np.asarray(out["alpha"])
    assert abs(a[0]) > 0.9                 # R1 dominates the corner
    assert out["p_fail"] < 0.01


def test_fit_measures_two_targets():
    # joint fit: hit a delay AND a final level by tuning C and the load
    sim = Simulator.from_text(DECK)
    res0 = sim.transient()
    v0 = dict(sim.measure(res0))
    targets = {"m_delay": v0["m_delay"] * 1.6, "m_find": v0["m_find"]}
    fitted, hist = sim.fit_measures(targets, ["cap_c", "res_r"],
                                    steps=160, lr=0.08)
    assert hist[-1] < 1e-5
    vals = dict(sim.measure(sim.transient(params=fitted)))
    assert vals["m_delay"] == pytest.approx(targets["m_delay"], rel=5e-3)
    assert vals["m_find"] == pytest.approx(targets["m_find"], rel=5e-3)
