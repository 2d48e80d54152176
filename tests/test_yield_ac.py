"""AC (RF) yield analysis: .MEASURE AC specs scored on the batched
lanes x frequencies small-signal sweep, with the same sampling plans and
importance-sampling machinery as the transient path.

The RC lowpass gives a CLOSED-FORM failure probability: bw = 1/(2πRC)
with lognormal R, C, so fail {bw < bw_c} ⟺ (z_R+z_C)/√2 > c and
P_fail = Φ(−c)."""

import math

import numpy as np
import pytest
import jax

from circuitsimulator_tpu import Simulator


SIG = 0.05
BW0 = 1000.0


def _deck():
    return Simulator.from_text("""* rf yield
V1 in 0 DC 0 AC 1
R1 in out 1k
C1 out 0 159.15494n
.AC DEC 20 10 100k
.MEASURE AC bw WHEN VDB(out)=-3 FALL=1
.end
""")


def _bw_c(c):
    # bw_c such that the failure boundary sits at c sigmas
    return BW0 * math.exp(-c * SIG * math.sqrt(2.0))


def _phi(x):
    return 0.5 * math.erfc(-x / math.sqrt(2.0))


def test_ac_yield_bulk():
    # common failure (c = 0.7 -> P_fail = 24%): plain estimate matches
    sim = _deck()
    c = 0.7
    out = sim.yield_analysis(jax.random.key(0), 256, {"res_r": SIG,
                                                      "cap_c": SIG},
                             {"bw": (_bw_c(c), None)}, sampler="lhs")
    assert out["yield"] == pytest.approx(1 - _phi(-c), abs=0.06)
    assert out["measures"]["bw"].shape == (256,)
    lo, hi = out["ci95"]
    assert lo <= out["yield"] <= hi


def test_ac_sobol_indices():
    # ln(bw) = -ln(2πRC) is ADDITIVE in z: S1 ~ ST ~ 0.5 each, no
    # interaction (at 5% sigma the log-linearity is near-exact)
    sim = _deck()
    out = sim.sobol_indices(jax.random.key(2), 256,
                            {"res_r": SIG, "cap_c": SIG})
    r = out["bw"]
    np.testing.assert_allclose(r["S1"], [0.5, 0.5], atol=0.1)
    np.testing.assert_allclose(r["ST"], [0.5, 0.5], atol=0.1)
    assert r["var"] > 0


def test_ac_mismatch_budget():
    # |H| at the nominal corner: d|H|/dz_R = d|H|/dz_C =
    # -sig·r²/(1+r²)^1.5 |_{r=1} = -sig/(2·sqrt(2)) — equal shares and
    # sigma_m = sig/2 exactly
    sim = _deck()
    f0 = 1.0 / (2 * math.pi * 1e3 * 159.15494e-9)
    out = sim.mismatch_budget({"res_r": SIG, "cap_c": SIG},
                              analysis="ac", probe="out", at=f0)
    assert out["m_nominal"] == pytest.approx(1 / math.sqrt(2), rel=1e-6)
    assert out["sigma_m"] == pytest.approx(SIG / 2, rel=1e-3)
    (n1, _, s1), (n2, _, s2) = out["contributions"]
    assert s1 == pytest.approx(0.5, rel=1e-3)
    assert s2 == pytest.approx(0.5, rel=1e-3)


def test_ac_yield_high_sigma_is():
    # rare failure (c = 3 -> P_fail = 1.35e-3): scaled-sigma IS on the
    # AC path nails the closed form
    sim = _deck()
    c = 3.0
    out = sim.yield_analysis(jax.random.key(1), 512, {"res_r": SIG,
                                                      "cap_c": SIG},
                             {"bw": (_bw_c(c), None)}, sigma_scale=2.5)
    p_true = _phi(-c)
    assert out["p_fail_se"] < 0.5 * out["p_fail"]
    assert abs(out["p_fail"] - p_true) < 3 * out["p_fail_se"]
    assert 0.4 * p_true < out["p_fail"] < 2.5 * p_true
    assert out["n_eff"] > 10


def test_group_delay_rc_closed_form():
    # RC lowpass: tau_g(f) = RC/(1+(2*pi*f*RC)^2) exactly; jax.grad
    # through the solve has no finite-difference grid error
    sim = _deck()
    tau0 = 1e3 * 159.15494e-9
    f, tau = sim.group_delay("out")
    pred = tau0 / (1.0 + (2 * math.pi * f * tau0) ** 2)
    np.testing.assert_allclose(tau, pred, rtol=1e-9)
    # at the corner the delay is half the DC value
    f0 = 1.0 / (2 * math.pi * tau0)
    f2, tau2 = sim.group_delay("out", freqs=[f0])
    assert tau2[0] == pytest.approx(tau0 / 2, rel=1e-9)


def test_ac_measure_parity_and_form_on_bandwidth():
    # the differentiable AC measure layer must match the host evaluator
    # on the bandwidth card, and FORM on that card recovers the
    # closed-form beta: fail {bw < bw_c} has beta = ln(bw0/bw_c)/(sig*sqrt2)
    import jax.numpy as jnp
    from circuitsimulator_tpu.analysis.measure import run_measures
    from circuitsimulator_tpu.analysis.measure_diff import diff_measure_ac
    from circuitsimulator_tpu.analysis.ac import sweep_frequencies
    sim = _deck()
    cfg = sim.config.ac
    freqs = sweep_frequencies(cfg.sweep_type, cfg.n_points,
                              cfg.fstart, cfg.fstop)
    res = sim.ac()
    host = dict(run_measures(sim.config.measures, sim.topo,
                             np.asarray(freqs), res.xs, "ac"))
    m = next(x for x in sim.config.measures if x.name == "bw")
    f = diff_measure_ac(m, sim.topo)
    v = float(f(jnp.asarray(freqs), jnp.asarray(res.xs.real),
                jnp.asarray(res.xs.imag)))
    assert v == pytest.approx(host["bw"], rel=1e-9)
    # FORM directly on the deck's bandwidth card
    c = 3.0
    out = sim.worst_case({"res_r": SIG, "cap_c": SIG}, analysis="ac",
                         measure="bw", low=_bw_c(c))
    assert out["converged"]
    # the -3 dB crossing interpolates LINEARLY between log-spaced sweep
    # points, so the recovered beta carries a small grid bias
    assert out["beta"] == pytest.approx(c, rel=0.02)
    a = np.asarray(out["alpha"])
    assert a[0] == pytest.approx(1 / math.sqrt(2), abs=0.05)
    assert a[1] == pytest.approx(1 / math.sqrt(2), abs=0.05)


def test_ac_mismatch_budget_on_measure_card():
    # the bw card's budget: ln(bw) additive in z -> equal shares,
    # sigma_m/bw = sig*sqrt(2)
    sim = _deck()
    out = sim.mismatch_budget({"res_r": SIG, "cap_c": SIG},
                              analysis="ac", measure="bw")
    (n1, _, s1), (n2, _, s2) = out["contributions"]
    assert s1 == pytest.approx(0.5, abs=0.03)
    assert s2 == pytest.approx(0.5, abs=0.03)
    # sigma of the bandwidth (linearized): bw0 * sig * sqrt(2), with a
    # few % log-grid interpolation bias
    assert out["sigma_m"] == pytest.approx(BW0 * SIG * math.sqrt(2),
                                           rel=0.05)
