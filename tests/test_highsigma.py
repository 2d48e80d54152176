"""High-sigma yield: scaled-sigma importance sampling with exact
likelihood-ratio weights (parallel/montecarlo.yield_analysis
sigma_scale=).  The divider below has a CLOSED-FORM failure probability:
V(out) = r2/(r1+r2) with r_i = 1k·exp(s·z_i), so
fail {V < Vc}  ⟺  (z2 - z1)/√2 < ln(Vc/(1-Vc))/(s·√2)  — a standard
normal — and P_fail = Φ(c) exactly."""

import math

import numpy as np
import jax
import pytest

from circuitsimulator_tpu import Simulator


SIG = 0.05


def _deck():
    return Simulator.from_text("""* divider yield
V1 in 0 DC 1
R1 in out 1k
R2 out 0 1k
.TRAN 1e-6 4e-6
.MEASURE TRAN vend FIND V(out) AT=3e-6
.end
""")


def _vc_for(c_sigmas: float) -> float:
    # threshold Vc such that the failure boundary sits at c_sigmas on
    # the standard-normal combination (z2 - z1)/sqrt(2)
    L = -c_sigmas * SIG * math.sqrt(2.0)
    r = math.exp(L)
    return r / (1.0 + r)


def _phi(x):
    return 0.5 * math.erfc(-x / math.sqrt(2.0))


def test_high_sigma_rare_failure():
    # 3.5-sigma spec: P_fail = 2.33e-4 — a 4096-lane plain batch expects
    # <1 failing lane; scaled-sigma IS at s=3 nails it
    c = 3.5
    vc = _vc_for(c)
    p_true = _phi(-c)
    sim = _deck()
    out = sim.yield_analysis(jax.random.key(0), 4096, {"res_r": SIG},
                             {"vend": (vc, None)}, sigma_scale=3.0)
    assert out["n_eff"] > 30        # effective FAILURE samples
    assert out["p_fail_se"] < 0.5 * out["p_fail"]
    assert abs(out["p_fail"] - p_true) < 3.0 * out["p_fail_se"]
    assert 0.3 * p_true < out["p_fail"] < 3.0 * p_true
    assert out["yield"] == pytest.approx(1.0 - out["p_fail"])
    lo, hi = out["ci95"]
    assert lo <= out["yield"] <= hi


def test_is_matches_plain_mc_in_the_bulk():
    # a COMMON failure (P ~ 24%): the weighted IS estimate and the plain
    # Wilson estimate must agree
    c = 0.7
    vc = _vc_for(c)
    p_true = _phi(-c)
    sim = _deck()
    plain = sim.yield_analysis(jax.random.key(1), 2048, {"res_r": SIG},
                               {"vend": (vc, None)})
    weighted = sim.yield_analysis(jax.random.key(2), 2048, {"res_r": SIG},
                                  {"vend": (vc, None)}, sigma_scale=1.5)
    assert plain["yield"] == pytest.approx(1 - p_true, abs=0.03)
    assert weighted["yield"] == pytest.approx(1 - p_true, abs=0.03)
    assert weighted["p_fail"] == pytest.approx(p_true, rel=0.15)


def test_is_composes_with_stratified_samplers():
    c = 3.0
    vc = _vc_for(c)
    p_true = _phi(-c)
    sim = _deck()
    for sampler in ("lhs", "antithetic"):
        out = sim.yield_analysis(jax.random.key(3), 2048, {"res_r": SIG},
                                 {"vend": (vc, None)}, sampler=sampler,
                                 sigma_scale=2.5)
        assert 0.25 * p_true < out["p_fail"] < 4.0 * p_true, sampler
        assert out["weights"].shape == (2048,)


def test_mpp_centered_two_stage_flow():
    # the textbook high-sigma flow: FORM search finds the most probable
    # failure point, then mean-shift IS centered there gives an unbiased
    # low-variance estimate — tighter than scaled-sigma IS at the same
    # batch size
    c = 3.5
    vc = _vc_for(c)
    p_true = _phi(-c)
    sim = _deck()
    form = sim.worst_case({"res_r": SIG}, probe="out", at=3e-6, low=vc)
    assert form["converged"]
    shifted = sim.yield_analysis(jax.random.key(7), 1024, {"res_r": SIG},
                                 {"vend": (vc, None)},
                                 shift=form["z_star"])
    scaled = sim.yield_analysis(jax.random.key(7), 1024, {"res_r": SIG},
                                {"vend": (vc, None)}, sigma_scale=3.0)
    assert abs(shifted["p_fail"] - p_true) < 3.0 * shifted["p_fail_se"]
    assert shifted["p_fail"] == pytest.approx(p_true, rel=0.25)
    # MPP-centered IS is the lower-variance estimator
    assert shifted["p_fail_se"] < scaled["p_fail_se"]
    # mean-shift puts ~half the lanes in the failure region
    assert 0.2 < float((~shifted["pass"]).mean()) < 0.8


def test_plain_batch_cannot_see_the_tail():
    # documents WHY sigma_scale exists: at 3.5 sigma a 2048-lane plain
    # batch usually scores zero failures (yield exactly 1.0)
    vc = _vc_for(3.5)
    sim = _deck()
    out = sim.yield_analysis(jax.random.key(4), 2048, {"res_r": SIG},
                             {"vend": (vc, None)})
    assert out["yield"] > 0.999
    assert "n_eff" not in out          # plain path keeps Wilson CI only
