"""FORM worst-case / most-probable-failure-point search (analysis/form.py).

Both validation decks have CLOSED-FORM reliability indices: the
lognormal map makes their failure boundaries exactly linear in z-space,
where FORM is exact.
"""

import math

import numpy as np
import pytest
import jax

from circuitsimulator_tpu import Simulator


def _phi_tail(b):
    return 0.5 * math.erfc(b / math.sqrt(2.0))


DIVIDER = """* divider worst case
V1 in 0 DC 1
R1 in out 1k
R2 out 0 1k
.TRAN 1e-6 4e-6
.end
"""

SIG = 0.05


def test_divider_beta_exact():
    # V(out) = r2/(r1+r2); fail {V < Vc} ⟺ (z2-z1)/√2 < -c: beta = c.
    # The engine keeps the reference's gmin shunt stamped through the
    # transient (the documented "gmin leak", ~5e-4 on this divider), so
    # the real boundary sits ~0.4% off the ideal closed form.
    c = 3.5
    L = -c * SIG * math.sqrt(2.0)
    vc = math.exp(L) / (1.0 + math.exp(L))
    sim = Simulator.from_text(DIVIDER)
    out = sim.worst_case({"res_r": SIG}, probe="out", at=3e-6, low=vc)
    assert out["converged"]
    assert out["beta"] == pytest.approx(c, rel=5e-3)
    assert out["p_fail"] == pytest.approx(_phi_tail(c), rel=0.1)
    # importance direction: R1 up, R2 down, equal magnitude
    a = np.asarray(out["alpha"])
    assert a[0] == pytest.approx(1 / math.sqrt(2), rel=1e-2)
    assert a[1] == pytest.approx(-1 / math.sqrt(2), rel=1e-2)
    assert out["g_nominal"] > 0
    # the worst-case parameter set sits ON the engine's real failure
    # boundary: re-simulating at params_star gives g = 0
    from circuitsimulator_tpu.analysis.form import limit_state_find_at
    from circuitsimulator_tpu.analysis.adjoint import diff_transient
    eqi = sim.circuit.nodes[sim.circuit.node_name_to_id["out"]].eq_index
    g_fn = limit_state_find_at(eqi, 3e-6, low=vc)
    times, xs = diff_transient(sim.engine, out["params_star"],
                               1e-6, 4e-6)
    assert abs(float(g_fn(times, xs))) < 1e-8 * out["g_nominal"]


def test_form_matches_importance_sampling():
    # cross-validate the two rare-event estimators on the same spec
    c = 3.5
    L = -c * SIG * math.sqrt(2.0)
    vc = math.exp(L) / (1.0 + math.exp(L))
    sim = Simulator.from_text("""* divider yield
V1 in 0 DC 1
R1 in out 1k
R2 out 0 1k
.TRAN 1e-6 4e-6
.MEASURE TRAN vend FIND V(out) AT=3e-6
.end
""")
    form = sim.worst_case({"res_r": SIG}, probe="out", at=3e-6, low=vc)
    mc = sim.yield_analysis(jax.random.key(0), 4096, {"res_r": SIG},
                            {"vend": (vc, None)}, sigma_scale=3.0)
    assert form["p_fail"] == pytest.approx(mc["p_fail"],
                                           abs=3 * mc["p_fail_se"])


def test_rc_time_constant_beta():
    # vend = 1 - exp(-t/RC) at t; fail {vend < Vc} ⟺ RC too big
    # ⟺ z_R + z_C > |L|/sig: beta = |L|/(sig·√2)
    sig = 0.1
    L = 0.35
    beta_true = L / (sig * math.sqrt(2.0))
    t_at, tau0 = 1e-3, 1e-3
    vc = 1.0 - math.exp(-t_at / (tau0 * math.exp(L)))
    sim = Simulator.from_text("""* rc worst case
V1 in 0 PULSE(0 1 0 1n 1n 1 1)
R1 in out 1k
C1 out 0 1u
.TRAN 2e-5 2e-3
.end
""")
    out = sim.worst_case({"res_r": sig, "cap_c": sig},
                         probe="out", at=t_at, low=vc)
    assert out["converged"]
    # BE time discretization + the stamped gmin shift the boundary a
    # few percent off the continuous-time closed form; FORM itself is
    # exact on the engine's boundary (checked via alpha + g(z*) = 0)
    assert out["beta"] == pytest.approx(beta_true, rel=0.05)
    a = np.asarray(out["alpha"])
    assert a[0] == pytest.approx(a[1], rel=1e-3)       # R and C symmetric

def test_design_centering_gradient():
    # dβ/d(nominal) at the MPP: analytic for the divider
    # (β = [ln(vc/(1−vc)) − ln(r2/r1)]/(−s√2)): dβ/dr2 = 1/(r2·s·√2);
    # cross-checked by finite differences of two full FORM searches
    c = 3.0
    L = -c * SIG * math.sqrt(2.0)
    vc = math.exp(L) / (1.0 + math.exp(L))
    sim = Simulator.from_text(DIVIDER)
    out = sim.worst_case({"res_r": SIG}, probe="out", at=3e-6, low=vc,
                         design_grads=["res_r"])
    db = np.asarray(out["dbeta"]["res_r"])
    ana = 1.0 / (1e3 * SIG * math.sqrt(2.0))
    assert db[1] == pytest.approx(ana, rel=0.02)       # R2 up -> safer
    assert db[0] == pytest.approx(-ana, rel=0.02)      # R1 up -> riskier
    # finite-difference cross-check on R2
    h = 1e-3
    p2 = dict(sim.params)
    p2["res_r"] = sim.params["res_r"].at[1].add(h * 1e3)
    out2 = sim.worst_case({"res_r": SIG}, probe="out", at=3e-6, low=vc,
                          params=p2)
    fd = (out2["beta"] - out["beta"]) / (h * 1e3)
    assert db[1] == pytest.approx(fd, rel=1e-3)


def test_mismatch_budget_divider():
    # V(out) = r2/(r1+r2): dV/dz1 = -0.25*SIG, dV/dz2 = +0.25*SIG at
    # nominal — equal shares, and sigma_m = 0.25*SIG*sqrt(2)
    sim = Simulator.from_text(DIVIDER)
    out = sim.mismatch_budget({"res_r": SIG}, probe="out", at=3e-6)
    assert out["m_nominal"] == pytest.approx(0.5, abs=1e-3)
    assert out["sigma_m"] == pytest.approx(0.25 * SIG * math.sqrt(2),
                                           rel=5e-3)
    (n1, i1, s1), (n2, i2, s2) = out["contributions"]
    assert n1 == n2 == "res_r"
    assert s1 == pytest.approx(0.5, rel=5e-3)
    assert s2 == pytest.approx(0.5, rel=5e-3)
    # gradient signs: R1 up pulls V(out) down, R2 up pushes it up
    g = np.asarray(out["grad_z"])
    assert g[0] < 0 < g[1]


def test_mismatch_budget_unequal_sigmas():
    # doubling one resistor's sigma quadruples its variance share:
    # shares 4:1 -> 80% / 20%
    sim = Simulator.from_text("""* unequal
V1 in 0 DC 1
R1 in out 1k
R2 out 0 1k
.TRAN 1e-6 4e-6
.end
""")
    from circuitsimulator_tpu.analysis.form import mismatch_budget
    import jax.numpy as jnp
    eqi = sim.circuit.nodes[sim.circuit.node_name_to_id["out"]].eq_index

    def m_fn(times, xs):
        return xs[-1, eqi]

    # per-dimension sigmas via two separate single-name budgets is not
    # expressible (rel_sigma is per-leaf), so scale through params:
    # equivalently, verify the scaling law on the divider by comparing
    # sigma_m at SIG and 2*SIG
    a = mismatch_budget(sim.engine, sim.params, {"res_r": SIG},
                        1e-6, 4e-6, m_fn)
    b = mismatch_budget(sim.engine, sim.params, {"res_r": 2 * SIG},
                        1e-6, 4e-6, m_fn)
    assert b["sigma_m"] == pytest.approx(2 * a["sigma_m"], rel=1e-6)


def test_budget_matches_mc_spread():
    # the linearized sigma_m must predict the actual batched MC spread
    sim = Simulator.from_text(DIVIDER)
    out = sim.mismatch_budget({"res_r": SIG}, probe="out", at=3e-6)
    from circuitsimulator_tpu.parallel.montecarlo import (
        perturb_params, batched_transient)
    bp = perturb_params(sim.params, jax.random.key(0), 512,
                        {"res_r": SIG}, sampler="lhs")
    res = batched_transient(sim.engine, bp, 1e-6, 4e-6)
    eqi = sim.circuit.nodes[sim.circuit.node_name_to_id["out"]].eq_index
    v = np.asarray(res.x_final)[:, eqi]
    assert v.std() == pytest.approx(out["sigma_m"], rel=0.05)


def test_ac_worst_case_lowpass():
    # RC lowpass probed AT its nominal corner f0: |H| = 1/sqrt(1+r^2)
    # with r = RC/(R0C0) = e^(sig(zR+zC)) — fail {|H| < Hc} is exactly
    # linear in z, beta = ln(rc)/(sig*sqrt(2))
    sig = 0.05
    beta_true = 3.0
    rc = math.exp(beta_true * sig * math.sqrt(2.0))
    hc = 1.0 / math.sqrt(1.0 + rc * rc)
    sim = Simulator.from_text("""* rc lowpass
V1 in 0 DC 0 AC 1
R1 in out 1k
C1 out 0 159.15494e-9
.AC DEC 10 10 100k
.end
""")
    f0 = 1.0 / (2 * math.pi * 1e3 * 159.15494e-9)
    out = sim.worst_case({"res_r": sig, "cap_c": sig}, analysis="ac",
                         probe="out", at=f0, low=hc,
                         design_grads=["res_r"])
    assert out["converged"]
    assert out["beta"] == pytest.approx(beta_true, rel=5e-3)
    # worst corner: R and C both HIGH, symmetric
    a = np.asarray(out["alpha"])
    assert a[0] == pytest.approx(1 / math.sqrt(2), rel=1e-2)
    assert a[1] == pytest.approx(1 / math.sqrt(2), rel=1e-2)
    # AC design sensitivity: dbeta/dR0 = -1/(R0*sig*sqrt(2))
    db = float(np.asarray(out["dbeta"]["res_r"])[0])
    assert db == pytest.approx(-1.0 / (1e3 * sig * math.sqrt(2.0)),
                               rel=0.02)


def test_nominal_failure_raises():
    sim = Simulator.from_text(DIVIDER)
    with pytest.raises(ValueError):
        sim.worst_case({"res_r": SIG}, probe="out", at=3e-6, low=0.9)


def test_needs_bounds_and_tran():
    sim = Simulator.from_text(DIVIDER)
    with pytest.raises(ValueError):
        sim.worst_case({"res_r": SIG}, probe="out", at=3e-6)
    sim2 = Simulator.from_text("""* no tran
V1 in 0 DC 1
R1 in 0 1k
.op
""")
    with pytest.raises(ValueError):
        sim2.worst_case({"res_r": SIG}, probe="in", at=1e-6, low=0.5)


DIVIDER_DC = """* divider dc only
V1 in 0 DC 1
R1 in out 1k
R2 out 0 1k
.op
"""


def test_dc_worst_case_exact():
    # the DC path uses the POLISHED operating point (gmin removed), so
    # the closed form holds to solver precision: beta = c exactly
    c = 3.5
    L = -c * SIG * math.sqrt(2.0)
    vc = math.exp(L) / (1.0 + math.exp(L))
    sim = Simulator.from_text(DIVIDER_DC)
    out = sim.worst_case({"res_r": SIG}, analysis="dc", probe="out",
                         low=vc)
    assert out["converged"]
    assert out["beta"] == pytest.approx(c, rel=1e-6)
    a = np.asarray(out["alpha"])
    assert a[0] == pytest.approx(1 / math.sqrt(2), rel=1e-6)
    assert a[1] == pytest.approx(-1 / math.sqrt(2), rel=1e-6)


def test_dc_mismatch_budget_exact():
    sim = Simulator.from_text(DIVIDER_DC)
    out = sim.mismatch_budget({"res_r": SIG}, analysis="dc", probe="out")
    assert out["m_nominal"] == pytest.approx(0.5, rel=1e-9)
    assert out["sigma_m"] == pytest.approx(0.25 * SIG * math.sqrt(2),
                                           rel=1e-9)
    (_, _, s1), (_, _, s2) = out["contributions"]
    assert s1 == pytest.approx(0.5, rel=1e-9)
    assert s2 == pytest.approx(0.5, rel=1e-9)


def test_sorm_linear_boundary_is_form():
    # exactly-linear boundary: zero curvature, SORM == FORM
    c = 3.0
    L = -c * SIG * math.sqrt(2.0)
    vc = math.exp(L) / (1.0 + math.exp(L))
    sim = Simulator.from_text(DIVIDER_DC)
    out = sim.worst_case({"res_r": SIG}, analysis="dc", probe="out",
                         low=vc, sorm=True)
    assert out["sorm_det"] == pytest.approx(1.0, abs=2e-3)
    assert out["p_fail_sorm"] == pytest.approx(out["p_fail"], rel=2e-3)


def test_sorm_fixes_curved_boundary_bias():
    # diode-loaded divider: the exponential load genuinely curves the
    # failure boundary in z-space.  Oracle: direct quadrature of the
    # SAME polished-DC limit state (bisect the boundary per z2 node,
    # integrate Φ(−z1*) against φ(z2)).  FORM sits ~3% low; Breitung's
    # correction lands within ~0.5%.
    import jax.numpy as jnp
    from scipy.stats import norm
    from circuitsimulator_tpu.analysis.adjoint import _make_diff_dc
    sim = Simulator.from_text("""* diode-loaded divider
V1 in 0 DC 2
R1 in out 1k
R2 out 0 2k
D1 out 0 IS=1e-9 N=2
.op
""")
    eq = sim.circuit.nodes[sim.circuit.node_name_to_id["out"]].eq_index
    dc = _make_diff_dc(sim.engine)
    sig = 0.10

    def params_of_z(z):
        p = dict(sim.params)
        p["res_r"] = sim.params["res_r"] * jnp.exp(sig * z)
        return p

    v_of = jax.jit(jax.vmap(lambda z: dc(params_of_z(z))[eq]))
    v0 = float(v_of(jnp.zeros((1, 2)))[0])
    g0 = jax.grad(lambda z: dc(params_of_z(z))[eq])(jnp.zeros(2))
    vc = v0 - 3.0 * float(jnp.linalg.norm(g0))   # a ~3-sigma spec
    out = sim.worst_case({"res_r": sig}, analysis="dc", probe="out",
                         low=vc, sorm=True)
    assert out["converged"]
    assert out["sorm_det"] < 0.98                # real curvature seen
    # quadrature oracle on the same boundary (v decreasing in z1)
    z2g = np.linspace(-8.0, 8.0, 161)
    lo = np.full_like(z2g, -10.0)
    hi = np.full_like(z2g, 12.0)
    for _ in range(50):
        mid = 0.5 * (lo + hi)
        vz = np.asarray(v_of(jnp.stack(
            [jnp.asarray(mid), jnp.asarray(z2g)], axis=1)))
        fail = vz < vc
        hi = np.where(fail, mid, hi)
        lo = np.where(fail, lo, mid)
    z1s = 0.5 * (lo + hi)
    p_quad = np.trapezoid(norm.pdf(z2g) * norm.sf(z1s), z2g)
    assert out["p_fail_sorm"] == pytest.approx(p_quad, rel=0.01)
    # ... and it genuinely improves on first order
    assert (abs(out["p_fail_sorm"] - p_quad)
            < 0.2 * abs(out["p_fail"] - p_quad))
