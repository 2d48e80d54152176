"""Yield-driven design centering (Simulator.center_design): FORM beta
gradient ascent on the worst spec."""

import math

import numpy as np

from circuitsimulator_tpu import Simulator


SIG = 0.05


def _vc(c):
    L = -c * SIG * math.sqrt(2.0)
    return math.exp(L) / (1.0 + math.exp(L))


def _deck():
    return Simulator.from_text("""* divider centering
V1 in 0 DC 1
R1 in out 1k
R2 out 0 1k
.TRAN 1e-6 4e-6
.end
""")


def test_center_single_spec():
    # nominal sits at beta = 2 against the low-V spec; centering must
    # push it past beta = 3 by moving R2 up / R1 down
    sim = _deck()
    vc = _vc(2.0)
    p, hist = sim.center_design(
        {"res_r": SIG}, [{"probe": "out", "at": 3e-6, "low": vc}],
        ["res_r"], target_beta=3.0, steps=8, lr=0.05)
    assert hist[0]["betas"][0] < 2.2
    assert hist[-1]["betas"][0] >= 3.0
    r = np.asarray(p["res_r"])
    assert r[1] > 1e3 and r[0] < 1e3          # moved the right way
    assert len(hist) < 8                      # converged early


def test_center_two_sided_window():
    # symmetric +-4-sigma window around 0.5, but start with R2 skewed
    # 10% high: the lower-margin side limits beta; centering rebalances
    sim = _deck()
    lo, hi = _vc(4.0), 1.0 - _vc(4.0)
    import jax.numpy as jnp
    p0 = dict(sim.params)
    p0["res_r"] = sim.params["res_r"] * jnp.asarray([1.0, 1.1])
    specs = [{"probe": "out", "at": 3e-6, "low": lo},
             {"probe": "out", "at": 3e-6, "high": hi}]
    p, hist = sim.center_design({"res_r": SIG}, specs, ["res_r"],
                                target_beta=3.5, steps=10, lr=0.05,
                                params=p0)
    b0 = hist[0]["betas"]
    bN = hist[-1]["betas"]
    assert min(b0) < 2.8                      # skew hurt one side
    assert min(bN) >= 3.5                     # both specs recovered
    # the imbalance shrank
    assert abs(bN[0] - bN[1]) < abs(b0[0] - b0[1])


def test_center_mixed_domain_specs():
    # a transient settle spec AND a DC bias window centered together:
    # the DC spec (analysis="dc") runs on the polished operating point
    sim = _deck()
    vc_tr = _vc(2.0)
    lo_dc, hi_dc = _vc(5.0), 1.0 - _vc(5.0)   # generous DC window
    specs = [{"probe": "out", "at": 3e-6, "low": vc_tr},
             {"probe": "out", "low": lo_dc, "high": hi_dc,
              "analysis": "dc"}]
    p, hist = sim.center_design({"res_r": SIG}, specs, ["res_r"],
                                target_beta=3.0, steps=8, lr=0.05)
    assert len(hist[0]["betas"]) == 2
    assert min(hist[-1]["betas"]) >= 3.0
    # the transient spec was the binding one at the start
    assert hist[0]["worst"] == 0
