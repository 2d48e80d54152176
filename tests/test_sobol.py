"""Global Sobol sensitivity indices (parallel/montecarlo.sobol_indices):
Saltelli first-order / Jansen total-effect estimators, all evaluations
in ONE batched transient."""

import math

import numpy as np
import pytest
import jax

from circuitsimulator_tpu import Simulator


def test_additive_divider_indices():
    # V(out) = r2/(r1+r2) is near-linear in z at 5% sigma: both dims get
    # S1 ~ ST ~ 0.5, no interaction
    sim = Simulator.from_text("""* divider
V1 in 0 DC 1
R1 in out 1k
R2 out 0 1k
.TRAN 1e-6 4e-6
.MEASURE TRAN vend FIND V(out) AT=3e-6
.end
""")
    out = sim.sobol_indices(jax.random.key(0), 1024, {"res_r": 0.05})
    r = out["vend"]
    assert r["dims"] == [("res_r", 0), ("res_r", 1)]
    np.testing.assert_allclose(r["S1"], [0.5, 0.5], atol=0.08)
    np.testing.assert_allclose(r["ST"], [0.5, 0.5], atol=0.08)
    # near-linear: interactions are tiny
    assert np.abs(r["ST"] - r["S1"]).max() < 0.05
    assert r["var"] > 0


def test_multiplicative_interaction():
    # V(out) = v(x)·v(y) with v = 1V·e^(a·z), a = 0.5: the exact ANOVA
    # gives S1 = 1/(e^(a²)+1) = 0.438 and ST = 1 − S1 = 0.562 — the
    # ST−S1 gap is pure interaction, invisible to linearized budgets
    a = 0.5
    sim = Simulator.from_text("""* multiplicative
I1 0 x 1m
RX x 0 1k
I2 0 y 1m
RY y 0 1k
B1 out 0 V=v(x)*v(y)
RO out 0 1k
.TRAN 1e-6 4e-6
.MEASURE TRAN m FIND V(out) AT=3e-6
.end
""")
    s1_true = 1.0 / (math.exp(a * a) + 1.0)
    out = sim.sobol_indices(jax.random.key(1), 2048, {"res_r": a})
    r = out["m"]
    # res_r leaf holds [RX, RY, RO]; RO is unperturbed only if excluded
    # from rel_sigma — it isn't, so it contributes ~0 (B forces V(out))
    labels = r["dims"]
    assert len(labels) == 3
    np.testing.assert_allclose(r["S1"][:2], [s1_true, s1_true], atol=0.09)
    np.testing.assert_allclose(r["ST"][:2], [1 - s1_true, 1 - s1_true],
                               atol=0.09)
    # the interaction gap is real and positive on both active dims
    assert (r["ST"][:2] - r["S1"][:2]).min() > 0.04
    # the output load does not matter (V-form B source forces the node)
    assert abs(r["ST"][2]) < 0.02


def test_requires_measures():
    sim = Simulator.from_text("""* no measure
V1 in 0 DC 1
R1 in 0 1k
.TRAN 1e-6 4e-6
.end
""")
    with pytest.raises(ValueError):
        sim.sobol_indices(jax.random.key(0), 64, {"res_r": 0.05})
