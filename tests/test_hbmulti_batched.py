"""Batched multi-tone HB + Monte-Carlo IP3 (analysis/hbmulti.py
harmonic_balance_multi_batched): lane-for-lane parity with the host
solver and the cubic closed form."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from circuitsimulator_tpu import Simulator

A = 0.1
A3 = 0.1

DECK = f"""* two-tone cubic w/ tolerances
V1 m 0 SIN 0 {A} 1.0e6
V2 x m SIN 0 {A} 1.3e6
B1 out 0 V=v(x) + {A3}*v(x)^3
RO out 0 1k DEV=5%
RL out 0 2k DEV=5%
.hb 1.0e6 3 1.3e6 3
.end
"""


def test_batched_multitone_matches_host():
    from circuitsimulator_tpu.analysis.hbmulti import (
        harmonic_balance_multi, harmonic_balance_multi_batched,
        coeff, coeff_batched)
    sim = Simulator.from_text(DECK)
    tones = sim.config.hb.tones
    host = harmonic_balance_multi(sim.engine, sim.params, tones)
    assert bool(host.converged)
    bp = jax.tree.map(lambda x: jnp.stack([x, x]), sim.params)
    bres = harmonic_balance_multi_batched(sim.engine, bp, tones)
    assert bres.converged.all(), bres.residual
    for harm in ((1, 0), (2, -1), (0, 1)):
        np.testing.assert_allclose(
            np.abs(coeff_batched(bres, harm)[0]),
            np.abs(coeff(host, harm)), rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(bres.xs[0], bres.xs[1], rtol=0, atol=0)


def test_monte_carlo_ip3_closed_form():
    sim = Simulator.from_text(DECK)
    bp, out = sim.monte_carlo_ip3(4, "out", input_amplitude=A, seed=2)
    assert out["converged"].all()
    # the cubic's IIP3 does not depend on the (perturbed) load resistors
    iip3_pred = math.sqrt(4.0 / (3.0 * A3))
    np.testing.assert_allclose(out["iip3_amplitude"], iip3_pred,
                               rtol=2e-2)
    im3_pred = (3.0 / 4.0) * A3 * A ** 3
    np.testing.assert_allclose(out["im3"], im3_pred, rtol=2e-2)
    assert out["fund"].shape == (4,)
