"""Monte-Carlo oscillators (analysis/hbosc.py batched paths): batched
autonomous HB + batched PPV phase noise must reproduce the host solver
lane-for-lane, and perturbed lanes must show real frequency pull."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from circuitsimulator_tpu import Simulator

VDP = """* van der pol lc oscillator
L1 a 0 1u
C1 a 0 1n
Rl a 0 2k
Bneg a 0 I=-2m*v(a) + 0.5m*v(a)**3
.op
"""

VDP_TOL = VDP.replace("L1 a 0 1u", "L1 a 0 1u DEV=2%").replace(
    "C1 a 0 1n", "C1 a 0 1n DEV=2%")


def node_eq(sim, name):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index


def test_batched_oscillator_matches_host():
    from circuitsimulator_tpu.analysis.hbosc import (
        oscillator_hb_batched, oscillator_phase_noise_hb_batched)
    sim = Simulator.from_text(VDP)
    host = sim.oscillator_hb(f0_guess=5e6, anchor_node="a", n_harm=9)
    pn = sim.oscillator_phase_noise_hb([1e3, 1e5], f0_guess=5e6,
                                       anchor_node="a", n_harm=9)
    bp = jax.tree.map(lambda x: jnp.stack([x, x]), sim.params)
    bres = oscillator_hb_batched(sim.engine, bp, 5e6,
                                 node_eq(sim, "a"), n_harm=9)
    assert bool(bres.converged.all())
    np.testing.assert_allclose(bres.f0, host.f0, rtol=1e-10)
    bres = oscillator_phase_noise_hb_batched(sim.engine, bp, bres,
                                             [1e3, 1e5])
    # the inverse-iteration PPV must land the host SVD's normalization
    np.testing.assert_allclose(bres.c, pn.c, rtol=1e-8)
    np.testing.assert_allclose(bres.c_flicker, pn.c_flicker, atol=1e-30)
    for lane in range(2):
        np.testing.assert_allclose(bres.L_dbc[lane], pn.L_dbc, rtol=1e-8)
    np.testing.assert_allclose(bres.period_jitter,
                               pn.period_jitter, rtol=1e-8)


def test_monte_carlo_oscillator_phase_noise():
    sim = Simulator.from_text(VDP_TOL)
    bp, res = sim.monte_carlo_oscillator_phase_noise(
        8, offsets=[10e3], f0_guess=5e6, anchor_node="a", seed=1)
    assert res.converged.all(), res.residual
    # 2% L/C tolerances -> visible per-lane frequency pull around
    # 1/(2*pi*sqrt(LC)), sigma_f/f ~ sqrt(2)/2 * 2% ~ 1.4%
    f0 = np.asarray(res.f0)
    assert np.all(np.abs(f0 / 5.03e6 - 1.0) < 0.10)
    assert np.std(f0) / np.mean(f0) > 0.003
    # every lane carries a positive diffusion constant and a finite
    # Lorentzian
    assert np.all(res.c > 0)
    assert np.all(np.isfinite(res.L_dbc))
    assert res.L_dbc.shape == (8, 1)
    # R is the only noisy device class in this deck
    assert set(res.kinds) == {"R"}


def test_batched_ppv_f32_sane():
    """f32-mode sanity (ADVICE r4): the inverse-iteration PPV eps is now
    scaled by sqrt(machine-eps) of the ENGINE dtype, so an f32 engine's
    near-singular J^T factorization must not be rounding-dominated — the
    diffusion constant has to land within f32-resolution distance of the
    f64 host-SVD answer."""
    from circuitsimulator_tpu import DEFAULT_OPTIONS
    from circuitsimulator_tpu.analysis.hbosc import (
        oscillator_hb_batched, oscillator_phase_noise_hb_batched)
    ref = Simulator.from_text(VDP)
    pn64 = ref.oscillator_phase_noise_hb([1e3, 1e5], f0_guess=5e6,
                                         anchor_node="a", n_harm=9)
    sim = Simulator.from_text(
        VDP, opts=DEFAULT_OPTIONS.replace(dtype=jnp.float32,
                                          dc_tol=1e-5, tran_tol=1e-5))
    bp = jax.tree.map(lambda x: jnp.stack([x, x]), sim.params)
    bres = oscillator_hb_batched(sim.engine, bp, 5e6,
                                 node_eq(sim, "a"), n_harm=9)
    assert bool(bres.converged.all()), np.asarray(bres.residual)
    np.testing.assert_allclose(np.asarray(bres.f0, np.float64),
                               pn64.f0, rtol=2e-5)
    bres = oscillator_phase_noise_hb_batched(sim.engine, bp, bres,
                                             [1e3, 1e5])
    # c is a squared PPV projection: f32 arithmetic + the sqrt(eps_mach)
    # regularization leave a few % of headroom, far tighter than the
    # order-of-magnitude scale phase-noise numbers live on
    np.testing.assert_allclose(np.asarray(bres.c, np.float64),
                               pn64.c, rtol=0.05)
    for lane in range(2):
        np.testing.assert_allclose(
            np.asarray(bres.L_dbc[lane], np.float64), pn64.L_dbc,
            atol=0.5)   # dBc/Hz
