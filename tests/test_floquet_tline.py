"""Floquet stability on transmission-line decks (r5: VERDICT item 5).

pss_floquet used to raise NotImplementedError on T-line decks because
the monodromy re-propagation dropped the delay ring; now the ring slots
ride the shooting vector (sstate._split dmax) and the monodromy is the
full discretized-DDE state map.  Anchors: the dominant multiplier must
match the DIRECTLY OBSERVED per-period contraction of a perturbed orbit,
and a matched line (both reflection coefficients zero) must carry only
near-zero ring modes."""

import jax
import jax.numpy as jnp
import numpy as np

from circuitsimulator_tpu import Simulator
from circuitsimulator_tpu.analysis.sstate import steady_state, _dyn_mask
from circuitsimulator_tpu.analysis.oscnoise import (pss_floquet,
                                                    _step_with_injection)
from circuitsimulator_tpu.analysis.sstate import osc_engine

F0 = 20e6


def _deck(rl):
    return (f"V1 src 0 SIN 0 1 {F0}\n"
            "Rs src in 10\n"
            "T1 in 0 out 0 Z0=50 TD=7n\n"
            f"RL out 0 {rl}\n"
            "C1 out 0 30p\n"
            f".hb {F0} 4\n")


def test_pss_floquet_tline_matches_observed_decay():
    sim = Simulator.from_text(_deck(200))
    ss = steady_state(sim.engine, sim.params, F0, steps_per_period=128)
    assert bool(ss.converged)
    fl = pss_floquet(sim.engine, sim.params, ss)
    assert fl.closure < 1e-6
    assert fl.stable
    assert 0.0 < fl.lambda_max < 1.0

    # the multiplier count is the FULL discretized-DDE state dimension
    # (node/branch + cap/ind slots + the delay ring)
    eng = osc_engine(sim.engine)
    K = int(np.asarray(ss.times).shape[0]) - 1
    dt = (1.0 / F0) / K
    dmax = int(eng.tl_ticks(jnp.asarray(dt, eng.dtype)).max())
    assert dmax > 0
    n_s = int(_dyn_mask(eng, sim.params, dmax).sum())
    assert len(np.asarray(fl.multipliers)) == n_s

    # direct anchor: perturb the PSS and watch the per-period
    # contraction through the actual nonlinear step map — it must
    # approach lambda_max once the dominant mode wins
    step = _step_with_injection(eng, sim.params,
                                jnp.asarray(dt, eng.dtype), dmax=dmax)
    ts = jnp.arange(1, K + 1, dtype=eng.dtype) * dt
    zero = jnp.zeros((eng.N,), eng.dtype)

    def period(s):
        def body(c, t):
            return step(c, t, zero), None
        return jax.lax.scan(body, s, ts)[0]

    period_j = jax.jit(period)
    s0 = jnp.asarray(ss.s, eng.dtype)
    rng = np.random.default_rng(0)
    pert = rng.standard_normal(s0.shape) * 1e-4
    sp = s0 + jnp.asarray(pert, eng.dtype)
    # propagate the UNPERTURBED orbit alongside: differencing against it
    # (not against the fixed s0) cancels the ~closure-sized fixed-point
    # drift that otherwise floors the decay measurement
    sref = s0
    ratios = []
    prev = float(jnp.linalg.norm(sp - sref))
    for _ in range(4):
        sp = period_j(sp)
        sref = period_j(sref)
        cur = float(jnp.linalg.norm(sp - sref))
        ratios.append(cur / prev)
        prev = cur
    # after a few periods the contraction settles on the dominant
    # multiplier (20% headroom: the perturbation mixes modes)
    np.testing.assert_allclose(ratios[-1], fl.lambda_max, rtol=0.2)


def test_pss_floquet_tline_matched_ring_modes_vanish():
    # Z0-matched load AND source: both reflection coefficients ~0, so a
    # wave launched into the line never returns — every ring mode's
    # multiplier is (near) zero and the survivors are the lumped RC
    # poles
    deck = (f"V1 src 0 SIN 0 1 {F0}\n"
            "Rs src in 50\n"
            "T1 in 0 out 0 Z0=50 TD=7n\n"
            "RL out 0 50\n"
            "C1 out 0 5p\n"
            f".hb {F0} 4\n")
    sim = Simulator.from_text(deck)
    ss = steady_state(sim.engine, sim.params, F0, steps_per_period=128)
    assert bool(ss.converged)
    fl = pss_floquet(sim.engine, sim.params, ss)
    assert fl.stable
    mags = np.sort(np.abs(np.asarray(fl.multipliers)))[::-1]
    # the RC corner at out: R_th ~ 25 ohm || .. with C=5p -> far sub-ns
    # settling, so even the lumped poles are tiny over a 50 ns period;
    # ALL multipliers must be deeply contractive
    assert mags[0] < 0.2
    # and the ring slots contribute only near-zero modes (no spurious
    # |lambda| ~ 1 from the matched line)
    assert np.median(mags) < 1e-3
