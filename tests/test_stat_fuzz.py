"""Statistical-stack consistency fuzz: on random linear decks the
independent estimators must agree with each other — the linearized
budget with the Monte-Carlo spread, and FORM with mean-shifted
importance sampling — regardless of topology details."""

import math
import random

import numpy as np
import pytest
import jax

from circuitsimulator_tpu import Simulator


def _random_deck(rng: random.Random):
    """A random resistive ladder with a cap, probed mid-chain."""
    n = rng.randint(3, 5)
    lines = ["* stat fuzz", "V1 n0 0 DC 1"]
    for i in range(n):
        r = rng.choice([470, 1000, 2200, 4700])
        lines.append(f"R{i} n{i} n{i + 1} {r}")
    lines.append(f"RT n{n} 0 {rng.choice([1000, 3300])}")
    lines.append(f"C1 n{n} 0 1u")
    lines.append(".TRAN 5e-5 4e-3")
    probe = f"n{rng.randint(2, n)}"
    lines.append(f".MEASURE TRAN vend FIND V({probe}) AT=3.5e-3")
    return "\n".join(lines) + "\n.end\n", probe


@pytest.mark.parametrize("seed", range(3))
def test_budget_matches_mc_spread(seed):
    rng = random.Random(7100 + seed)
    text, probe = _random_deck(rng)
    sim = Simulator.from_text(text)
    sig = rng.choice([0.03, 0.05, 0.08])
    out = sim.mismatch_budget({"res_r": sig}, probe=probe, at=3.5e-3)
    assert abs(sum(s for _, _, s in out["contributions"]) - 1.0) < 1e-9
    from circuitsimulator_tpu.parallel.montecarlo import (
        perturb_params, batched_transient)
    bp = perturb_params(sim.params, jax.random.key(seed), 512,
                        {"res_r": sig}, sampler="lhs")
    res = batched_transient(sim.engine, bp, 5e-5, 4e-3)
    eqi = sim.circuit.nodes[sim.circuit.node_name_to_id[probe]].eq_index
    v = np.asarray(res.x_final)[:, eqi]
    assert v.std() == pytest.approx(out["sigma_m"], rel=0.15), text


@pytest.mark.parametrize("seed", range(2))
def test_form_matches_shifted_is(seed):
    rng = random.Random(9300 + seed)
    text, probe = _random_deck(rng)
    sim = Simulator.from_text(text)
    sig = 0.05
    # place a low-V spec ~2.5 sigma out using the budget's linearization
    b = sim.mismatch_budget({"res_r": sig}, probe=probe, at=3.5e-3)
    vc = b["m_nominal"] - 2.5 * b["sigma_m"]
    form = sim.worst_case({"res_r": sig}, probe=probe, at=3.5e-3, low=vc)
    assert form["converged"], text
    assert form["beta"] == pytest.approx(2.5, rel=0.1), text
    mc = sim.yield_analysis(jax.random.key(seed), 2048, {"res_r": sig},
                            {"vend": (vc, None)}, shift=form["z_star"])
    # the two independent rare-event estimators agree
    assert abs(mc["p_fail"] - form["p_fail"]) < max(
        3.5 * mc["p_fail_se"], 0.3 * form["p_fail"]), text
