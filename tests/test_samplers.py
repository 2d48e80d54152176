"""Variance-reduction sampling plans for Monte Carlo (normal_draws).

The reference runs plain per-process Monte Carlo; here the batched lanes
let stratified plans (Latin hypercube, scrambled Sobol, antithetic
pairs) cut the estimator variance at the same lane count — the draws
share marginals with plain MC, only the joint layout differs.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from circuitsimulator_tpu import Simulator
from circuitsimulator_tpu.parallel.montecarlo import (
    normal_draws, perturb_params, perturb_params_netlist)


def _cdf(z):
    from scipy.stats import norm
    return norm.cdf(z)


def test_lhs_stratification():
    # every dimension puts exactly one lane in each of the B equiprobable
    # strata of the normal CDF — the defining Latin-hypercube property
    B, D = 64, 5
    z = np.asarray(normal_draws(jax.random.key(0), B, D, "lhs"))
    assert z.shape == (B, D)
    strata = np.floor(_cdf(z) * B).astype(int)
    for d in range(D):
        assert sorted(strata[:, d]) == list(range(B)), d


def test_antithetic_pairs():
    B, D = 32, 3
    z = np.asarray(normal_draws(jax.random.key(1), B, D, "antithetic"))
    np.testing.assert_allclose(z[:16], -z[16:], atol=0)
    # odd batch still works and keeps N(0,1) marginals
    z = np.asarray(normal_draws(jax.random.key(1), 33, D, "antithetic"))
    assert z.shape == (33, D)


def test_sobol_deterministic_and_balanced():
    B, D = 256, 3
    z1 = np.asarray(normal_draws(jax.random.key(2), B, D, "sobol"))
    z2 = np.asarray(normal_draws(jax.random.key(2), B, D, "sobol"))
    np.testing.assert_array_equal(z1, z2)          # seeded from the key
    z3 = np.asarray(normal_draws(jax.random.key(3), B, D, "sobol"))
    assert np.abs(z1 - z3).max() > 1e-3            # scramble differs
    # low-discrepancy: batch means far tighter than the 1/sqrt(B) MC law
    assert np.abs(z1.mean(axis=0)).max() < 0.02
    assert np.abs(z1.std(axis=0) - 1).max() < 0.05


def test_unknown_sampler_raises():
    with pytest.raises(ValueError):
        normal_draws(jax.random.key(0), 8, 1, "qmc")


def test_mc_sampler_is_backcompat():
    # sampler="mc" must keep the historical per-name draws bit-for-bit
    params = {"res_r": jnp.asarray([1e3, 2e3]),
              "cap_c": jnp.asarray([1e-6])}
    a = perturb_params(params, jax.random.key(7), 16, {"res_r": 0.1})
    b = perturb_params(params, jax.random.key(7), 16, {"res_r": 0.1},
                       sampler="mc")
    np.testing.assert_array_equal(np.asarray(a["res_r"]),
                                  np.asarray(b["res_r"]))


@pytest.mark.parametrize("sampler", ["lhs", "sobol", "antithetic"])
def test_perturb_marginals(sampler):
    B = 512
    params = {"res_r": jnp.asarray([1e3, 2e3]),
              "cap_c": jnp.asarray([1e-6])}
    bp = perturb_params(params, jax.random.key(4), B, {"res_r": 0.05},
                        sampler=sampler)
    r = np.asarray(bp["res_r"])
    assert r.shape == (B, 2)
    assert np.all(r > 0)                           # lognormal positivity
    logs = np.log(r / np.asarray([1e3, 2e3]))
    assert np.abs(logs.mean(axis=0)).max() < 0.01
    assert np.abs(logs.std(axis=0) - 0.05).max() < 0.01
    # the two dimensions are distinct columns, not one shared draw
    assert np.abs(logs[:, 0] - logs[:, 1]).max() > 1e-4
    c = np.asarray(bp["cap_c"])
    assert np.all(c == c[0])                       # untol'd leaf untouched


@pytest.mark.parametrize("sampler", ["lhs", "antithetic"])
def test_netlist_sampler_lot_shared(sampler):
    # LOT-only resistors must stay matched within a lane under every plan
    params = {"res_r": jnp.asarray([1e3, 1e3])}
    tols = {"res_r": (jnp.asarray([0.0, 0.0]), jnp.asarray([0.1, 0.1]))}
    bp = perturb_params_netlist(params, jax.random.key(5), 64, tols,
                                sampler=sampler)
    r = np.asarray(bp["res_r"])
    np.testing.assert_allclose(r[:, 0], r[:, 1], rtol=1e-6)
    assert r[:, 0].std() > 10.0                    # lanes still spread


def test_lhs_variance_reduction():
    # mean of exp(sigma z) estimated at B=64: LHS replicates must beat
    # plain MC replicates on squared error vs the exact lognormal mean
    B, sig, reps = 64, 0.3, 24
    exact = float(np.exp(sig * sig / 2))

    def sq_err(sampler):
        errs = []
        for s in range(reps):
            z = normal_draws(jax.random.key(100 + s), B, 1, sampler)
            errs.append((float(jnp.exp(sig * z).mean()) - exact) ** 2)
        return float(np.mean(errs))

    assert sq_err("lhs") < 0.2 * sq_err("mc")


DECK = """* mc divider
V1 in 0 DC 1
R1 in out 1k DEV=5%
R2 out 0 1k DEV=5% LOT=2%
.op
"""


@pytest.mark.parametrize("sampler", ["lhs", "sobol", "antithetic"])
def test_monte_carlo_end_to_end(sampler):
    sim = Simulator.from_text(DECK)
    bp, xs = sim.monte_carlo(64, seed=1, sampler=sampler)
    out_eq = sim.circuit.nodes[sim.circuit.node_name_to_id["out"]].eq_index
    v = np.asarray(xs)[:, out_eq]
    assert abs(v.mean() - 0.5) < 0.01
    assert 0.002 < v.std() < 0.06
    assert len(np.unique(np.round(v, 9))) > 40


def test_cli_mc_sampler(tmp_path, capsys):
    from circuitsimulator_tpu.cli import main
    deck = tmp_path / "mc.sp"
    deck.write_text(DECK)
    out = tmp_path / "mc.csv"
    rc = main([str(deck), str(tmp_path / "t.csv"),
               "--run-mc", "32", "--run-mc-out", str(out),
               "--mc-sampler", "lhs"])
    assert rc == 0
    assert len(out.read_text().splitlines()) == 33
