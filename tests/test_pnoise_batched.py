"""Batched (Monte-Carlo) periodic noise: the adjoint LPTV solve as a
real 2KN block system on-device (analysis/pac.pnoise_batched) must match
the host pnoise path lane-for-lane."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from circuitsimulator_tpu import Simulator

RECT = """* driven diode rectifier w/ tolerances
Vin in 0 SIN 0 0.8 1e6
Rs in a 100 DEV=5%
D1 a out DMOD
Cl out 0 10n
Rl out 0 10k DEV=5%
.model DMOD D IS=1e-14
.hb 1e6 6
"""


def node_eq(sim, name):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index


def test_batched_pnoise_matches_host():
    from circuitsimulator_tpu.analysis.pac import pnoise, pnoise_batched
    sim = Simulator.from_text(RECT)
    f0 = 1e6
    deltas = [10e3, 100e3]
    pss = sim._pss_samples(sim.params, f0, None)
    host = pnoise(sim.engine, sim.params, f0, pss, deltas,
                  out_eq=node_eq(sim, "out"))
    # two identical lanes through the batched path
    bp = jax.tree.map(lambda x: jnp.stack([x, x]), sim.params)
    xs_b = jnp.stack([jnp.asarray(pss)] * 2)
    bres = pnoise_batched(sim.engine, bp, f0, xs_b, deltas,
                          out_eq=node_eq(sim, "out"))
    assert bres.onoise.shape == (2, 2)
    for lane in range(2):
        np.testing.assert_allclose(bres.onoise[lane], host.onoise,
                                   rtol=1e-8)
        for kind in host.by_kind:
            np.testing.assert_allclose(bres.by_kind[kind][lane],
                                       host.by_kind[kind], rtol=1e-8)
    # sanity: the rectifier's output noise is finite, positive, and has
    # both resistor and diode contributions
    assert np.all(host.onoise > 0)
    assert set(host.by_kind) >= {"R", "D"}


def test_monte_carlo_pnoise_end_to_end():
    sim = Simulator.from_text(RECT)
    bp, res = sim.monte_carlo_pnoise(4, deltas=[20e3], out_node="out",
                                     seed=3)
    assert res.onoise.shape == (4, 1)
    assert np.all(np.isfinite(res.onoise)) and np.all(res.onoise > 0)
    # perturbed lanes genuinely differ (DEV=5% on both resistors)
    assert np.std(res.onoise[:, 0]) > 0


def test_batched_pnoise_rejects_nonpositive_offsets():
    from circuitsimulator_tpu.analysis.pac import pnoise_batched
    sim = Simulator.from_text(RECT)
    bp = jax.tree.map(lambda x: jnp.stack([x]), sim.params)
    with pytest.raises(ValueError):
        pnoise_batched(sim.engine, bp, 1e6,
                       jnp.zeros((1, 7, sim.engine.N)), [0.0], out_eq=0)
