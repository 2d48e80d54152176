"""Batched mixer noise figure (analysis/pac.mixer_noise_figure_batched):
lane-for-lane parity with the host path and the ideal-multiplier closed
forms (3.01 dB SSB / 0 dB DSB)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from circuitsimulator_tpu import Simulator

MIX = """* multiplier mixer NF w/ tolerances
Vlo lo 0 SIN 0 1 1e6
Rlo lo 0 0.001
Vrf rfs 0 DC 0
Rs rfs rf 1k DEV=10%
Bmix out 0 V=v(rf)*v(lo)
Rout out 0 0.001
.hb 1e6 6
"""


def node_eq(sim, name):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index


def test_batched_mixer_nf_matches_host():
    from circuitsimulator_tpu.analysis.pac import (
        mixer_noise_figure, mixer_noise_figure_batched)
    sim = Simulator.from_text(MIX)
    pss = sim._pss_samples(sim.params, 1e6, None)
    out = node_eq(sim, "out")
    # Rs is resistor index 1 (Rlo first in element order)
    host_ssb = mixer_noise_figure(sim.engine, sim.params, 1e6, pss,
                                  25e3, out, 1)
    host_dsb = mixer_noise_figure(sim.engine, sim.params, 1e6, pss,
                                  25e3, out, 1, sidebands=(1, -1))
    bp = jax.tree.map(lambda x: jnp.stack([x, x]), sim.params)
    xs_b = jnp.stack([jnp.asarray(pss)] * 2)
    nf, on, sig = mixer_noise_figure_batched(
        sim.engine, bp, 1e6, xs_b, 25e3, out, 1)
    np.testing.assert_allclose(nf, host_ssb[0], rtol=1e-9)
    np.testing.assert_allclose(on, host_ssb[1], rtol=1e-9)
    nf2, _, _ = mixer_noise_figure_batched(
        sim.engine, bp, 1e6, xs_b, 25e3, out, 1, sidebands=(1, -1))
    np.testing.assert_allclose(nf2, host_dsb[0], rtol=1e-9)
    # closed forms hold per lane
    assert nf[0] == pytest.approx(10 * np.log10(2.0), abs=0.02)
    assert nf2[0] == pytest.approx(0.0, abs=0.02)


def test_monte_carlo_mixer_nf_end_to_end():
    sim = Simulator.from_text(MIX)
    bp, nf = sim.monte_carlo_mixer_noise_figure(
        4, "Rs", delta=25e3, out_node="out", seed=7)
    assert nf.shape == (4,)
    # the ideal multiplier's NF is source-R independent: every perturbed
    # lane still sits at the 3.01 dB SSB closed form
    np.testing.assert_allclose(nf, 10 * np.log10(2.0), atol=0.05)
