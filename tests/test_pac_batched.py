"""Batched PAC/PXF (analysis/pac.pac_batched / pxf_batched): the
forward and adjoint LPTV solves as batched real-2KN systems must match
the host paths lane-for-lane — with pnoise_batched this completes the
batched periodic small-signal trio."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from circuitsimulator_tpu import Simulator

RECT = """* driven diode rectifier w/ tolerances
Vin in 0 SIN 0 0.8 1e6 AC 1
Rs in a 100 DEV=5%
D1 a out DMOD
Cl out 0 10n
Rl out 0 10k DEV=5%
Ib 0 a DC 0 AC 0.5
.model DMOD D IS=1e-14
.hb 1e6 6
"""


def node_eq(sim, name):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index


def _pss_and_lanes(sim, f0=1e6):
    pss = sim._pss_samples(sim.params, f0, None)
    bp = jax.tree.map(lambda x: jnp.stack([x, x]), sim.params)
    xs_b = jnp.stack([jnp.asarray(pss)] * 2)
    return pss, bp, xs_b


def test_batched_pac_matches_host():
    from circuitsimulator_tpu.analysis.pac import pac, pac_batched
    sim = Simulator.from_text(RECT)
    deltas = [15e3, 90e3]
    pss, bp, xs_b = _pss_and_lanes(sim)
    host = pac(sim.engine, sim.params, 1e6, pss, deltas, n_sidebands=2)
    bres = pac_batched(sim.engine, bp, 1e6, xs_b, deltas, n_sidebands=2)
    assert bres.spectrum.shape == (2,) + host.spectrum.shape
    for lane in range(2):
        np.testing.assert_allclose(bres.spectrum[lane], host.spectrum,
                                   rtol=1e-8, atol=1e-14)
    np.testing.assert_array_equal(bres.harmonics, host.harmonics)


def test_batched_pxf_matches_host():
    from circuitsimulator_tpu.analysis.pac import pxf, pxf_batched
    sim = Simulator.from_text(RECT)
    deltas = [25e3]
    out = node_eq(sim, "out")
    pss, bp, xs_b = _pss_and_lanes(sim)
    host = pxf(sim.engine, sim.params, 1e6, pss, deltas, out_eq=out,
               n_sidebands=2)
    bres = pxf_batched(sim.engine, bp, 1e6, xs_b, deltas, out_eq=out,
                       n_sidebands=2)
    for lane in range(2):
        np.testing.assert_allclose(bres.xf_v[lane], host.xf_v,
                                   rtol=1e-8, atol=1e-15)
        np.testing.assert_allclose(bres.xf_i[lane], host.xf_i,
                                   rtol=1e-8, atol=1e-15)


def test_monte_carlo_pac_pxf_end_to_end():
    sim = Simulator.from_text(RECT)
    bp, pr = sim.monte_carlo_pac(3, deltas=[20e3], seed=5,
                                 n_sidebands=1)
    assert pr.spectrum.shape[0] == 3
    assert np.all(np.isfinite(pr.spectrum))
    bp, xr = sim.monte_carlo_pxf(3, deltas=[20e3], out_node="out",
                                 seed=5, n_sidebands=1)
    assert xr.xf_v.shape[:2] == (3, 1)
    assert xr.v_names[0].lower() == "vin"
    assert np.all(np.isfinite(xr.xf_v))
    # perturbed lanes differ
    assert np.std(np.abs(xr.xf_v[:, 0, 1, 0])) > 0
