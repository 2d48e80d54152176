"""Batched LPTV analyses on transmission-line decks (r5: VERDICT item 5).

The batched pnoise/PAC/PXF/PSP kernels used to raise NotImplementedError
on T-line decks; now the traced delay blocks (pac.make_lptv_blocks_fn)
fold the offset-dependent phase e^{-j2πδτ} into the real 2KN systems.
Anchors: identical-lane batches must reproduce the HOST path (whose
T-line handling is itself anchored to .AC / stationary .NOISE in
tests/test_hb_tline.py) lane-for-lane."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from circuitsimulator_tpu import Simulator
from circuitsimulator_tpu.analysis.hb import harmonic_balance

F0 = 20e6
DELTAS = [1e6, 5.5e6]

DECK = (f"Vlo lo 0 SIN 0 0.5 {F0}\n"
        "Rlo lo 0 1k\n"
        "V1 src 0 DC 1 AC 1\n"
        "Rs src in 10\n"
        "T1 in 0 out 0 Z0=50 TD=7n\n"
        "RL out 0 200\n"
        f".hb {F0} 4\n")


def node_eq(sim, name):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index


@pytest.fixture(scope="module")
def tl_pss():
    sim = Simulator.from_text(DECK)
    r = harmonic_balance(sim.engine, sim.params, F0, n_harm=4)
    assert bool(r.converged)
    xs = jnp.asarray(r.xs)
    bp = jax.tree.map(lambda x: jnp.stack([x, x]), sim.params)
    xs_b = jnp.stack([xs, xs])
    return sim, xs, bp, xs_b


def test_pnoise_batched_tline_matches_host(tl_pss):
    from circuitsimulator_tpu.analysis.pac import pnoise, pnoise_batched
    sim, xs, bp, xs_b = tl_pss
    out = node_eq(sim, "out")
    host = pnoise(sim.engine, sim.params, F0, xs, DELTAS, out)
    bres = pnoise_batched(sim.engine, bp, F0, xs_b, DELTAS, out)
    for lane in range(2):
        np.testing.assert_allclose(bres.onoise[lane], host.onoise,
                                   rtol=1e-8)
        for k in host.by_kind:
            np.testing.assert_allclose(bres.by_kind[k][lane],
                                       host.by_kind[k], rtol=1e-8)
    assert host.onoise[0] > 1e-19


def test_pac_batched_tline_matches_host(tl_pss):
    from circuitsimulator_tpu.analysis.pac import pac, pac_batched
    sim, xs, bp, xs_b = tl_pss
    host = pac(sim.engine, sim.params, F0, xs, DELTAS)
    bres = pac_batched(sim.engine, bp, F0, xs_b, DELTAS)
    m_host = {int(m): j for j, m in enumerate(host.harmonics)}
    for j, m in enumerate(bres.harmonics):
        jh = m_host[int(m)]
        for lane in range(2):
            np.testing.assert_allclose(bres.spectrum[lane, :, j],
                                       host.spectrum[:, jh], rtol=1e-8,
                                       atol=1e-14)
    # the line actually moves signal: the m=0 sideband at the output is
    # nonzero
    out = node_eq(sim, "out")
    m0 = list(bres.harmonics).index(0)
    assert np.abs(bres.spectrum[0, :, m0, out]).max() > 1e-3


def test_pxf_batched_tline_matches_host(tl_pss):
    from circuitsimulator_tpu.analysis.pac import pxf, pxf_batched
    sim, xs, bp, xs_b = tl_pss
    out = node_eq(sim, "out")
    host = pxf(sim.engine, sim.params, F0, xs, DELTAS, out)
    bres = pxf_batched(sim.engine, bp, F0, xs_b, DELTAS, out)
    m_host = {int(m): j for j, m in enumerate(host.harmonics)}
    for j, m in enumerate(bres.harmonics):
        jh = m_host[int(m)]
        for lane in range(2):
            np.testing.assert_allclose(bres.xf_v[lane, :, j],
                                       host.xf_v[:, jh], rtol=1e-8,
                                       atol=1e-12)
            np.testing.assert_allclose(bres.xf_i[lane, :, j],
                                       host.xf_i[:, jh], rtol=1e-8,
                                       atol=1e-12)


def test_psp_batched_tline_matches_host(tl_pss):
    from circuitsimulator_tpu.analysis.psp import (
        periodic_s_parameters, periodic_s_parameters_batched)
    sim, xs, bp, xs_b = tl_pss
    gnd = sim.engine.N          # dump-slot convention (ground = N)
    ports = [(node_eq(sim, "in"), gnd), (node_eq(sim, "out"), gnd)]
    z0s = [50.0, 50.0]
    host = periodic_s_parameters(sim.engine, sim.params, F0, xs,
                                 ports, z0s, DELTAS)
    bres = periodic_s_parameters_batched(sim.engine, bp, F0, xs_b,
                                         ports, z0s, DELTAS)
    np.testing.assert_allclose(bres.s[0], host.s, rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(bres.s[1], host.s, rtol=1e-8, atol=1e-12)
