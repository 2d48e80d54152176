"""Batched (Monte-Carlo / power-sweep) RF analyses on the lane axis:
hot S-parameters (analysis/psp.periodic_s_parameters_batched) and
large-signal S-parameters (Simulator.lssp_batched) — the batch-axis
treatment harmonic_balance_batched gives HB, extended to the newest RF
analyses so they ride the repo's Monte-Carlo performance story instead
of looping per-lane host solves.

Anchors: identical lanes reproduce the host-path results exactly (same
math, real-block vs complex LU); perturbed lanes match per-lane host
re-runs; a power sweep in one dispatch reproduces per-power host calls.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from circuitsimulator_tpu import Simulator

F0 = 10e6

MIXER = f"""* up-converter (test_psp.py closed-form deck)
VLO lo 0 SIN 0 0.4 {F0}
RLO lo 0 1k
R1 rf 0 100
R2 if 0 130
B1 0 if I=v(rf)*v(lo)
.hb {F0} 5
"""

INNER = """R3 p1 p2 100
RL p2 0 200
C2 p2 0 1n
"""

LSSP_LINEAR = f"""* lssp linear two-port
V1 s1 0 SIN 0 1 {F0}
RS1 s1 p1 50
V2 s2 0 SIN 0 1 {F0}
RS2 s2 p2 50
{INNER}.hb {F0} 4
"""

LSSP_COMP = f"""* lssp compressive
V1 s1 0 SIN 0 1 {F0}
RS1 s1 p1 50
V2 s2 0 SIN 0 1 {F0}
RS2 s2 p2 50
{INNER}B1 p2 0 I=0.5*v(p2)^3
.hb {F0} 6
"""


def _stack_lanes(params, n):
    return jax.tree.map(lambda x: jnp.stack([jnp.asarray(x)] * n), params)


# ---------------------------------------------------------------------
# batched hot S-params
# ---------------------------------------------------------------------

def test_psp_batched_matches_host_per_lane():
    """Two lanes — nominal and an R1/R2-perturbed one — through the
    batched path must match per-lane host periodic_s_parameters runs."""
    from circuitsimulator_tpu.analysis.psp import (
        periodic_s_parameters, periodic_s_parameters_batched)
    sim = Simulator.from_text(MIXER)
    ports_eqs = None
    deltas = [1.3e5, 3.1e5]

    bp = _stack_lanes(dict(sim.params), 2)
    bp["res_r"] = bp["res_r"].at[1].multiply(
        jnp.asarray([1.0, 1.1, 0.9]))       # RLO, R1, R2 order of lowering

    # per-lane host references (each around its own PSS)
    dump = sim.topo.n_unknowns

    def node_eq(name):
        return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index
    port_eqs = [(node_eq("rf"), dump), (node_eq("if"), dump)]
    z0s = [50.0, 50.0]

    from circuitsimulator_tpu.analysis.hb import harmonic_balance
    xs = []
    hosts = []
    for lane in range(2):
        p = jax.tree.map(lambda x: x[lane], bp)
        res = harmonic_balance(sim.engine, p, F0, n_harm=5)
        assert bool(res.converged)
        xs.append(np.asarray(res.xs))
        hosts.append(periodic_s_parameters(sim.engine, p, F0, res.xs,
                                           port_eqs, z0s, deltas,
                                           n_sidebands=1))

    bres = periodic_s_parameters_batched(
        sim.engine, bp, F0, jnp.asarray(np.stack(xs)), port_eqs, z0s,
        deltas, n_sidebands=1)
    assert bres.s.shape == (2, 2, 6, 6)
    for lane in range(2):
        np.testing.assert_allclose(bres.s[lane], hosts[lane].s,
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(bres.z[lane], hosts[lane].z,
                                   rtol=1e-8, atol=1e-8)
    # the perturbed lane is measurably different
    assert np.max(np.abs(bres.s[1] - bres.s[0])) > 1e-3


def test_psp_batched_closed_form_conversion():
    """The batched path preserves the multiplier's closed-form
    conversion impedance |Z_conv| = R1*R2*A/2 on every lane."""
    from circuitsimulator_tpu.analysis.psp import (
        periodic_s_parameters_batched)
    from circuitsimulator_tpu.analysis.hb import harmonic_balance_batched
    sim = Simulator.from_text(MIXER)
    B = 3
    bp = _stack_lanes(dict(sim.params), B)
    pss = harmonic_balance_batched(sim.engine, bp, F0, n_harm=5)
    assert bool(np.all(pss.converged))
    dump = sim.topo.n_unknowns

    def node_eq(name):
        return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index
    res = periodic_s_parameters_batched(
        sim.engine, bp, F0, pss.xs,
        [(node_eq("rf"), dump), (node_eq("if"), dump)], [50.0, 50.0],
        [2.3e5], n_sidebands=1)
    zc = 100.0 * 130.0 * 0.4 / 2.0
    i_up, j_in = res.index(1, 1), res.index(0, 0)
    for lane in range(B):
        assert abs(res.z[lane, 0, i_up, j_in]) == pytest.approx(zc,
                                                                rel=1e-6)


def test_monte_carlo_psp_api():
    deck = MIXER.replace("R1 rf 0 100", "R1 rf 0 100 DEV=5%")
    sim = Simulator.from_text(deck)
    bp, res = sim.monte_carlo_psp(4, [("rf", None, 50.0),
                                      ("if", None, 50.0)],
                                  deltas=[2.3e5], seed=1)
    assert res.s.shape == (4, 1, 6, 6)
    gains = np.abs(res.s_at(1, 1, 0, 0)[:, 0])
    assert np.std(gains) > 1e-4          # the DEV= spread is visible
    assert np.all(np.isfinite(gains))


def test_psp_batched_tline_builds():
    """T-line decks used to raise NotImplementedError here; since r5 the
    traced delay blocks ride the batched LPTV systems (full host parity
    anchored in tests/test_pac_tline_batched.py)."""
    net = f"""* delay line deck
VLO lo 0 SIN 0 0.4 {F0}
RLO lo 0 1k
T1 lo 0 rf 0 Z0=50 TD=10n
R1 rf 0 100
.hb {F0} 5
"""
    sim = Simulator.from_text(net)
    from circuitsimulator_tpu.analysis.psp import make_psp_batched_fn
    lane = make_psp_batched_fn(sim.engine, F0, 11, [(0, sim.engine.N)],
                               np.arange(-1, 2), [1e5])
    assert callable(lane)


# ---------------------------------------------------------------------
# batched large-signal S-params
# ---------------------------------------------------------------------

def test_lssp_batched_matches_host():
    sim = Simulator.from_text(LSSP_LINEAR)
    ports = [("V1", "p1", 50.0), ("V2", "p2", 50.0)]
    host = sim.lssp(ports, power=1e-3)
    out = sim.lssp_batched(ports, powers=[1e-3])
    assert out["s"].shape == (1, 1, 2, 2)
    assert np.all(out["converged"])
    np.testing.assert_allclose(out["s"][0, 0], host["s"],
                               rtol=1e-7, atol=1e-10)


def test_lssp_batched_power_sweep_compression():
    """One dispatch over the whole power sweep reproduces per-power host
    lssp calls — the compression curve (P1dB-style) in one program."""
    sim = Simulator.from_text(LSSP_COMP)
    ports = [("V1", "p1", 50.0), ("V2", "p2", 50.0)]
    powers = [1e-7, 1e-3, 3e-2]
    out = sim.lssp_batched(ports, powers=powers)
    assert out["s"].shape == (1, 3, 2, 2)
    assert np.all(out["converged"])
    for ip, pw in enumerate(powers):
        host = sim.lssp(ports, power=pw)
        np.testing.assert_allclose(out["s"][0, ip], host["s"],
                                   rtol=1e-6, atol=1e-9)
    g = np.abs(out["s"][0, :, 1, 0])
    assert g[2] < 0.9 * g[0]             # gain compresses with drive


def test_monte_carlo_lssp_api():
    deck = LSSP_LINEAR.replace("RL p2 0 200", "RL p2 0 200 DEV=10%")
    sim = Simulator.from_text(deck)
    ports = [("V1", "p1", 50.0), ("V2", "p2", 50.0)]
    bp, out = sim.monte_carlo_lssp(6, ports, powers=[1e-3], seed=3)
    assert out["s"].shape == (6, 1, 2, 2)
    assert np.all(out["converged"])
    s21 = np.abs(out["s"][:, 0, 1, 0])
    assert np.std(s21) > 1e-4            # the DEV= spread is visible
