"""Batched harmonic balance (hb.harmonic_balance_batched): B lanes of
the HB Newton solved as one vmapped program with per-lane freeze."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from circuitsimulator_tpu import Simulator
from circuitsimulator_tpu.analysis.hb import (harmonic_balance,
                                              harmonic_balance_batched)


def node_eq(sim, name):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index


RECT = """* diode rectifier with a toleranced series R
V1 in 0 SIN 0 1 1e6
R1 in out 1k DEV=10%
D1 out 0 1
.MODEL 1 IS 1e-12
RL out 0 1k
.hb 1e6 7
"""


def test_broadcast_batch_matches_single():
    sim = Simulator.from_text(RECT)
    r1 = harmonic_balance(sim.engine, sim.params, 1e6, n_harm=7)
    assert bool(r1.converged)
    bp = jax.tree_util.tree_map(
        lambda v: jnp.broadcast_to(v, (3,) + jnp.asarray(v).shape),
        sim.params)
    rb = harmonic_balance_batched(sim.engine, bp, 1e6, n_harm=7)
    assert bool(np.all(rb.converged))
    for lane in range(3):
        np.testing.assert_allclose(np.asarray(rb.xs)[lane],
                                   np.asarray(r1.xs), atol=1e-10)


def test_mc_hb_spread_and_nominal():
    sim = Simulator.from_text(RECT)
    bp, rb = sim.monte_carlo_hb(16, seed=3)
    assert bool(np.all(rb.converged))
    out = node_eq(sim, "out")
    fund = np.abs(np.asarray(rb.spectrum)[:, 1, out])
    # the 10% R tolerance really moves the fundamental, around nominal
    r1 = harmonic_balance(sim.engine, sim.params, 1e6, n_harm=7)
    nom = abs(np.asarray(r1.spectrum)[1, out])
    assert fund.std() / nom > 0.005
    assert np.median(fund) == pytest.approx(nom, rel=0.1)
    # rectification: every lane carries a DC component (the weakly-driven
    # diode shifts the mean by ~0.1-0.4 mV here)
    dc = np.abs(np.asarray(rb.spectrum)[:, 0, out])
    assert (dc > 1e-5).all()


def test_batched_tline_lanes_match_single():
    # per-lane T-line shift operators under vmap (tl_td/tl_z0 traced)
    deck = ("V1 src 0 SIN 0 1 25e6\n"
            "Rs src in 10\n"
            "T1 in 0 out 0 Z0=50 TD=7n\n"
            "RL out 0 200\n"
            "D1 out 0 1\n"
            ".MODEL 1 IS 1e-10\n"
            ".hb 25e6 5\n")
    sim = Simulator.from_text(deck)
    base = sim.params
    # three lanes with DIFFERENT delays — each must match its own single
    tds = np.asarray([6e-9, 7e-9, 8e-9])
    bp = jax.tree_util.tree_map(
        lambda v: jnp.broadcast_to(v, (3,) + jnp.asarray(v).shape), base)
    bp = dict(bp)
    bp["tl_td"] = jnp.asarray(tds)[:, None]
    rb = harmonic_balance_batched(sim.engine, bp, 25e6, n_harm=5)
    assert bool(np.all(rb.converged))
    for lane, td in enumerate(tds):
        p1 = dict(base)
        p1["tl_td"] = jnp.asarray([td], sim.engine.dtype)
        r1 = harmonic_balance(sim.engine, p1, 25e6, n_harm=5)
        assert bool(r1.converged)
        np.testing.assert_allclose(np.asarray(rb.xs)[lane],
                                   np.asarray(r1.xs), atol=1e-9)


def test_step_hb_sweep(tmp_path):
    # .STEP × .hb: the drive-amplitude sweep solves as one batched HB
    # program; each step point matches its own single solve, and the
    # CLI CSV carries fundamental + THD columns
    deck = (".PARAM amp=1\n"
            "V1 in 0 SIN 0 {amp} 1e6\n"
            "R1 in out 1k\n"
            "D1 out 0 1\n"
            ".MODEL 1 IS 1e-12\n"
            "RL out 0 1k\n"
            ".hb 1e6 7\n"
            ".STEP PARAM amp 0.5 1.5 0.5\n")
    sim = Simulator.from_text(deck)
    sres = sim.step()
    assert sres.analysis == "hb"
    assert list(np.round(np.asarray(sres.values), 6)) == [0.5, 1.0, 1.5]
    assert bool(np.all(sres.result.converged))
    out = node_eq(sim, "out")
    for b, amp in enumerate(sres.values):
        p1 = dict(sim.params)
        p1["vs_sin"] = sim.params["vs_sin"].at[0, 1].set(float(amp))
        r1 = harmonic_balance(sim.engine, p1, 1e6, n_harm=7)
        np.testing.assert_allclose(np.asarray(sres.result.xs)[b],
                                   np.asarray(r1.xs), atol=1e-9)
    # stronger drive clips harder: THD grows monotonically
    from circuitsimulator_tpu.analysis.step import write_step_csv
    csv = tmp_path / "step_hb.csv"
    write_step_csv(str(csv), sim.topo, sres)
    lines = csv.read_text().splitlines()
    assert "VM1(out)" in lines[0] and "THD(out)" in lines[0]
    col = lines[0].split(",").index("THD(out)")
    thds = [float(l.split(",")[col]) for l in lines[1:]]
    assert thds[0] < thds[1] < thds[2]


def test_lane_chunked_matches_unchunked(monkeypatch):
    """CSIM_HB_LANE_CHUNK: the lax.map lane-chunked program (device
    working-set bound for big-KN decks) must reproduce the plain vmap
    batch exactly — same jit, same per-lane trajectories."""
    sim = Simulator.from_text(RECT)
    bp, _ = sim.monte_carlo_hb(8, seed=5)
    rb0 = harmonic_balance_batched(sim.engine, bp, 1e6, n_harm=7)
    monkeypatch.setenv("CSIM_HB_LANE_CHUNK", "4")
    rb1 = harmonic_balance_batched(sim.engine, bp, 1e6, n_harm=7)
    assert bool(np.all(rb1.converged))
    np.testing.assert_allclose(np.asarray(rb1.xs), np.asarray(rb0.xs),
                               atol=1e-12)


def test_lane_chunked_nondivisor_pads(monkeypatch):
    """A non-divisor chunk must still chunk (pad + slice), not silently
    fall back to the whole-batch vmap the knob exists to avoid."""
    sim = Simulator.from_text(RECT)
    bp, _ = sim.monte_carlo_hb(6, seed=7)
    rb0 = harmonic_balance_batched(sim.engine, bp, 1e6, n_harm=7)
    monkeypatch.setenv("CSIM_HB_LANE_CHUNK", "4")
    rb1 = harmonic_balance_batched(sim.engine, bp, 1e6, n_harm=7)
    np.testing.assert_allclose(np.asarray(rb1.xs), np.asarray(rb0.xs),
                               atol=1e-12)
