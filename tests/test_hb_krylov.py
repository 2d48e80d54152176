"""Matrix-free Newton-GMRES harmonic balance (analysis/hb.py
solver='gmres'): parity against the dense-Jacobian solver on every
device path the HB residual carries, plus a dense-infeasible-scale
smoke.  NEW WORK — the reference's steady-state module is an empty file
(/root/reference/src/sstateanalysis.cpp, SURVEY.md 2.13); the Krylov
variant is the Telichevesky/Kundert matrix-free HB scaling technique."""

import dataclasses

import numpy as np
import pytest

from circuitsimulator_tpu.api import Simulator
from circuitsimulator_tpu.analysis.hb import harmonic_balance
from circuitsimulator_tpu.utils.options import DEFAULT_OPTIONS

INV = (".MODEL 2 VT 0.4 MU 1e-2 COX 1e-3 LAMBDA 0.05 CJ0 1e-13\n"
       "VDD 1 0 3\nVin 2 0 SIN 1 0.5 1e8\nRD 1 3 1k\n"
       "M1 3 2 0 n 10e-6 1e-6 2\nC1 3 0 2e-13\nL1 3 4 1e-8\nR4 4 0 1k\n"
       ".hb 1e8 6\n")


def _both(sim, f0, n_harm, **kw):
    rd = harmonic_balance(sim.engine, sim.params, f0, n_harm=n_harm, **kw)
    rg = harmonic_balance(sim.engine, sim.params, f0, n_harm=n_harm,
                          solver="gmres", **kw)
    assert bool(rd.converged) and bool(rg.converged)
    d = np.abs(np.asarray(rd.spectrum) - np.asarray(rg.spectrum)).max()
    return rd, rg, d


@pytest.mark.smoke
def test_gmres_matches_dense_rectifier():
    sim = Simulator.from_text(
        "V1 in 0 SIN 0 1 1e6\nR1 in out 1k\nD1 out 0 1\n"
        ".MODEL 1 IS 1e-12\nRL out 0 1k\nC1 out 0 1e-10\n.hb 1e6 7\n")
    _, _, d = _both(sim, 1e6, 7)
    assert d < 1e-10


def test_gmres_matches_dense_mos_inductor():
    # MOS conduction + fixed lumps + explicit C and an inductor branch
    _, _, d = _both(Simulator.from_text(INV), 1e8, 6)
    assert d < 1e-9


def test_gmres_matches_dense_tline():
    # the delayed-wave S blocks enter J only through jax.jvp on the
    # residual (the preconditioner deliberately omits them)
    sim = Simulator.from_text(
        "V1 1 0 SIN 0 1 1e8\nR1 1 2 50\nT1 2 0 3 0 Z0=50 TD=2.5e-9\n"
        "D1 3 0 1\n.MODEL 1 IS 1e-12\nRL 3 0 120\n.hb 1e8 5\n")
    _, _, d = _both(sim, 1e8, 5)
    assert d < 1e-10


def test_gmres_matches_dense_charge_model():
    # mos_cap_model='charge': Cq_t rides the preconditioner average and
    # the D@q residual term rides the jvp
    opts = dataclasses.replace(DEFAULT_OPTIONS, mos_cap_model="charge")
    sim = Simulator.from_text(INV, opts=opts)
    _, _, d = _both(sim, 1e8, 6)
    assert d < 1e-9


def test_gmres_beyond_dense_scale():
    # 24-section nonlinear RC ladder at H=24: KN = 49*26 = 1274 — kept
    # CI-small, but exercises the restarted-GMRES + block-circulant
    # preconditioner loop at a size where the machinery matters
    lines = ["V1 1 0 SIN 0 2 1e6"]
    for i in range(1, 25):
        lines.append(f"R{i} {i} {i+1} 100")
        lines.append(f"C{i} {i+1} 0 1e-9")
        if i % 3 == 0:
            lines.append(f"D{i} {i+1} 0 1")
    lines += [".MODEL 1 IS 1e-12", ".hb 1e6 24"]
    sim = Simulator.from_text("\n".join(lines) + "\n")
    r = harmonic_balance(sim.engine, sim.params, 1e6, n_harm=24,
                         solver="gmres", max_newton=10, warmup_periods=3)
    assert bool(r.converged)
    assert float(r.residual) < 1e-6


def test_gmres_batched_matches_dense():
    # per-lane matrix-free Newton under vmap (Monte-Carlo HB)
    import jax
    from circuitsimulator_tpu.analysis.hb import harmonic_balance_batched
    from circuitsimulator_tpu.parallel.montecarlo import perturb_params
    sim = Simulator.from_text(
        "V1 in 0 SIN 0 1 1e6\nR1 in out 1k DEV=10%\nD1 out 0 1\n"
        ".MODEL 1 IS 1e-12\nRL out 0 1k\nC1 out 0 1e-10\n.hb 1e6 7\n")
    bp = perturb_params(sim.params, jax.random.key(7), 4, {"res_r": 0.01})
    rd = harmonic_balance_batched(sim.engine, bp, 1e6, n_harm=7)
    rg = harmonic_balance_batched(sim.engine, bp, 1e6, n_harm=7,
                                  solver="gmres")
    assert bool(np.all(np.asarray(rd.converged)))
    assert bool(np.all(np.asarray(rg.converged)))
    d = np.abs(np.asarray(rd.spectrum) - np.asarray(rg.spectrum)).max()
    assert d < 1e-10


def test_mt_basis_reconstruction():
    # half-space real DFT on the flattened 2-tone grid is a bijection
    from circuitsimulator_tpu.analysis.hbmulti import _mt_basis
    om, Fc, Fs, Ic, Is = _mt_basis([7, 5], [9e8, 8e8])
    assert len(om) == (35 - 1) // 2
    x = np.random.default_rng(0).standard_normal((35, 3))
    a, b = Fc @ x, Fs @ x
    np.testing.assert_allclose(Ic @ a + Is @ b, x, atol=1e-12)


def test_gmres_matches_dense_multitone():
    # two-tone diode detector: the preconditioner rows carry the
    # half-space mixing products k1*w1 + k2*w2 (some negative)
    from circuitsimulator_tpu.analysis.hbmulti import (
        harmonic_balance_multi)
    f1, f2 = 1e7, 2.3e7
    sim = Simulator.from_text(
        f"V1 in 0 SIN 0.4 0.35 {f1}\nV2 in2 0 SIN 0 0.25 {f2}\n"
        "R12 in2 in 500\nRs in a 100\nD1 a 0 IS=1e-12 N=1\n"
        "C1 a 0 20p\n")
    rd = harmonic_balance_multi(sim.engine, sim.params,
                                [(f1, 6), (f2, 6)], tol=1e-10)
    rg = harmonic_balance_multi(sim.engine, sim.params,
                                [(f1, 6), (f2, 6)], tol=1e-10,
                                solver="gmres")
    assert bool(rd.converged) and bool(rg.converged)
    d = np.abs(np.asarray(rd.spectrum) - np.asarray(rg.spectrum)).max()
    assert d < 1e-10


@pytest.mark.smoke
def test_gmres_matches_dense_oscillator():
    # bordered (KN+1) system: joint jvp through (X, f0), the anchor row
    # as border, identity-on-border preconditioner
    sim = Simulator.from_text(
        "L1 a 0 1u\nC1 a 0 1n\nRl a 0 2k\n"
        "Bneg a 0 I=-2m*v(a) + 0.5m*v(a)**3\n.op\n")
    rd = sim.oscillator_hb(f0_guess=5.0e6, anchor_node="a", n_harm=9)
    rg = sim.oscillator_hb(f0_guess=5.0e6, anchor_node="a", n_harm=9,
                           solver="gmres")
    assert bool(rd.converged) and bool(rg.converged)
    assert abs(rd.f0 - rg.f0) / rd.f0 < 1e-12
    d = np.abs(np.asarray(rd.spectrum) - np.asarray(rg.spectrum)).max()
    assert d < 1e-10


def test_unknown_solver_raises():
    sim = Simulator.from_text(
        "V1 1 0 SIN 0 1 1e6\nR1 1 0 1k\n.hb 1e6 3\n")
    with pytest.raises(ValueError, match="unknown HB solver"):
        harmonic_balance(sim.engine, sim.params, 1e6, n_harm=3,
                         solver="qr")
