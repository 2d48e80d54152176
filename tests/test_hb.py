"""Harmonic-balance analysis: analytic checks and cross-validation against
the shooting method."""

import numpy as np
import jax.numpy as jnp
import pytest

from circuitsimulator_tpu.api import Simulator
from circuitsimulator_tpu.analysis.hb import (harmonic_balance,
                                              spectral_diff_matrix)
from circuitsimulator_tpu.utils.options import DEFAULT_OPTIONS


def test_spectral_diff_exact_for_bandlimited():
    T, K = 1.0, 9
    D = spectral_diff_matrix(K, T)
    t = np.arange(K) * T / K
    for k in (1, 2, 3):
        f = np.sin(2 * np.pi * k * t / T)
        df = 2 * np.pi * k / T * np.cos(2 * np.pi * k * t / T)
        np.testing.assert_allclose(D @ f, df, atol=1e-10)


def test_hb_linear_rc_matches_phasor():
    R, C, f0 = 1e3, 1e-9, 1e6
    sim = Simulator.from_text(
        f"V1 1 0 SIN 0 1 {f0}\nR1 1 2 {R}\nC1 2 0 {C}\n.hb {f0} 4\n")
    r = harmonic_balance(sim.engine, sim.params, f0, n_harm=4)
    assert bool(r.converged)
    assert float(r.residual) < 1e-12
    spec = np.asarray(r.spectrum)
    # transfer function = ratio of the fundamental coefficients (the source
    # drives sin, i.e. its own c_1 is -j — dividing removes the convention)
    h = spec[1, 1] / spec[1, 0]
    h_ref = 1 / (1 + 1j * 2 * np.pi * f0 * R * C)
    assert abs(h - h_ref) < 1e-10
    # no spurious harmonics in a linear circuit
    assert np.abs(spec[2:, :]).max() < 1e-12


def test_hb_rlc_inductor_branch():
    # series RL divider at f0: V(2)/V(1) = R2/(R2 + jwL) with R1 in front
    R1, L, f0 = 50.0, 1e-6, 5e6
    sim = Simulator.from_text(
        f"V1 1 0 SIN 0 1 {f0}\nR1 1 2 {R1}\nL1 2 3 {L}\nR2 3 0 {R1}\n"
        f".hb {f0} 3\n")
    r = harmonic_balance(sim.engine, sim.params, f0, n_harm=3)
    assert bool(r.converged)
    spec = np.asarray(r.spectrum)
    jwl = 1j * 2 * np.pi * f0 * L
    h_ref = R1 / (2 * R1 + jwl)
    h = spec[1, 2] / spec[1, 0]     # node 3 over node 1
    assert abs(h - h_ref) < 1e-9


@pytest.fixture(scope="module")
def inverter():
    text = (".MODEL 2 VT 0.4 MU 1e-2 COX 1e-3 LAMBDA 0.05 CJ0 1e-13\n"
            "VDD 1 0 3\nVin 2 0 SIN 1 0.5 1e8\nRD 1 3 1k\n"
            "M1 3 2 0 n 10e-6 1e-6 2\nC1 3 0 2e-13\n.hb 1e8 6\n")
    return Simulator.from_text(text)


def test_hb_nonlinear_matches_shooting(inverter):
    sim = inverter
    hb = harmonic_balance(sim.engine, sim.params, 1e8, n_harm=6,
                          warmup_periods=6)
    assert bool(hb.converged)
    pss = sim.steady_state(steps_per_period=400, warmup_periods=6)
    assert bool(pss.converged)
    s_hb = np.asarray(hb.spectrum)
    s_sh = np.asarray(pss.spectrum)
    eq = 2  # node 3
    # DC term and fundamental must agree; shooting uses Backward Euler at
    # 400 steps/period, whose 1st-order error dominates the comparison
    assert abs(s_hb[0, eq] - s_sh[0, eq]) < 5e-3
    assert abs(abs(s_hb[1, eq]) - abs(s_sh[1, eq])) < 5e-3
    # KCL residual of the HB solution is tiny (self-consistency)
    assert float(hb.residual) < 1e-9


def test_hb_dbmixer():
    """Full harmonic balance on dbmixer.sp (its .hb card: f0=100 MHz,
    50 harmonics -> a 101x31 = 3131-unknown spectral Newton system)."""
    sim = Simulator.from_file("tests/netlists/dbmixer.sp")
    hb = sim.harmonic_balance(warmup_periods=4, max_newton=20)
    assert bool(hb.converged)
    assert float(hb.residual) < 1e-10
    spec = np.asarray(hb.spectrum)
    eq102 = sim.topo.volt_col_eqs[sim.topo.volt_col_names.index("102")]
    mags = np.abs(spec[:, eq102])
    # Gilbert-cell physics: strong components at 2xLO (1.8 GHz, k=18) and
    # LO (900 MHz, k=9) on the drain node
    assert mags[18] > 0.03
    assert mags[9] > 0.02
    assert mags[0] > 2.5   # DC bias


def test_hb_residual_is_physical(inverter):
    # the returned waveform satisfies KCL when re-checked through an
    # independent path: currents through RD vs MOS current at node 3
    sim = inverter
    hb = harmonic_balance(sim.engine, sim.params, 1e8, n_harm=6)
    xs = np.asarray(hb.xs)
    v1, v2, v3 = xs[:, 0], xs[:, 1], xs[:, 2]
    i_rd = (v1 - v3) / 1e3
    # reconstruct MOS current + C1 current spectrally
    from circuitsimulator_tpu.models.mosfet import mos_linearize
    k = 1e-2 * 1e-3 * 10.0
    gd, gg, gs, cst = mos_linearize(
        jnp.asarray(0.4), jnp.asarray(k), jnp.asarray(0.05), jnp.asarray(1.0),
        jnp.asarray(v3), jnp.asarray(v2), jnp.zeros_like(v3))
    ids = np.asarray(gd * v3 + gg * v2 + cst)
    D = spectral_diff_matrix(len(v3), 1e-8)
    i_c = 2e-13 * (D @ v3) + 0.5 * 1e-13 * (D @ (v3 - v2))  # C1 + Cgd
    i_cdb = 1e-13 * (D @ v3)                                 # Cdb (to gnd)
    kcl = i_rd - ids - i_c - i_cdb
    np.testing.assert_allclose(kcl, 0.0, atol=1e-6)
