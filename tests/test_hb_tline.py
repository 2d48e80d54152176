"""Frequency-domain HB with transmission lines (hb._tl_hb_terms): the
delay is EXACT in the harmonic space (band-limited shift operators, the
multi-harmonic generalization of ac.py's e^{-jwTD} phase factor).
Cross-checked against the independently validated AC stamps
(tests/test_tline.py), closed forms, the time-domain shooting method,
and finite differences through full HB re-solves."""

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator
from circuitsimulator_tpu.analysis.hb import harmonic_balance
from circuitsimulator_tpu.analysis.hb_diff import (hb_gradient,
                                                   fundamental_metric)


def node_eq(sim, name):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index


def test_hb_tline_fundamental_matches_ac():
    # MISmatched load -> standing wave; the HB fundamental transfer must
    # equal the AC phasor solution at f0 (same linear system, two
    # independently implemented stamp paths)
    f0 = 25e6
    deck = (f"V1 src 0 AC 1 SIN 0 1 {f0}\n"
            "Rs src in 50\n"
            "T1 in 0 out 0 Z0=50 TD=7n\n"
            "RL out 0 200\n"
            f".hb {f0} 5\n"
            f".AC lin 1 {f0} {f0}\n")
    sim = Simulator.from_text(deck)
    r = harmonic_balance(sim.engine, sim.params, f0, n_harm=5)
    assert bool(r.converged)
    assert float(r.residual) < 1e-10
    spec = np.asarray(r.spectrum)
    e_in, e_out = node_eq(sim, "in"), node_eq(sim, "out")
    acres = sim.ac()
    xs = np.asarray(acres.xs)
    # transfer ratios are phase-convention-free (SIN vs cos reference)
    h_hb = spec[1, e_out] / spec[1, e_in]
    h_ac = xs[0, e_out] / xs[0, e_in]
    assert abs(h_hb - h_ac) < 1e-9
    # linear deck: no spurious harmonics, and DC is zero
    assert np.abs(spec[2:, :]).max() < 1e-10
    assert np.abs(spec[0, :]).max() < 1e-10


def test_hb_tline_quarter_wave_transformer():
    # at f0 = 1/(4 TD) the Z0=100 line transforms RL=50 -> Zin=200, so
    # with Rs=200 the input fundamental is half the drive amplitude
    f0 = 1e8
    deck = (f"V1 src 0 SIN 0 1 {f0}\n"
            "Rs src in 200\n"
            "T1 in 0 out 0 Z0=100 TD=2.5n\n"
            "RL out 0 50\n"
            f".hb {f0} 4\n")
    sim = Simulator.from_text(deck)
    r = harmonic_balance(sim.engine, sim.params, f0, n_harm=4)
    assert bool(r.converged)
    vin = np.asarray(r.spectrum)[1, node_eq(sim, "in")]
    assert abs(vin) == pytest.approx(0.5, rel=1e-9)


def test_hb_tline_nonlinear_vs_shooting():
    # a diode clipper at the far end of a mismatched line: compare HB
    # against the time-domain shooting PSS (Branin delay ring).  TD is an
    # exact multiple of the shooting dt so the ring is tick-exact; the
    # remaining gap is the shooting method's O(dt) BE damping.
    f0 = 1e8   # T = 10 ns
    deck = (f"V1 src 0 SIN 0 1.5 {f0}\n"
            "Rs src in 50\n"
            "T1 in 0 out 0 Z0=50 TD=2.5n\n"
            "RL out 0 150\n"
            "D1 out 0 1\n"
            ".MODEL 1 IS 1e-12\n"
            f".hb {f0} 9\n")
    sim = Simulator.from_text(deck)
    r = harmonic_balance(sim.engine, sim.params, f0, n_harm=9)
    assert bool(r.converged)
    assert float(r.residual) < 1e-8
    pss = sim.steady_state(steps_per_period=400, warmup_periods=8)
    assert bool(pss.converged)
    e_out = node_eq(sim, "out")
    t_pss = np.asarray(pss.times)
    v_pss = np.asarray(pss.xs)[:, e_out]
    # reconstruct the HB waveform at the shooting sample times
    spec = np.asarray(r.spectrum)[:, e_out]
    w0 = 2 * np.pi * f0
    v_hb = np.real(sum(c * np.exp(1j * k * w0 * t_pss)
                       for k, c in enumerate(spec)))
    # clipping confirms the nonlinearity engaged (diode pins ~0.6 V while
    # the negative swing goes well below -0.8 V)
    assert v_hb.max() < 0.75 and v_hb.min() < -0.8
    assert np.abs(v_hb - v_pss).max() < 3e-2
    # and the even/odd harmonic mix of a one-sided clipper is present
    assert abs(spec[2]) > 1e-3


def test_hb_tline_gradient_td_matches_fd():
    # d|fundamental|/d(TD) by the implicit adjoint vs central differences
    # through full HB re-solves — the delay enters only via _tl_hb_terms'
    # cos() terms, so this pins the differentiability of the shift operator.
    # BOTH ends must be mismatched: with Rs = Z0 there is no re-reflection
    # and |V_out| is exactly TD-independent (only the phase moves).
    f0 = 25e6
    deck = (f"V1 src 0 SIN 0 1 {f0}\n"
            "Rs src in 10\n"
            "T1 in 0 out 0 Z0=50 TD=7n\n"
            "RL out 0 200\n"
            f".hb {f0} 5\n")
    sim = Simulator.from_text(deck)
    m = fundamental_metric(node_eq(sim, "out"))
    val, grads = hb_gradient(sim.engine, sim.params, f0, 5, m)
    assert val > 0.1
    g_td = float(np.asarray(grads["tl_td"])[0])

    def fund_of(p):
        res = harmonic_balance(sim.engine, p, f0, n_harm=5)
        return float(np.abs(res.spectrum[1][node_eq(sim, "out")]))

    h = 1e-11
    p1 = dict(sim.params); p1["tl_td"] = sim.params["tl_td"] + h
    p2 = dict(sim.params); p2["tl_td"] = sim.params["tl_td"] - h
    fd = (fund_of(p1) - fund_of(p2)) / (2 * h)
    assert g_td == pytest.approx(fd, rel=1e-3)
    assert abs(g_td) > 1e5   # the standing wave really moves with TD


def test_pac_tline_linear_matches_ac():
    # LTI deck with a line: the m=0 PAC sideband must equal plain .AC at
    # the offset frequency — this pins the e^{-j2πδτ} envelope phasing of
    # the delayed blocks in pac._lptv_at (δ deliberately incommensurate
    # with both f0 and 1/TD)
    f0 = 20e6
    d = 4.3e6
    deck = (f"Vlo lo 0 SIN 0 0 {f0}\n"
            "Rlo lo 0 1k\n"
            "V1 src 0 DC 0 AC 1\n"
            "Rs src in 10\n"
            "T1 in 0 out 0 Z0=50 TD=7n\n"
            "RL out 0 200\n"
            f".hb {f0} 4\n"
            f".AC lin 1 {d} {d}\n")
    sim = Simulator.from_text(deck)
    res = sim.pac(deltas=[d])
    out = node_eq(sim, "out")
    m0 = list(res.harmonics).index(0)
    got = res.spectrum[0, m0, out]
    expect = np.asarray(sim.ac().xs)[0, out]
    assert got == pytest.approx(expect, rel=1e-6)
    # LTI: no conversion to other sidebands
    for j, m in enumerate(res.harmonics):
        if m != 0:
            assert abs(res.spectrum[0, j, out]) < 1e-10


def test_pnoise_tline_reduces_to_stationary():
    # quiescent LTI deck: periodic noise must equal the stationary .NOISE
    # adjoint PSD at every offset (thermal sources through the line)
    f0 = 20e6
    deck = (f"Vlo lo 0 SIN 0 0 {f0}\n"
            "Rlo lo 0 1k\n"
            "V1 src 0 DC 1\n"
            "Rs src in 10\n"
            "T1 in 0 out 0 Z0=50 TD=7n\n"
            "RL out 0 200\n"
            f".hb {f0} 4\n")
    sim = Simulator.from_text(deck)
    offs = [1e6, 5.5e6, 31e6]
    pn = sim.pnoise(deltas=offs, out_node="out")
    nres = sim.noise(freqs=offs, out_node="out")
    np.testing.assert_allclose(pn.onoise, np.asarray(nres.onoise),
                               rtol=1e-6)
    assert pn.onoise[0] > 1e-19   # the generators actually contribute


def test_hbmulti_tline_matches_brute_force():
    # commensurate two-tone drive through a mismatched line into a cubic:
    # the MPDE grid solution must agree with brute-force single-tone HB at
    # the common fundamental (two independent formulations; the line's
    # delay is the kron of per-axis shifts in hbmulti.tl_parts)
    deck = ("V1 s1 0 SIN 0 0.4 40e6\n"
            "R1 s1 in 25\n"
            "V2 s2 0 SIN 0 0.3 30e6\n"
            "R2 s2 in 25\n"
            "T1 in 0 out 0 Z0=50 TD=6n\n"
            "RL out 0 130\n"
            "By y 0 V=v(out)+0.2*v(out)^3\n"
            "Ry y 0 1k\n"
            ".hb 10e6 20\n")
    sim = Simulator.from_text(deck)
    from circuitsimulator_tpu.analysis.hbmulti import (
        harmonic_balance_multi, coeff)
    rm = harmonic_balance_multi(sim.engine, sim.params,
                                [(40e6, 4), (30e6, 3)])
    assert bool(rm.converged)
    r1 = harmonic_balance(sim.engine, sim.params, 10e6, n_harm=20)
    assert bool(r1.converged)
    y = node_eq(sim, "y")
    spec1 = np.asarray(r1.spectrum)[:, y]
    # tones (40, 30 MHz), IM3 (2f1-f2 = 50), IM2-sum (f1+f2 = 70):
    # single-tone spectrum is one-sided (2x the two-sided grid coeff)
    for ks, idx in (((1, 0), 4), ((0, 1), 3), ((2, -1), 5), ((1, 1), 7)):
        cm = coeff(rm, ks)[y]
        assert 2 * abs(cm) == pytest.approx(abs(spec1[idx]),
                                            rel=2e-3, abs=1e-9), (ks, idx)
    # the odd-order product really survives the line round trip
    assert 2 * abs(coeff(rm, (2, -1))[y]) > 1e-4


@pytest.mark.parametrize("seed", range(6))
def test_hb_tline_fuzz_vs_ac(seed):
    # random linear T-line networks: the HB fundamental transfer must
    # equal the AC phasor at f0 for every node — structural guard on the
    # shift-operator stamps under arbitrary wiring
    rng = np.random.default_rng(seed)
    f0 = float(rng.uniform(5e6, 50e6))
    z0 = float(rng.uniform(25, 120))
    td = float(rng.uniform(1e-9, 20e-9))
    rs = float(rng.uniform(5, 300))
    rl = float(rng.uniform(5, 500))
    rmid = float(rng.uniform(50, 2000))
    cpar = float(rng.uniform(0.1e-12, 5e-12))
    lines = [f"V1 src 0 AC 1 SIN 0 1 {f0}",
             f"Rs src in {rs}",
             f"T1 in 0 out 0 Z0={z0} TD={td}",
             f"RL out 0 {rl}",
             f"Rm out mid {rmid}",
             f"Cp mid 0 {cpar}"]
    if seed % 2:
        td2 = float(rng.uniform(1e-9, 20e-9))
        lines += [f"T2 mid 0 far 0 Z0={z0} TD={td2}",
                  f"Rf far 0 {rl}"]
    deck = "\n".join(lines) + f"\n.hb {f0} 3\n.AC lin 1 {f0} {f0}\n"
    sim = Simulator.from_text(deck)
    r = harmonic_balance(sim.engine, sim.params, f0, n_harm=3)
    assert bool(r.converged), (seed, float(r.residual))
    spec = np.asarray(r.spectrum)
    xs = np.asarray(sim.ac().xs)[0]
    e_src = node_eq(sim, "src")
    for name in ("in", "out", "mid") + (("far",) if seed % 2 else ()):
        e = node_eq(sim, name)
        h_hb = spec[1, e] / spec[1, e_src]
        h_ac = xs[e] / xs[e_src]
        assert abs(h_hb - h_ac) < 1e-8, (seed, name)
    assert np.abs(spec[2:, :]).max() < 1e-8, seed
