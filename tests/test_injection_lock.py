"""Injection locking from the oscillator PPV
(analysis/oscnoise.injection_lock).

Anchors:
1. the van der Pol LC tank's lock range per injected amp matches the
   sine-ISF closed form Δf/I = 1/(4π·A·C) (the ISF form of Adler's
   f0·I/(2Q·I_osc) law), with A the measured orbit amplitude;
2. brute-force time-domain arbitration: a SIN current injected INSIDE
   the predicted range entrains the transient oscillation to exactly
   f_inj, while 3x outside the range the oscillator stays unlocked and
   its mean frequency is pulled by ~sqrt(Δf² − Δf_lock²), not captured.
"""

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator, DEFAULT_OPTIONS


VDP = """* van der pol lc oscillator
L1 a 0 1u
C1 a 0 1n
Rl a 0 2k
Bneg a 0 I=-2m*v(a) + 0.5m*v(a)**3
.op
"""

C_TANK = 1e-9
AMP = 1e-3                  # 1 mA injection (~1.6% of the tank current)


@pytest.fixture(scope="module")
def lock():
    sim = Simulator.from_text(VDP)
    res = sim.oscillator(f0_guess=5e6, anchor_node="a",
                         steps_per_period=256, warmup_periods=40)
    assert res.converged
    il = sim.injection_lock("a", amp=AMP, osc=res)
    return sim, res, il


def test_lock_range_matches_isf_closed_form(lock):
    _, res, il = lock
    v = np.asarray(res.xs)[:, 0]
    A = 0.5 * (v.max() - v.min())
    assert il.k_per_amp == pytest.approx(1.0 / (4 * np.pi * A * C_TANK),
                                         rel=0.05)
    assert il.lock_range_hz == pytest.approx(il.k_per_amp * AMP)
    assert il.f0 == res.f0
    # the PPV projection is essentially a pure fundamental for the
    # near-sinusoidal orbit, so the lock range is a solid few-kHz band
    assert 0.004 < il.lock_range_hz / il.f0 < 0.012


def _mean_freq(sim, f_inj, n_periods=400, tail=200, spp=256):
    """Transient with the injection source; mean frequency of V(a) from
    interpolated upward zero crossings over the tail periods."""
    T = 1.0 / f_inj
    deck = (VDP.replace(".op\n", "")
            + f"Iinj a 0 SIN 0 {AMP} {f_inj}\n"
            + f".TRAN {T / spp} {n_periods * T}\n")
    s2 = Simulator.from_text(deck, opts=DEFAULT_OPTIONS.replace(
        tran_method="trap", tran_solver="lu", tran_tol=1e-9))
    r = s2.transient()
    eq = s2.circuit.nodes[s2.circuit.node_name_to_id["a"]].eq_index
    v = np.asarray(r.xs)[:, eq]
    t = np.asarray(r.times)
    sel = t > (n_periods - tail) * T
    v, t = v[sel], t[sel]
    up = np.nonzero((v[:-1] < 0) & (v[1:] >= 0))[0]
    tc = t[up] - v[up] * (t[up + 1] - t[up]) / (v[up + 1] - v[up])
    return (len(tc) - 1) / (tc[-1] - tc[0])


def test_brute_force_lock_and_escape(lock):
    sim, res, il = lock
    dl = il.lock_range_hz

    # inside the range (detuning = half the range): locked to f_inj
    f_in = res.f0 + 0.5 * dl
    f_meas = _mean_freq(sim, f_in)
    assert abs(f_meas - f_in) < 0.05 * dl

    # 3x outside: unlocked — mean frequency pulled toward but NOT equal
    # to f_inj; Adler predicts a mean offset sqrt(9-1)/3 = 0.94 of the
    # detuning (beat-window quantization keeps the band loose)
    f_out = res.f0 + 3.0 * dl
    f_meas2 = _mean_freq(sim, f_out)
    off = f_out - f_meas2
    assert 0.6 * 3.0 * dl < off < 1.2 * 3.0 * dl


def test_cli_lock(tmp_path, capsys):
    from circuitsimulator_tpu.cli import main
    deck = tmp_path / "vdp.sp"
    deck.write_text(VDP)
    rc = main([str(deck), "--no-tran", "--run-lock", "5e6:a:a:1m"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "lock range" in out
    lines = [ln for ln in out.splitlines() if "lock range" in ln]
    val = float(lines[0].split("=")[1].split("Hz")[0])
    # 1 mA into the 2 V / 1 nF tank: amp/(4*pi*A*C) ~ 40 kHz
    assert val == pytest.approx(1e-3 / (4 * np.pi * 2.0 * C_TANK),
                                rel=0.07)
    assert main([str(deck), "--no-tran", "--run-lock", "5e6:a:a"]) == 1


def test_hb_path_cross_validates(lock):
    """The autonomous-HB PPV path must agree with the shooting-monodromy
    path on the same deck — two independent algorithms (Floquet adjoint
    recursion vs Fredholm-normalized Jacobian null vector) for |p1|."""
    sim, res, il = lock
    il_hb = sim.injection_lock("a", amp=AMP, f0_guess=5e6,
                               anchor_node="a", method="hb", n_harm=9)
    assert il_hb.k_per_amp == pytest.approx(il.k_per_amp, rel=0.02)
    assert il_hb.f0 == pytest.approx(il.f0, rel=1e-3)


def test_delay_line_oscillator_lock_range():
    """T-line decks have no shooting PPV — method='auto' must route to
    the HB path and produce a finite, sane lock range for the delay-line
    oscillator (the first such number this engine can give)."""
    sim = Simulator.from_text("""* delay-line oscillator
Bamp b 0 V=-3.0*v(a)+0.5*v(a)^3
Rb b bl 50
T1 bl 0 a 0 Z0=50 TD=5n
Ra a 0 50
Ca a 0 2p
.op
""")
    il = sim.injection_lock("a", amp=1e-3, f0_guess=1e8,
                            anchor_node="a", n_harm=13)
    assert il.f0 == pytest.approx(1e8, rel=0.1)     # ~1/(2 TD), pulled
    assert 0 < il.lock_range_hz < 0.1 * il.f0
    # linear in amp by construction; harmonic m=2 uses |p_2|
    il2 = sim.injection_lock("a", amp=2e-3, f0_guess=1e8,
                             anchor_node="a", n_harm=13)
    assert il2.lock_range_hz == pytest.approx(2 * il.lock_range_hz,
                                              rel=1e-6)


def test_errors(lock):
    sim, res, _ = lock
    with pytest.raises(ValueError):
        sim.injection_lock("a", amp=-1.0, osc=res)
    with pytest.raises(ValueError):
        sim.injection_lock("a", amp=1e-3, osc=res, harmonic=0)
    with pytest.raises(KeyError):
        sim.injection_lock("nope", amp=1e-3, osc=res)
    # aliasing guards: shooting path m >= K/2 (K=256 samples), HB path
    # m > H — both would fold p_m onto a lower harmonic and report a
    # plausible-but-wrong lock range.
    with pytest.raises(ValueError, match="alias"):
        sim.injection_lock("a", amp=1e-3, osc=res, harmonic=128)
    with pytest.raises(ValueError, match="alias"):
        sim.injection_lock("a", amp=1e-3, f0_guess=5e6, anchor_node="a",
                           method="hb", n_harm=5, harmonic=6)
