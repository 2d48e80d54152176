"""Noise analysis (.NOISE, analysis/noise.py) against closed-form results:
resistor divider, RC lowpass (kT/C shape), shot noise, input referral."""

import numpy as np
import jax.numpy as jnp
import pytest

from circuitsimulator_tpu.api import Simulator
from circuitsimulator_tpu.analysis.noise import (K_BOLTZ, Q_ELEM, T_NOISE,
                                                 write_noise_csv)
from circuitsimulator_tpu.utils.options import DEFAULT_OPTIONS

F64 = DEFAULT_OPTIONS.replace(dtype=jnp.float64)
FOUR_KT = 4.0 * K_BOLTZ * T_NOISE


def test_resistor_divider_thermal():
    # noiseless ideal source, R1 to out, R2 to ground:
    # S_out = 4kT * (R1 || R2), flat in frequency
    net = """\
V1 in 0 DC 1
R1 in out 2k
R2 out 0 3k
.NOISE V(out) V1 dec 2 1 1e6
"""
    sim = Simulator.from_text(net, opts=F64)
    res = sim.noise()
    rpar = 2e3 * 3e3 / 5e3
    np.testing.assert_allclose(np.asarray(res.onoise), FOUR_KT * rpar,
                               rtol=1e-9)
    # divider gain in -> out is R2/(R1+R2) = 0.6 at all f
    np.testing.assert_allclose(np.abs(np.asarray(res.gain)), 0.6, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(res.inoise),
                               FOUR_KT * rpar / 0.36, rtol=1e-9)


def test_rc_lowpass_shape_and_input_referral():
    # S_out(f) = 4kTR / (1 + (2 pi f R C)^2); input-referred is flat 4kTR
    R, C = 1e3, 1e-9
    net = f"""\
V1 in 0 DC 0
R1 in out {R}
C1 out 0 {C}
"""
    sim = Simulator.from_text(net, opts=F64)
    freqs = np.array([1.0, 1e4, 1.0 / (2 * np.pi * R * C), 1e7])
    res = sim.noise(freqs=freqs, out_node="out", input_source="V1")
    expect = FOUR_KT * R / (1.0 + (2 * np.pi * freqs * R * C) ** 2)
    np.testing.assert_allclose(np.asarray(res.onoise), expect, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(res.inoise), FOUR_KT * R,
                               rtol=1e-9)
    # at the pole the output PSD is exactly half the flat value
    np.testing.assert_allclose(res.onoise[2], FOUR_KT * R / 2, rtol=1e-9)


def test_diode_shot_noise():
    # forward-biased diode: S_out = (4kT/R + 2q Id) * (R || rd)^2
    net = """\
V1 in 0 DC 5
R1 in out 10k
D1 out 0 IS=1e-14 N=1
"""
    sim = Simulator.from_text(net, opts=F64)
    x = np.asarray(sim.dc())
    out_eq = sim.circuit.nodes[sim.circuit.node_name_to_id["out"]].eq_index
    vd = x[out_eq]
    i_d = 1e-14 * (np.exp(vd / 0.025852) - 1.0)
    rd = 0.025852 / (1e-14 * np.exp(vd / 0.025852))
    rpar = 1e4 * rd / (1e4 + rd)
    expect = (FOUR_KT / 1e4 + 2 * Q_ELEM * i_d) * rpar ** 2
    res = sim.noise(freqs=np.array([100.0]), out_node="out")
    np.testing.assert_allclose(np.asarray(res.onoise)[0], expect, rtol=1e-6)
    assert set(res.by_class) == {"R", "D"}


def test_mos_channel_and_flicker():
    # common-source stage: onoise(f) = (8/3 kT gm + KF Id^AF / f + 4kT/RL)
    #                                  * RL_eff^2  with RL_eff = RL || ro
    net = """\
VDD vdd 0 5
VIN in 0 2
M1 out in 0 n 2u 1u 1
RL vdd out 10k
.MODEL 1 VT 0.7 MU 5e-2 COX 2e-3 LAMBDA 0.0 KF 1e-22 AF 1
"""
    sim = Simulator.from_text(net, opts=F64)
    x = np.asarray(sim.dc())
    k = 5e-2 * 2e-3 * 2.0     # MU*COX*W/L -> Id~0.17mA, out~3.3V (sat)
    vov = 2.0 - 0.7
    i_d = 0.5 * k * vov ** 2
    gm = k * vov
    freqs = np.array([10.0, 1e3, 1e5])
    res = sim.noise(freqs=freqs, out_node="out", input_source="VIN")
    expect = ((8.0 / 3.0) * K_BOLTZ * T_NOISE * gm
              + 1e-22 * i_d / freqs + FOUR_KT / 1e4) * 1e4 ** 2
    np.testing.assert_allclose(np.asarray(res.onoise), expect, rtol=1e-6)
    # input-referred channel noise ~ 8kT/(3gm) at high f (flicker dies off)
    np.testing.assert_allclose(
        np.asarray(res.inoise)[-1],
        ((8.0 / 3.0) * K_BOLTZ * T_NOISE * gm + FOUR_KT / 1e4) / gm ** 2,
        rtol=1e-6)
    assert set(res.by_class) == {"R", "M"}


def test_noise_card_parsing_and_csv(tmp_path):
    net = """\
V1 in 0 DC 1
R1 in out 1k
C1 out 0 1n
.NOISE V(out) V1 dec 3 1e2 1e5
"""
    sim = Simulator.from_text(net, opts=F64)
    cfg = sim.config.noise
    assert cfg.enabled and cfg.out_node == "out"
    assert cfg.input_source == "V1" and cfg.sweep_type == "dec"
    assert cfg.n_points == 3 and cfg.fstart == 100.0 and cfg.fstop == 1e5
    res = sim.noise()
    path = tmp_path / "noise.csv"
    write_noise_csv(str(path), res)
    lines = path.read_text().splitlines()
    assert lines[0].startswith("freq,onoise,onoise_sqrt,onoise_R,")
    assert "inoise" in lines[0]
    assert len(lines) == 1 + len(np.asarray(res.freqs))


def test_noise_errors():
    sim = Simulator.from_text("V1 a 0 1\nR1 a 0 1k\n", opts=F64)
    with pytest.raises(ValueError, match=".NOISE card missing"):
        sim.noise()
    with pytest.raises(ValueError, match="no frequency sweep"):
        sim.noise(out_node="a")
    with pytest.raises(KeyError):
        sim.noise(out_node="nope", freqs=np.array([1.0]))
    with pytest.raises(ValueError, match="ground"):
        sim.noise(out_node="0", freqs=np.array([1.0]))
