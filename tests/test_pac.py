"""Periodic AC (analysis/pac.py): conversion gains around a periodic
steady state, validated against closed forms."""

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator


def node_eq(sim, name):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index


def test_linear_circuit_pac_matches_ac():
    # no large-signal drive: the m=0 sideband of PAC must equal plain .AC
    sim = Simulator.from_text("""* rc lowpass
V1 in 0 DC 0 AC 1
Vlo lo 0 SIN 0 0 1e6
Rlo lo 0 1k
R1 in out 1k
C1 out 0 1n
.hb 1e6 4
.AC lin 1 30k 30k
""")
    res = sim.pac(deltas=[30e3])
    m0 = list(res.harmonics).index(0)
    out = node_eq(sim, "out")
    got = res.spectrum[0, m0, out]
    acres = sim.ac()
    expect = np.asarray(acres.xs)[0, out]
    assert got == pytest.approx(expect, rel=1e-6)
    # other sidebands carry nothing (the circuit is LTI)
    for j, m in enumerate(res.harmonics):
        if m != 0:
            assert abs(res.spectrum[0, j, out]) < 1e-12


def test_multiplier_mixer_conversion_gain():
    # ideal multiplier out = v(lo)*v(rf) with LO = sin(w0 t): a small RF
    # tone at delta converts to w0 +/- delta with |gain| = 1/2 and
    # coefficients -+ j/2 (sin = (e^{jw0t} - e^{-jw0t}) / 2j)
    sim = Simulator.from_text("""* b-source mixer
Vlo lo 0 SIN 0 1 1e6
Rlo lo 0 1k
Vrf rf 0 DC 0 AC 1
Rrf rf 0 1k
Bmix out 0 V=v(lo)*v(rf)
Rout out 0 1k
.hb 1e6 6
""")
    res = sim.pac(deltas=[10e3])
    out = node_eq(sim, "out")
    up = list(res.harmonics).index(1)
    dn = list(res.harmonics).index(-1)
    m0 = list(res.harmonics).index(0)
    c_up = res.spectrum[0, up, out]
    c_dn = res.spectrum[0, dn, out]
    # sin(w0 t) * 1 * e^{j d t}: upper coeff 1/(2j) = -j/2, lower +j/2
    assert c_up == pytest.approx(-0.5j, rel=1e-6)
    assert c_dn == pytest.approx(+0.5j, rel=1e-6)
    assert abs(res.spectrum[0, m0, out]) < 1e-9     # no direct feedthrough


def test_chopper_mixer_harmonic_rolloff():
    # square-wave switch chopping the RF: conversion gain to the m-th odd
    # sideband ~ square-wave Fourier coefficients (1/m falloff)
    sim = Simulator.from_text("""* switching mixer
.MODEL swm SW RON=0.001 ROFF=1e9 VT=0 VH=0.01
Vlo lo 0 SIN 0 1 1e6
Rlo lo 0 1k
Vrf rf 0 DC 0 AC 1
Rs rf a 50
S1 a out lo 0 swm
Rout out 0 1e4
.hb 1e6 16
""")
    res = sim.pac(deltas=[1e3], n_sidebands=5)
    out = node_eq(sim, "out")
    h = list(res.harmonics)
    g1 = abs(res.spectrum[0, h.index(1), out])
    g2 = abs(res.spectrum[0, h.index(2), out])
    g3 = abs(res.spectrum[0, h.index(3), out])
    # 50% duty chopper: |c0|=1/2 at m=0, odd harmonics 1/(pi m), even ~ 0
    g0 = abs(res.spectrum[0, h.index(0), out])
    assert g0 == pytest.approx(0.5, rel=0.1)
    assert g1 == pytest.approx(1 / np.pi, rel=0.15)
    assert g3 == pytest.approx(1 / (3 * np.pi), rel=0.3)
    assert g2 < 0.2 * g1


def test_mixer_noise_figure_ideal_multiplier():
    # ideal multiplier mixer, LO = sin(w0 t): the source resistor's noise
    # converts from BOTH RF and image sidebands with equal gain 1/2, so
    # with (almost) no other noise the SSB NF is 3.01 dB and the DSB NF
    # 0 dB.  Rout=0.001 keeps its own thermal contribution ~5e-5 of the
    # source's (through-gain 1/4 vs direct).
    sim = Simulator.from_text("""* multiplier mixer NF
Vlo lo 0 SIN 0 1 1e6
Rlo lo 0 0.001
Vrf rfs 0 DC 0
Rs rfs rf 1k
Bmix out 0 V=v(rf)*v(lo)
Rout out 0 0.001
.hb 1e6 6
""")
    nf_ssb = sim.mixer_noise_figure("Rs", delta=25e3, out_node="out")
    assert nf_ssb == pytest.approx(10 * np.log10(2.0), abs=0.02)
    nf_dsb = sim.mixer_noise_figure("Rs", delta=25e3, out_node="out",
                                    sidebands=(1, -1))
    assert nf_dsb == pytest.approx(0.0, abs=0.02)
    # a resistor with no transfer to the output raises
    with pytest.raises((ValueError, KeyError)):
        sim.mixer_noise_figure("Rnone", delta=25e3, out_node="out")
