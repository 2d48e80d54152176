"""`.FOUR` Fourier analysis (analysis/fourier.py): pure-tone exactness,
rectifier harmonics cross-checked against harmonic balance, card parsing."""

import numpy as np
import jax.numpy as jnp
import pytest

from circuitsimulator_tpu.api import Simulator
from circuitsimulator_tpu.analysis.fourier import (fourier_of_samples,
                                                   fourier_table)
from circuitsimulator_tpu.utils.options import DEFAULT_OPTIONS

F64 = DEFAULT_OPTIONS.replace(dtype=jnp.float64)


def test_fourier_of_samples_pure_tone():
    f0 = 1e6
    t = np.linspace(0, 3 / f0, 3001)
    v = 0.25 + 2.0 * np.sin(2 * np.pi * f0 * t + 0.3) \
        + 0.5 * np.cos(2 * np.pi * 3 * f0 * t)
    dc, mag, ph = fourier_of_samples(t, v, f0, n_harm=5)
    np.testing.assert_allclose(dc, 0.25, atol=1e-6)
    np.testing.assert_allclose(mag[0], 2.0, rtol=1e-5)
    np.testing.assert_allclose(mag[2], 0.5, rtol=1e-4)
    assert mag[1] < 1e-4 and mag[3] < 1e-4
    # sin(wt+0.3) = cos(wt + 0.3 - pi/2): phase of the e^{jwt} coefficient
    np.testing.assert_allclose(ph[0], np.degrees(0.3 - np.pi / 2), atol=0.01)


def test_four_card_rectifier_vs_hb():
    """Half-wave diode rectifier: .FOUR harmonics of the settled transient
    must match the single-tone HB spectrum."""
    f0 = 1e7
    net = f"""\
V1 in 0 SIN 0 1 {f0}
Rs in a 200
D1 a 0 IS=1e-12 N=1
RL a 0 2k
.TRAN 1e-10 5e-7
.FOUR {f0} V(a)
"""
    sim = Simulator.from_text(net, opts=F64)
    tr = sim.transient()
    four = sim.fourier(tr)
    assert four.rows[0].label == "V(a)"
    hb = sim.harmonic_balance(f0=f0, n_harm=12)
    a_eq = sim.circuit.nodes[sim.circuit.node_name_to_id["a"]].eq_index
    spec = np.asarray(hb.spectrum)[:, a_eq]
    # harmonic magnitudes: |2 c_k| from HB vs .FOUR rows (skip tiny ones)
    for k in range(1, 6):
        np.testing.assert_allclose(four.rows[0].mag[k - 1],
                                   np.abs(spec[k]), rtol=2e-2, atol=1e-4)
    np.testing.assert_allclose(four.rows[0].dc, np.real(spec[0]), atol=2e-3)
    assert four.rows[0].thd > 0.1       # a rectifier is wildly nonlinear
    table = fourier_table(four)
    assert "total harmonic distortion" in table


def test_four_errors():
    sim = Simulator.from_text(
        "V1 a 0 SIN 0 1 1e6\nR1 a 0 1k\n.TRAN 1e-8 4e-7\n", opts=F64)
    tr = sim.transient()
    with pytest.raises(ValueError, match=".FOUR card missing"):
        sim.fourier(tr)
    with pytest.raises(ValueError, match="full period"):
        from circuitsimulator_tpu.analysis.fourier import fourier_of_samples
        fourier_of_samples(np.linspace(0, 1e-7, 10), np.zeros(10), 1e6)


def test_four_native_frontend_parity():
    net = """\
V1 a 0 SIN 0 1 1e6
R1 a 0 1k
.TRAN 1e-8 4e-6
.FOUR 1e6 V(a) I(V1)
"""
    for fe in ("python", "native"):
        sim = Simulator.from_text(net, frontend=fe)
        cfg = sim.config.four
        assert cfg.enabled and cfg.f0 == 1e6, fe
        assert [p.kind for p in cfg.probes] == ["nv", "br"], fe
        four = sim.fourier(sim.transient())
        np.testing.assert_allclose(four.rows[0].mag[0], 1.0, rtol=1e-3)
