"""Two-tone IP3 extraction (Simulator.two_tone_ip3) on the multi-tone
harmonic balance, pinned by the polynomial closed form: for
y = x + a3·x³ with x = A(cosω1t + cosω2t),
IM3(2f1−f2) = (3/4)·a3·A³ and IIP3_amplitude = √(4/(3·a3)) exactly
(to O(a3·A²) compression)."""

import math

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator


A = 0.1
A3 = 0.1


def _deck():
    return Simulator.from_text(f"""* two-tone cubic
V1 m 0 SIN 0 {A} 1.0e6
V2 x m SIN 0 {A} 1.3e6
B1 out 0 V=v(x) + {A3}*v(x)^3
RO out 0 1k
.hb 1.0e6 3 1.3e6 3
.end
""")


def test_ip3_closed_form():
    sim = _deck()
    out = sim.two_tone_ip3("out", input_amplitude=A)
    # fundamental ~ A (plus the 9/4·a3·A³ compression term)
    fund_pred = A + A3 * (9.0 / 4.0) * A ** 3
    assert out["fund"] == pytest.approx(fund_pred, rel=1e-3)
    im3_pred = (3.0 / 4.0) * A3 * A ** 3
    assert out["im3"] == pytest.approx(im3_pred, rel=2e-2)
    iip3_pred = math.sqrt(4.0 / (3.0 * A3))
    assert out["iip3_amplitude"] == pytest.approx(iip3_pred, rel=2e-2)
    # dBc sanity: IM3 sits ~48.5 dB below the carrier at A=0.1
    assert out["im3_dbc"] == pytest.approx(
        20 * math.log10(im3_pred / fund_pred), abs=0.2)


def test_ip3_scales_as_cube():
    # halving the drive drops IM3 by 18 dB but leaves IIP3 invariant
    sim = _deck()
    out1 = sim.two_tone_ip3("out", input_amplitude=A)
    import jax.numpy as jnp
    p2 = dict(sim.params)
    p2["vs_sin"] = sim.params["vs_sin"].at[:, 1].multiply(0.5)
    out2 = sim.two_tone_ip3("out", input_amplitude=A / 2, params=p2)
    drop_db = 20 * math.log10(out1["im3"] / out2["im3"])
    assert drop_db == pytest.approx(18.06, abs=0.3)
    assert out2["iip3_amplitude"] == pytest.approx(
        out1["iip3_amplitude"], rel=1e-2)


def test_needs_two_tones():
    sim = Simulator.from_text("""* single tone
V1 x 0 SIN 0 0.1 1e6
R1 x 0 1k
.hb 1e6 4
.end
""")
    with pytest.raises(ValueError):
        sim.two_tone_ip3("x", input_amplitude=0.1)


def test_p1db_closed_form():
    # compressive cubic y = x - a3*x^3: fundamental gain 1 - (3/4)a3*A^2,
    # so A_1dB = sqrt((1 - 10^(-1/20))*4/(3*a3))
    a3 = 0.1
    sim = Simulator.from_text(f"""* compression
V1 x 0 SIN 0 0.2 1.0e6
B1 out 0 V=v(x) - {a3}*v(x)^3
RO out 0 1k
.hb 1.0e6 5
.end
""")
    out = sim.p1db("out", "V1")
    pred = math.sqrt((1.0 - 10.0 ** (-1.0 / 20.0)) * 4.0 / (3.0 * a3))
    assert out["gain_ss"] == pytest.approx(1.0, rel=1e-4)
    assert out["a_1db"] == pytest.approx(pred, rel=1e-3)
    assert out["gain_1db"] == pytest.approx(
        out["gain_ss"] * 10 ** (-1 / 20), rel=1e-3)
