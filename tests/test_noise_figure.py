"""Noise figure (Simulator.noise_figure): total output PSD referred to
the source resistor's own thermal contribution — closed-form checks."""

import math

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator


def test_resistive_attenuator_nf():
    # classic result: a resistive divider's noise figure is
    # F = 1 + Rs/RL (flat in frequency)
    rs, rl = 50.0, 450.0
    sim = Simulator.from_text(f"""* pad
V1 in 0 DC 0 AC 1
RS in out {rs}
RL out 0 {rl}
.AC DEC 5 1e3 1e6
.NOISE V(out) V1
.end
""")
    f, nf = sim.noise_figure("RS")
    pred = 10 * math.log10(1.0 + rs / rl)
    np.testing.assert_allclose(nf, pred, rtol=1e-9)
    assert nf.shape == f.shape


def test_matched_pad_is_3db_ish():
    # Rs = RL: F = 2 -> NF = 3.01 dB
    sim = Simulator.from_text("""* matched
V1 in 0 DC 0 AC 1
RS in out 1k
RL out 0 1k
.AC DEC 5 1e3 1e5
.NOISE V(out) V1
.end
""")
    _, nf = sim.noise_figure("RS")
    np.testing.assert_allclose(nf, 10 * math.log10(2.0), rtol=1e-9)


def test_unknown_resistor_raises():
    sim = Simulator.from_text("""* x
V1 a 0 DC 0 AC 1
R1 a 0 1k
.AC DEC 5 1e3 1e5
.NOISE V(a) V1
.end
""")
    with pytest.raises(KeyError):
        sim.noise_figure("RQ")
