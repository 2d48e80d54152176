"""`.TEMP` temperature support (extension): thermal voltage rescaling in
diode/BJT models and noise."""

import numpy as np
import jax.numpy as jnp
import pytest

from circuitsimulator_tpu.api import Simulator
from circuitsimulator_tpu.analysis.noise import K_BOLTZ, Q_ELEM
from circuitsimulator_tpu.utils.options import DEFAULT_OPTIONS

F64 = DEFAULT_OPTIONS.replace(dtype=jnp.float64)
NET = """\
V1 in 0 DC 5
R1 in out 10k
D1 out 0 IS=1e-14 N=1
.TEMP {tc}
"""


def veq(sim, name):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index


def vd_at(tc, frontend="python"):
    sim = Simulator.from_text(NET.format(tc=tc), opts=F64, frontend=frontend)
    assert float(sim.config.temp_c) == tc
    return float(np.asarray(sim.dc())[veq(sim, "out")]), sim


def test_diode_vd_shifts_with_temperature():
    v27, sim27 = vd_at(27.0)
    v100, _ = vd_at(100.0)
    # same Is: higher T -> higher vt -> larger forward drop at ~same current
    vt27 = K_BOLTZ * 300.15 / Q_ELEM
    vt100 = K_BOLTZ * 373.15 / Q_ELEM
    i_d = (5.0 - v27) / 1e4
    np.testing.assert_allclose(v27, vt27 * np.log(i_d / 1e-14 + 1),
                               rtol=1e-3)
    assert v100 > v27 + 0.1
    i_d100 = (5.0 - v100) / 1e4
    np.testing.assert_allclose(v100, vt100 * np.log(i_d100 / 1e-14 + 1),
                               rtol=1e-3)


def test_temp_native_frontend_parity():
    vp, _ = vd_at(85.0, "python")
    vn, _ = vd_at(85.0, "native")
    assert vp == vn


def test_noise_scales_with_temperature():
    net = "V1 in 0 DC 1\nR1 in out 1k\nR2 out 0 1k\n"
    f = np.array([1e3])
    on = {}
    for tc in (27.0, 127.0):
        sim = Simulator.from_text(net + f".TEMP {tc}\n", opts=F64)
        on[tc] = float(np.asarray(
            sim.noise(freqs=f, out_node="out").onoise).ravel()[0])
    np.testing.assert_allclose(on[127.0] / on[27.0],
                               (273.15 + 127) / (273.15 + 27), rtol=1e-9)


def test_default_temperature_unchanged():
    """Without .TEMP the thermal voltage is the model default exactly."""
    sim = Simulator.from_text("V1 a 0 1\nR1 a 0 1k\n", opts=F64)
    assert float(sim.params["vt_thermal"]) == 0.025852
