"""Linear controlled sources E/G/F/H (extension): DC closed forms, AC,
transient, frontend parity, and error handling."""

import numpy as np
import jax.numpy as jnp
import pytest

from circuitsimulator_tpu.api import Simulator
from circuitsimulator_tpu.utils.options import DEFAULT_OPTIONS

F64 = DEFAULT_OPTIONS.replace(dtype=jnp.float64)


def veq(sim, name):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index


def test_vcvs_dc_gain():
    net = """\
V1 in 0 2
E1 out 0 in 0 10
RL out 0 1k
"""
    sim = Simulator.from_text(net, opts=F64)
    x = np.asarray(sim.dc())
    np.testing.assert_allclose(x[veq(sim, "out")], 20.0, rtol=1e-12)
    # E1 branch current supplies the load: 20 V / 1k
    e1_eq = next(eq for n, eq in zip(sim.topo.branch_col_names,
                                     sim.topo.branch_col_eqs) if n == "E1")
    np.testing.assert_allclose(x[e1_eq], -20.0 / 1e3, rtol=1e-12)


def test_vccs_dc():
    # G pushes gm*(Vc) from out to ground; with RL to a 5V rail:
    # KCL at out: (Vout-5)/RL + gm*Vin = 0
    net = """\
V1 in 0 2
VDD vdd 0 5
RL vdd out 1k
G1 out 0 in 0 1e-3
"""
    sim = Simulator.from_text(net, opts=F64)
    x = np.asarray(sim.dc())
    np.testing.assert_allclose(x[veq(sim, "out")], 5.0 - 1e-3 * 2.0 * 1e3,
                               rtol=1e-12)


def test_cccs_and_ccvs_dc():
    # V1 drives 1 mA through R1 (V1 branch current = -1 mA, current INTO
    # the + terminal is negative of the through current convention)
    net = """\
V1 a 0 1
R1 a 0 1k
F1 out 0 V1 2
RF out 0 1k
H1 hout 0 V1 5k
RH hout 0 1k
"""
    sim = Simulator.from_text(net, opts=F64)
    x = np.asarray(sim.dc())
    i_v1 = -1.0 / 1e3          # branch current of V1 (into + terminal)
    # F1 injects gain * I(V1) from out to ground through RF
    np.testing.assert_allclose(x[veq(sim, "out")], -2.0 * i_v1 * 1e3,
                               rtol=1e-12)
    # H1: V(hout) = r * I(V1)
    np.testing.assert_allclose(x[veq(sim, "hout")], 5e3 * i_v1, rtol=1e-12)


def test_vcvs_transient_rc():
    """E-source driving an RC through its ideal output: classic first-order
    response toward gain*Vin."""
    net = """\
V1 in 0 PULSE 0 1 0 1e-12 1e-12 1 2
E1 amp 0 in 0 5
R1 amp out 1k
C1 out 0 1u
.TRAN 2e-4 4e-3
"""
    sim = Simulator.from_text(net, opts=F64)
    res = sim.transient()
    assert not bool(res.failed)
    ts = np.asarray(res.times)
    v = np.asarray(res.xs)[:, veq(sim, "out")]
    exact = 5.0 * (1.0 - np.exp(-ts / 1e-3))
    assert np.abs(v - exact).max() < 0.25   # BE on a coarse grid
    # adaptive path also supports controlled sources
    res_a = sim.transient(adaptive=True)
    va = np.asarray(res_a.xs)[:, veq(sim, "out")]
    assert np.abs(va - exact).max() < 0.04   # ~amplitude*sqrt(rtol)


def test_controlled_sources_ac():
    net = """\
V1 in 0 DC 0 AC 1
G1 out 0 in 0 1e-3
RL out 0 2k
C1 out 0 1n
.AC lin 3 1e3 1e5
"""
    sim = Simulator.from_text(net, opts=F64)
    res = sim.ac()
    out = veq(sim, "out")
    f = np.asarray(res.freqs)
    z = 1.0 / (1.0 / 2e3 + 2j * np.pi * f * 1e-9)
    np.testing.assert_allclose(np.asarray(res.xs)[:, out], -1e-3 * z,
                               rtol=1e-10)


def test_native_frontend_parity_controlled():
    net = """\
V1 a 0 1
R1 a 0 1k
E1 e 0 a 0 3
RE e 0 1k
G1 g 0 a 0 1e-3
RG g 0 1k
F1 f 0 V1 2
RF f 0 1k
H1 h 0 V1 4k
RH h 0 1k
"""
    xs = {}
    for fe in ("python", "native"):
        sim = Simulator.from_text(net, frontend=fe, opts=F64)
        xs[fe] = np.asarray(sim.dc())
        assert sim.topo.counts["E"] == 1 and sim.topo.counts["H"] == 1
    np.testing.assert_array_equal(xs["python"], xs["native"])


def test_cccs_unknown_control_errors():
    with pytest.raises(ValueError, match="controlling source"):
        Simulator.from_text("V1 a 0 1\nR1 a 0 1k\nF1 b 0 VX 2\nRB b 0 1k\n",
                            opts=F64)
