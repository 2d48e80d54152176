"""Initial conditions: .IC card and .TRAN UIC (extensions)."""

import numpy as np
import jax.numpy as jnp
import pytest

from circuitsimulator_tpu.api import Simulator
from circuitsimulator_tpu.utils.options import DEFAULT_OPTIONS

F64 = DEFAULT_OPTIONS.replace(dtype=jnp.float64)


def veq(sim, name):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index


def test_uic_rc_discharge():
    """Cap pre-charged to 2 V with no source: pure RC discharge from the
    .IC value, no DC solve (which would give 0)."""
    net = """\
R1 a 0 1k
C1 a 0 1u
.IC V(a)=2
.TRAN 1e-4 3e-3 UIC
"""
    sim = Simulator.from_text(net, opts=F64)
    res = sim.transient()
    assert not bool(res.failed)
    ts = np.asarray(res.times)
    v = np.asarray(res.xs)[:, veq(sim, "a")]
    np.testing.assert_allclose(v[0], 2.0, rtol=0)
    exact = 2.0 * np.exp(-ts / 1e-3)
    assert np.abs(v - exact).max() < 0.12      # BE on a 10-steps/tau grid


def test_ic_without_uic_overrides_dc_start():
    net = """\
V1 in 0 1
R1 in a 1k
C1 a 0 1u
.IC V(a)=3
.TRAN 1e-4 4e-3
"""
    sim = Simulator.from_text(net, opts=F64)
    res = sim.transient()
    v = np.asarray(res.xs)[:, veq(sim, "a")]
    np.testing.assert_allclose(v[0], 3.0, rtol=0)  # starts at the IC...
    assert abs(v[-1] - 1.0) < 0.1                  # ...and decays toward 1


def test_uic_flag_overridable_at_callsite():
    net = """\
V1 in 0 1
R1 in a 1k
C1 a 0 1u
.TRAN 1e-4 5e-4
"""
    sim = Simulator.from_text(net, opts=F64)
    res = sim.transient(uic=True)     # no .IC values: start from zeros
    v = np.asarray(res.xs)[:, veq(sim, "a")]
    np.testing.assert_allclose(v[0], 0.0, atol=0)
    assert v[-1] > 0.2                # charging toward 1 V


def test_ic_unknown_node_warns(capsys):
    net = "V1 a 0 1\nR1 a 0 1k\n.IC V(zzz)=5\n.TRAN 1e-4 2e-4\n"
    sim = Simulator.from_text(net, opts=F64)
    sim.transient()
    assert "unknown or ground node" in capsys.readouterr().err


def test_ic_adaptive_uic():
    net = """\
R1 a 0 1k
C1 a 0 1u
.IC V(a)=1
.TRAN 1e-4 2e-3 UIC
"""
    sim = Simulator.from_text(net, opts=F64)
    res = sim.transient(adaptive=True)
    assert not bool(res.failed)
    ts = np.asarray(res.times)
    v = np.asarray(res.xs)[:, veq(sim, "a")]
    np.testing.assert_allclose(v, np.exp(-ts / 1e-3), atol=6e-3)
