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


# ---- element-level IC= on C/L cards (honored under UIC) ----

def test_cap_ic_uic_discharge():
    net = """\
C1 a 0 1u IC=2
R1 a 0 1k
.TRAN 10u 2m UIC
"""
    for fe in ("python", "native"):
        sim = Simulator.from_text(net, frontend=fe)
        xs = np.asarray(sim.transient().xs)
        a = sim.circuit.nodes[sim.circuit.node_name_to_id["a"]].eq_index
        assert xs[0, a] == pytest.approx(2.0)
        # one time constant (tau = 1 ms); BE discrete decay (1+dt/tau)^-n
        assert xs[100, a] == pytest.approx(2.0 * 1.01 ** -100, rel=1e-3)


def test_ind_ic_uic_decay():
    net = """\
L1 a 0 1m IC=3m
R1 a 0 1
.TRAN 10u 2m UIC
"""
    sim = Simulator.from_text(net)
    res = sim.transient()
    (l1,) = [e for e in sim.circuit.elements if e.name == "L1"]
    il = np.asarray(res.xs)[:, l1.branch_eq]
    assert il[99] == pytest.approx(3e-3 * np.exp(-1), rel=0.06)


def test_cap_ic_ignored_without_uic():
    net = """\
V1 in 0 1
R1 in a 1k
C1 a 0 1u IC=0.25
.TRAN 10u 100u
"""
    sim = Simulator.from_text(net)
    xs = np.asarray(sim.transient().xs)
    a = sim.circuit.nodes[sim.circuit.node_name_to_id["a"]].eq_index
    # starts from the DC solution (cap open -> v(a)=1), not from IC
    assert xs[0, a] == pytest.approx(1.0, abs=1e-6)


def test_floating_cap_ic_and_dotic_override():
    net = """\
C1 a b 1u IC=1.5
R1 a 0 1k
R2 b 0 1k
C2 c 0 1u IC=0.7
R3 c 0 1k
.IC V(c)=0.9
.TRAN 10u 50u UIC
"""
    sim = Simulator.from_text(net)
    x0 = np.asarray(sim._initial_conditions_x0(True))
    nid = sim.circuit.node_name_to_id
    eq = lambda n: sim.circuit.nodes[nid[n]].eq_index
    assert x0[eq("a")] - x0[eq("b")] == pytest.approx(1.5)
    # .IC card wins over the element IC=
    assert x0[eq("c")] == pytest.approx(0.9)
