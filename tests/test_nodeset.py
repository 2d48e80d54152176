"""`.NODESET` (extension): steering multistable DC solutions."""

import numpy as np
import jax.numpy as jnp
import pytest

from circuitsimulator_tpu.api import Simulator
from circuitsimulator_tpu.utils.options import DEFAULT_OPTIONS

F64 = DEFAULT_OPTIONS.replace(dtype=jnp.float64)

# cross-coupled NMOS latch: two stable states (q high / qb high)
LATCH = """\
VDD vdd 0 5
RL1 vdd q 10k
RL2 vdd qb 10k
M1 q qb 0 n 10u 1u 1
M2 qb q 0 n 10u 1u 1
.MODEL 1 VT 1.0 MU 5e-2 COX 2e-3 LAMBDA 0.0
"""


def veq(sim, name):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index


def solve(extra):
    sim = Simulator.from_text(LATCH + extra, opts=F64)
    x = np.asarray(sim.dc())
    return x[veq(sim, "q")], x[veq(sim, "qb")], sim


def test_nodeset_selects_latch_state():
    q1, qb1, _ = solve(".NODESET V(q)=5 V(qb)=0\n")
    assert q1 > 4.0 and qb1 < 1.0          # q-high state
    q2, qb2, _ = solve(".NODESET V(q)=0 V(qb)=5\n")
    assert q2 < 1.0 and qb2 > 4.0          # flipped state
    # by symmetry the two runs are mirror images
    np.testing.assert_allclose([q1, qb1], [qb2, q2], atol=1e-6)


def test_nodeset_noop_on_unique_solution():
    net = "V1 in 0 2\nR1 in out 1k\nR2 out 0 1k\nD1 out 0 IS=1e-14\n"
    base = Simulator.from_text(net, opts=F64)
    ns = Simulator.from_text(net + ".NODESET V(out)=0.9\n", opts=F64)
    np.testing.assert_allclose(np.asarray(ns.dc()), np.asarray(base.dc()),
                               rtol=0, atol=1e-8)


def test_nodeset_frontend_parity_and_warning(capsys):
    net = LATCH + ".NODESET V(q)=5 V(zzz)=1\n"
    for fe in ("python", "native"):
        sim = Simulator.from_text(net, opts=F64, frontend=fe)
        assert sim.config.nodesets[0] == ("q", 5.0), fe
        sim.dc()
    assert ".NODESET: unknown or ground node 'zzz'" in capsys.readouterr().err
