""".OPTIONS MOSSYM: opt-in symmetric MOS (drain/source swap for Vds<0)."""

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator


DECK = """* reverse-biased pass transistor
.MODEL mn VT 0.7 MU 350u COX 2.3m
Vg g 0 DC 5
Vin in 0 DC 2
Rs in s 1k
M1 d g s n 10e-6 1e-6 mn
Rd d 0 1k
{opt}
.op
"""


def solve(opt):
    sim = Simulator.from_text(DECK.replace("{opt}", opt))
    x = sim.dc(polish=True)
    eq = {n: sim.circuit.nodes[sim.circuit.node_name_to_id[n]].eq_index
          for n in ("s", "d")}
    return float(x[eq["s"]]), float(x[eq["d"]])


def test_reference_quirk_reverse_is_off():
    s, d = solve("")
    assert d == pytest.approx(0.0, abs=1e-6)      # no conduction


def test_mossym_conducts_in_reverse():
    s, d = solve(".OPTIONS MOSSYM=1")
    # triode current through the swapped device: I = K(vov*vds - vds^2/2)
    i = d / 1000.0
    k = 350e-6 * 2.3e-3 * 10.0
    vov = (5.0 - d) - 0.7
    vds = s - d
    want = k * (vov * vds - 0.5 * vds * vds)
    assert i == pytest.approx(want, rel=1e-6)
    assert i > 1e-5


def test_mossym_transient_transmission_gate():
    # discharge a precharged cap through an NMOS whose "drain" starts
    # BELOW its source — without MOSSYM it never discharges
    deck = """* tgate discharge
.MODEL mn VT 0.7 MU 350u COX 2.3m
Vg g 0 DC 5
Cload s 0 1n
M1 0 g s n 10e-6 1e-6 mn
.IC V(s)=2
.TRAN 1e-6 2e-4 UIC
{opt}
.end
"""
    def final(opt):
        sim = Simulator.from_text(deck.replace("{opt}", opt))
        res = sim.transient()
        eq = sim.circuit.nodes[sim.circuit.node_name_to_id["s"]].eq_index
        return float(np.asarray(res.xs)[-1, eq])
    v_ref = final("")
    v_sym = final(".OPTIONS MOSSYM=1")
    # quirk mode: device off (drain at 0 below source) — the cap only sags
    # through the transient gmin (1e-6 S, tau = 1 ms): 2*e^-0.2 = 1.637;
    # symmetric mode: the channel conducts and discharges toward 0
    assert v_ref == pytest.approx(2.0 * np.exp(-0.2), rel=5e-3)
    assert v_sym < 0.1
