"""Multi-tone HB with time-dependent behavioral expressions (r5,
VERDICT weak item 7): `time` rides a designated tone axis
(make_hbmulti_system b_time_axis, default tone 0), the MPDE lift of a
coefficient periodic at that tone.  Anchor: an ideal multiplier written
as I = v(rf)*sin(w_LO*time) must produce the same mixing solution as
the identical multiplier driven by an explicit LO node."""

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator
from circuitsimulator_tpu.analysis.hbmulti import harmonic_balance_multi

FLO = 10e6
FRF = 1e6
W_LO = "62831853.071795864"     # 2*pi*10e6, full f64 digits

BASE = (f"VRF rf 0 SIN 0 0.1 {FRF}\n"
        "RRF rf 0 1k\n"
        "RIF if 0 1k\n"
        "CIF if 0 3p\n")

DECK_NODE = BASE + (f"VLO lo 0 SIN 0 1 {FLO}\n"
                    "RLO lo 0 1k\n"
                    "B1 0 if I=v(rf)*v(lo)\n"
                    ".op\n")

DECK_TIME = BASE + (f"B1 0 if I=v(rf)*sin({W_LO}*time)\n"
                    ".op\n")


def node_eq(sim, name):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index


def test_time_behavioral_matches_node_lo():
    tones = ((FLO, 4), (FRF, 4))
    sa = Simulator.from_text(DECK_NODE)
    ra = harmonic_balance_multi(sa.engine, sa.params, tones)
    assert bool(ra.converged)
    sb = Simulator.from_text(DECK_TIME)
    assert sb.engine.b_uses_time
    rb = harmonic_balance_multi(sb.engine, sb.params, tones)
    assert bool(rb.converged)
    ia, ib = node_eq(sa, "if"), node_eq(sb, "if")
    xa = np.asarray(ra.xs)[..., ia]
    xb = np.asarray(rb.xs)[..., ib]
    # the IF waveforms over the whole multi-tone grid must agree; the
    # downconverted product is ~50 mV-scale
    assert np.abs(xa).max() > 1e-3
    np.testing.assert_allclose(xb, xa, rtol=0.0, atol=1e-8)


def test_bad_time_axis_raises():
    sb = Simulator.from_text(DECK_TIME)
    with pytest.raises(ValueError, match="b_time_axis"):
        harmonic_balance_multi(sb.engine, sb.params,
                               ((FLO, 3), (FRF, 3)), b_time_axis=5)
