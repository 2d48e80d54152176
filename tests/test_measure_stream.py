"""Streaming .MEASURE accumulators (analysis/measure_stream.py) must match
the host evaluator on the same waveforms — without saving them."""

import math

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator
from circuitsimulator_tpu.analysis.measure_stream import (
    StreamingMeasures, run_transient_streaming)


NET = """* rc + sine measures
V1 in 0 PULSE(0 1 0 1n 1n 1 2)
V2 s 0 SIN 0 2 1e6
R1 in out 1k
C1 out 0 1n
Rs s 0 1k
.TRAN 10n 10u
.MEASURE TRAN t63 WHEN V(out)=0.632 RISE=1
.MEASURE TRAN vmax MAX V(out)
.MEASURE TRAN vavg AVG V(out) FROM=5u TO=10u
.MEASURE TRAN srms RMS V(s) FROM=0 TO=10u
.MEASURE TRAN integ INTEG V(out) FROM=0 TO=10u
.MEASURE TRAN tpd TRIG V(in) VAL=0.5 RISE=1 TARG V(out) VAL=0.5 RISE=1
.MEASURE TRAN vat FIND V(out) AT=1u
.MEASURE TRAN fw FIND V(s) WHEN V(out)=0.632 RISE=1
.MEASURE TRAN slast WHEN V(s)=0 FALL=LAST
.MEASURE TRAN smaxat MAX_AT V(s) FROM=0 TO=1u
.MEASURE TRAN spp PP V(s)
"""


def test_streaming_matches_host():
    sim = Simulator.from_text(NET)
    # host reference: full waveform + analysis/measure.py
    res = sim.transient()
    host = dict(sim.measure(res))
    # streaming: no waveforms saved
    sm = StreamingMeasures(sim.config.measures, sim.topo, sim.engine.dtype)
    sres, vals = run_transient_streaming(
        sim.engine, sim.params, sim.config.tran.tstep, sim.config.tran.tstop,
        sm)
    assert sres.xs is None
    for name, hv in host.items():
        sv = float(vals[name])
        if math.isnan(hv):
            assert math.isnan(sv), name
        elif name in ("vavg", "srms", "integ"):
            # window statistics clip to grid segments (documented approx)
            assert sv == pytest.approx(hv, rel=2e-3), name
        else:
            assert sv == pytest.approx(hv, rel=1e-9, abs=1e-12), name


def test_streaming_step_sweep():
    sim = Simulator.from_text("""* step without waveforms
.PARAM rr=1k
V1 in 0 PULSE(0 1 0 1n 1n 1 2)
R1 in out {rr}
C1 out 0 1n
.TRAN 20n 8u
.STEP PARAM rr LIST 1k 2k
.MEASURE TRAN t63 WHEN V(out)=0.632 RISE=1
""")
    sres = sim.step(save_xs=False)
    assert sres.result.xs is None
    (name, t63) = sres.measures[0]
    assert name == "t63"
    np.testing.assert_allclose(t63, [1.02e-6, 2.04e-6], rtol=5e-2)


def test_streaming_montecarlo():
    import jax
    from circuitsimulator_tpu.parallel.montecarlo import (
        perturb_params, batched_transient_measures)
    sim = Simulator.from_text("""* mc rc
V1 in 0 PULSE(0 1 0 1n 1n 1 2)
R1 in out 1k
C1 out 0 1n
.TRAN 20n 6u
.MEASURE TRAN t63 WHEN V(out)=0.632 RISE=1
""")
    B = 16
    bp = perturb_params(sim.params, jax.random.key(0), B, {"res_r": 0.2})
    res, vals = batched_transient_measures(
        sim.engine, bp, sim.config.tran.tstep, sim.config.tran.tstop,
        sim.config.measures, sim.topo)
    t63 = np.asarray(vals["t63"])
    assert t63.shape == (B,)
    r = np.asarray(bp["res_r"])[:, 0]
    # rise time tracks the perturbed R (tau = R*C), BE-discretization slop
    np.testing.assert_allclose(t63, r * 1e-9 * (-np.log(1 - 0.632)),
                               rtol=8e-2)


def test_yield_analysis():
    import jax
    sim = Simulator.from_text("""* yield: rc rise time spec
V1 in 0 PULSE(0 1 0 1n 1n 1 2)
R1 in out 1k
C1 out 0 1n
.TRAN 20n 6u
.MEASURE TRAN t63 WHEN V(out)=0.632 RISE=1
""")
    out = sim.yield_analysis(jax.random.key(1), 64, {"res_r": 0.1},
                             {"t63": (None, 1.1e-6)})
    assert out["n"] == 64
    assert 0.0 <= out["yield"] <= 1.0
    lo, hi = out["ci95"]
    assert lo <= out["yield"] <= hi
    # the spec passes iff tau = R*C is below ~1.08us: cross-check against
    # the perturbed R values
    r = np.asarray(out["params"]["res_r"])[:, 0]
    expect = r * 1e-9 * (-math.log(1 - 0.632)) <= 1.1e-6
    agree = (expect == out["pass"]).mean()
    assert agree > 0.9          # BE-grid slop near the boundary only


def test_streaming_vdb_modifier_matches_host():
    sim = Simulator.from_text(
        "V1 a 0 SIN 0 2 1e6\nR1 a 0 1k\n.TRAN 2n 2u\n"
        ".MEASURE TRAN peakdb MAX VDB(a) FROM=0 TO=2u\n")
    res = sim.transient()
    host = dict(sim.measure(res))
    sm = StreamingMeasures(sim.config.measures, sim.topo, sim.engine.dtype)
    _, vals = run_transient_streaming(
        sim.engine, sim.params, sim.config.tran.tstep,
        sim.config.tran.tstop, sm)
    assert float(vals["peakdb"]) == pytest.approx(host["peakdb"], abs=1e-9)
    assert host["peakdb"] == pytest.approx(20 * np.log10(2), abs=1e-3)
