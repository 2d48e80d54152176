"""`.MEASURE` card (analysis/measure.py): parse + evaluation against
closed-form waveforms."""

import math

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator
from circuitsimulator_tpu.netlist.parser import parse_netlist_text


RC = """* rc step response, tau = 1us
V1 in 0 PULSE(0 1 0 1n 1n 1 2)
R1 in out 1k
C1 out 0 1n
.TRAN 10n 10u
.MEASURE TRAN t63 WHEN V(out)=0.632 RISE=1
.MEASURE TRAN vmax MAX V(out)
.MEASURE TRAN vavg AVG V(out) FROM=5u TO=10u
.MEASURE TRAN vrms RMS V(out) FROM=5u TO=10u
.MEASURE TRAN q INTEG I(V1) FROM=0 TO=10u
.MEASURE TRAN vat FIND V(out) AT=1u
.MEASURE TRAN tpd TRIG V(in) VAL=0.5 RISE=1 TARG V(out) VAL=0.5 RISE=1
.MEASURE TRAN vpp PP V(out)
.MEASURE TRAN tmax MAX_AT V(out)
"""


def test_parse_measures():
    _, sim = parse_netlist_text(RC)
    assert len(sim.measures) == 9
    by = {m.name: m for m in sim.measures}
    assert by["t63"].kind == "when" and by["t63"].ev1.edge == "rise"
    assert by["t63"].ev1.val == pytest.approx(0.632)
    assert by["vavg"].kind == "stat" and by["vavg"].stat == "avg"
    assert by["vavg"].t_from == pytest.approx(5e-6)
    assert by["tpd"].kind == "trig_targ"
    assert by["tpd"].ev2.probe.node1 == "out"
    assert by["vat"].kind == "find_at" and by["vat"].at == pytest.approx(1e-6)


def test_rc_measures_match_analytic():
    sim = Simulator.from_text(RC)
    res = sim.transient()
    vals = dict(sim.measure(res))
    tau = 1e-6
    # v(t) = 1 - exp(-t/tau): crossing 0.632 at ~tau (BE discretization
    # error at dt=10n is ~dt/2 per unit tau)
    assert vals["t63"] == pytest.approx(-tau * math.log(1 - 0.632), rel=2e-2)
    # the ~1e-3 settling deficit is the reference's damped-Newton
    # step-size stopping rule (alpha=0.45, tol=1e-6), replicated here
    assert vals["vmax"] == pytest.approx(1.0, abs=3e-3)
    assert vals["vavg"] == pytest.approx(1.0, abs=1e-2)
    assert vals["vrms"] == pytest.approx(1.0, abs=1e-2)
    # charge drawn from the source: Q = C*V (source current is -C dv/dt)
    assert vals["q"] == pytest.approx(-1e-9, rel=2e-2)
    assert vals["vat"] == pytest.approx(1 - math.exp(-1.0), rel=2e-2)
    # in-to-out 50% delay of an RC: tau*ln(2)
    assert vals["tpd"] == pytest.approx(tau * math.log(2), rel=3e-2)
    assert vals["vpp"] == pytest.approx(1.0, abs=3e-3)
    assert vals["tmax"] == pytest.approx(10e-6, rel=1e-2)


SINE = """* sine measures
V1 a 0 SIN 0 2 1e6
R1 a 0 1k
.TRAN 1n 3u
.MEASURE TRAN arms RMS V(a) FROM=0 TO=3u
.MEASURE TRAN aavg AVG V(a) FROM=0 TO=3u
.MEASURE TRAN across WHEN V(a)=0 CROSS=2
.MEASURE TRAN afall WHEN V(a)=0 FALL=1
.MEASURE TRAN alast WHEN V(a)=0 FALL=LAST
.MEASURE TRAN amin MIN V(a) FROM=0 TO=1u
"""


def test_sine_measures():
    sim = Simulator.from_text(SINE)
    res = sim.transient()
    vals = dict(sim.measure(res))
    assert vals["arms"] == pytest.approx(2 / math.sqrt(2), rel=1e-3)
    assert vals["aavg"] == pytest.approx(0.0, abs=1e-3)
    # zero crossings of sin(2*pi*1e6*t): t=0.5us (fall), 1.0us (rise), ...
    assert vals["afall"] == pytest.approx(0.5e-6, rel=1e-3)
    assert vals["across"] == pytest.approx(1.0e-6, rel=1e-3)
    assert vals["alast"] == pytest.approx(2.5e-6, rel=1e-3)
    assert vals["amin"] == pytest.approx(-2.0, abs=2e-3)


def test_failed_measure_is_nan():
    sim = Simulator.from_text(
        "V1 a 0 DC 1\nR1 a 0 1k\n.TRAN 1n 10n\n"
        ".MEASURE TRAN nope WHEN V(a)=5 RISE=1\n"
        ".MEASURE TRAN badnode MAX V(zzz)\n")
    res = sim.transient()
    vals = dict(sim.measure(res))
    assert math.isnan(vals["nope"])
    assert math.isnan(vals["badnode"])


def test_measure_native_frontend_parity():
    from circuitsimulator_tpu import native
    if not native.available():
        pytest.skip("native frontend not built")
    import dataclasses

    def canon(m):
        d = dataclasses.asdict(m)
        for p in (d["probe"], d["ev1"]["probe"], d["ev2"]["probe"]):
            p.pop("expr")       # native frontend does not carry raw text
        return d

    for text in (RC, SINE):
        _, sim_py = parse_netlist_text(text)
        _, sim_nat = native.parse_netlist_text_native(text)
        assert len(sim_nat.measures) == len(sim_py.measures)
        for a, b in zip(sim_nat.measures, sim_py.measures):
            assert canon(a) == canon(b), (a, b)


RC_AC = """* rc lowpass, f3db = 1/(2 pi RC) ~= 159.15 kHz
V1 in 0 DC 0 AC 1
R1 in out 1k
C1 out 0 1n
.AC dec 50 1e3 1e7
.MEASURE AC f3db WHEN VDB(out)=-3.0103 FALL=1
.MEASURE AC dc_gain MAX V(out)
.MEASURE AC gain_at FIND VDB(out) AT=159.155e3
.MEASURE AC ph90 WHEN VP(out)=-45 FALL=1
"""


def test_ac_measures_lowpass():
    sim = Simulator.from_text(RC_AC)
    acres = sim.ac()
    vals = dict(sim.measure(acres, analysis="ac"))
    f0 = 1.0 / (2 * np.pi * 1e3 * 1e-9)
    # -3 dB corner (the .AC grid is log-spaced; interpolation is linear
    # in f, so allow a grid-scale tolerance)
    assert vals["f3db"] == pytest.approx(f0, rel=2e-2)
    assert vals["dc_gain"] == pytest.approx(1.0, abs=1e-3)
    assert vals["gain_at"] == pytest.approx(-3.0103, abs=0.05)
    assert vals["ph90"] == pytest.approx(f0, rel=2e-2)


def test_dc_measures_sweep():
    sim = Simulator.from_text("""* diode turn-on vs source
V1 in 0 DC 0
R1 in a 1k
D1 a 0 IS=1e-14
.DC V1 0 2 0.05
.MEASURE DC von WHEN V(a)=0.6 RISE=1
.MEASURE DC vmax MAX V(a)
""")
    swres = sim.dc_sweep()
    vals = dict(sim.measure(swres, analysis="dc"))
    # the crossing is in swept-source units: V1 where V(a) hits 0.6
    assert 0.6 < vals["von"] < 1.5
    a_eq = sim.circuit.nodes[sim.circuit.node_name_to_id["a"]].eq_index
    assert vals["vmax"] == pytest.approx(
        float(np.asarray(swres.xs)[:, a_eq].max()), rel=1e-9)


def test_probe_modifier_parsing():
    _, sim = parse_netlist_text(
        "V1 a 0 1\nR1 a 0 1\n.AC lin 1 1 1\n"
        ".MEASURE AC m1 MAX VDB(a)\n.MEASURE AC m2 MAX VP(a)\n"
        ".MEASURE AC m3 MAX VR(a)\n.MEASURE AC m4 MAX VI(a)\n"
        ".MEASURE AC m5 MAX VM(a)\n")
    mods = [m.probe.mod for m in sim.measures]
    assert mods == ["db", "ph", "re", "im", ""]


def test_probe_modifier_native_parity():
    from circuitsimulator_tpu import native
    if not native.available():
        pytest.skip("native frontend not built")
    text = ("V1 a 0 1\nR1 a 0 1\n.AC lin 1 1 1\n"
            ".MEASURE AC m1 MAX VDB(a)\n.MEASURE AC m2 WHEN VP(a,0)=-45\n")
    _, sp = parse_netlist_text(text)
    _, sn = native.parse_netlist_text_native(text)
    assert sp.measures[0].probe.mod == sn.measures[0].probe.mod == "db"
    assert sp.measures[1].ev1.probe.mod == "ph"
    assert sn.measures[1].ev1.probe.mod == "ph"
    assert sn.measures[1].ev1.probe.kind == "dv"


def test_measure_report_smoke():
    from circuitsimulator_tpu.analysis.measure import measure_report
    out = measure_report([("a", 1.0), ("b", math.nan)])
    assert "FAILED" in out and "a" in out


def test_derived_param_measure():
    sim = Simulator.from_text("""* derived measures
.PARAM scalefac=2
V1 in 0 PULSE(0 1 0 1n 1n 1 2)
R1 in out 1k
C1 out 0 1n
.TRAN 10n 8u
.MEASURE TRAN t63 WHEN V(out)=0.632 RISE=1
.MEASURE TRAN t90 WHEN V(out)=0.9 RISE=1
.MEASURE TRAN spread PARAM='t90 - t63'
.MEASURE TRAN scaled PARAM='scalefac * t63'
""")
    res = sim.transient()
    vals = dict(sim.measure(res))
    assert vals["spread"] == pytest.approx(vals["t90"] - vals["t63"],
                                           rel=1e-12)
    assert vals["scaled"] == pytest.approx(2 * vals["t63"], rel=1e-12)


def test_derived_param_measure_streaming():
    sim = Simulator.from_text("""* derived in a step sweep
.PARAM rr=1k
V1 in 0 PULSE(0 1 0 1n 1n 1 2)
R1 in out {rr}
C1 out 0 1n
.TRAN 20n 8u
.STEP PARAM rr LIST 1k 2k
.MEASURE TRAN t63 WHEN V(out)=0.632 RISE=1
.MEASURE TRAN t63us PARAM='t63 * 1e6'
""")
    sres = sim.step(save_xs=False)
    vals = dict(sres.measures)
    np.testing.assert_allclose(vals["t63us"], vals["t63"] * 1e6, rtol=1e-12)


def test_derived_param_native_parity():
    from circuitsimulator_tpu import native
    if not native.available():
        pytest.skip("native frontend not built")
    import dataclasses
    text = ("V1 a 0 1\nR1 a 0 1k\n.TRAN 1n 10n\n"
            ".MEASURE TRAN m1 MAX V(a)\n"
            ".MEASURE TRAN m2 PARAM='2*m1 + 1'\n"
            ".MEASURE TRAN bad PARAM='v(a)'\n")   # probes invalid here
    _, sp = parse_netlist_text(text)
    _, sn = native.parse_netlist_text_native(text)
    assert len(sp.measures) == len(sn.measures) == 2
    assert sp.measures[1].kind == sn.measures[1].kind == "param"
    assert sp.measures[1].expr == sn.measures[1].expr == "2*m1 + 1"
