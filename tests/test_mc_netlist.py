"""Netlist-driven Monte Carlo: DEV=/LOT= tolerances on R/C/L cards."""

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator
from circuitsimulator_tpu.netlist.parser import parse_netlist_text


DECK = """* mc divider
V1 in 0 DC 1
R1 in out 1k DEV=5%
R2 out 0 1k DEV=5% LOT=2%
.op
"""


def test_tolerances_parse():
    ckt, _ = parse_netlist_text(DECK)
    r1 = next(e for e in ckt.elements if e.name == "R1")
    r2 = next(e for e in ckt.elements if e.name == "R2")
    assert (r1.dev_tol, r1.lot_tol) == (pytest.approx(0.05), 0.0)
    assert (r2.dev_tol, r2.lot_tol) == (pytest.approx(0.05),
                                        pytest.approx(0.02))


def test_mc_tols_lowered():
    sim = Simulator.from_text(DECK)
    dev, lot = sim.lowered.mc_tols["res_r"]
    assert dev.tolist() == [0.05, 0.05]
    assert lot.tolist() == [0.0, 0.02]


def test_monte_carlo_dc_spread():
    sim = Simulator.from_text(DECK)
    bp, xs = sim.monte_carlo(512, seed=1)
    out_eq = sim.circuit.nodes[sim.circuit.node_name_to_id["out"]].eq_index
    v = np.asarray(xs)[:, out_eq]
    # nominal divider: 0.5; 5% sigma on each R gives ~1.8% sigma on V(out)
    assert abs(v.mean() - 0.5) < 0.01
    assert 0.005 < v.std() < 0.05
    # lanes actually differ
    assert len(np.unique(np.round(v, 9))) > 400


def test_lot_is_shared_within_lane():
    # two resistors with ONLY LOT tolerance stay perfectly matched, so a
    # divider built from them never moves
    sim = Simulator.from_text("""* lot only
V1 in 0 DC 1
R1 in out 1k LOT=10%
R2 out 0 1k LOT=10%
.op
""")
    bp, xs = sim.monte_carlo(64, seed=2)
    r = np.asarray(bp["res_r"])
    assert np.abs(r[:, 0] - r[:, 1]).max() < 1e-9      # same draw per lane
    assert r[:, 0].std() > 10.0                        # but lanes spread
    out_eq = sim.circuit.nodes[sim.circuit.node_name_to_id["out"]].eq_index
    v = np.asarray(xs)[:, out_eq]
    assert np.abs(v - 0.5).max() < 1e-6


def test_monte_carlo_with_measures():
    sim = Simulator.from_text("""* mc rc
V1 in 0 PULSE(0 1 0 1n 1n 1 1)
R1 in out 1k DEV=10%
C1 out 0 1u DEV=10%
.TRAN 5e-5 2e-3
.MEASURE TRAN vend FIND V(out) AT=1e-3
.end
""")
    bp, vals = sim.monte_carlo(128, seed=3)
    v = np.asarray(vals["vend"]).ravel()
    # nominal: 1 - e^-1 = 0.632; tau spread moves it
    assert abs(np.median(v) - 0.632) < 0.02
    assert v.std() > 0.01


def test_monte_carlo_requires_tolerances():
    sim = Simulator.from_text("""* no tols
V1 a 0 DC 1
R1 a 0 1k
.op
""")
    with pytest.raises(ValueError):
        sim.monte_carlo(8)


def test_native_parity_tols():
    from circuitsimulator_tpu import native
    if not native.available():
        pytest.skip("native frontend not built")
    import dataclasses
    ckt_py, _ = parse_netlist_text(DECK)
    ckt_nat, _ = native.parse_netlist_text_native(DECK)
    ckt_py.assign_equation_indices()
    ckt_nat.assign_equation_indices()
    for a, b in zip(ckt_nat.elements, ckt_py.elements):
        assert dataclasses.asdict(a) == dataclasses.asdict(b), (a, b)


def test_cli_run_mc(tmp_path, capsys):
    from circuitsimulator_tpu.cli import main
    deck = tmp_path / "mc.sp"
    deck.write_text(DECK)
    out = tmp_path / "mc.csv"
    rc = main([str(deck), str(tmp_path / "t.csv"),
               "--run-mc", "32", "--run-mc-out", str(out)])
    assert rc == 0
    lines = out.read_text().splitlines()
    assert lines[0].startswith("lane,")
    assert len(lines) == 33
    assert "Monte-Carlo" in capsys.readouterr().out


# ---- device-model tolerances (MOS VT / JFET VTO / diode IS / BJT BF) ----

DEVICE_DECK = """* device mismatch MC
.MODEL mn VT 0.6 MU 2e-2 COX 1e-3
.MODEL qn NPN IS=1e-15 BF=120
.MODEL jn NJF VTO=-2 BETA=1m
VDD vdd 0 3
VIN g 0 1.2
RD vdd d 10k
M1 d g 0 b mn W=10u L=1u DEV=5%
D1 d 0 IS=1e-14 DEV=0.1 LOT=0.2
Q1 vdd g e qn DEV=0.08
RE e 0 1k
J1 vdd g s jn LOT=3%
RS s 0 1k
.op
"""


def test_device_tols_lowered():
    sim = Simulator.from_text(DEVICE_DECK)
    tols = {k: (v[0].tolist(), v[1].tolist())
            for k, v in sim.lowered.mc_tols.items()}
    assert tols["mos_vth"] == ([0.05], [0.0])
    assert tols["dio_is"] == ([0.1], [0.2])
    assert tols["bjt_bf"] == ([0.08], [0.0])
    assert tols["jf_vto"] == ([0.0], [0.03])


def test_device_mc_perturbs_right_leaves():
    sim = Simulator.from_text(DEVICE_DECK)
    bp, xs = sim.monte_carlo(128, seed=3)
    vth = np.asarray(bp["mos_vth"])[:, 0]
    assert 0.01 < vth.std() / vth.mean() < 0.10       # ~5% lognormal
    bf = np.asarray(bp["bjt_bf"])[:, 0]
    assert 0.03 < bf.std() / bf.mean() < 0.15
    # untol'd leaves stay uniform across lanes
    k = np.asarray(bp["mos_k"])
    assert np.all(k == k[0])
    assert np.asarray(xs).shape[0] == 128
    # JFET VTO is negative; lognormal keeps the sign
    vto = np.asarray(bp["jf_vto"])[:, 0]
    assert np.all(vto < 0)


def test_device_tols_native_parity():
    from circuitsimulator_tpu import native
    if not native.available():
        pytest.skip("native frontend not built")
    import dataclasses
    ckt_py, _ = parse_netlist_text(DEVICE_DECK)
    ckt_nat, _ = native.parse_netlist_text_native(DEVICE_DECK)
    ckt_py.assign_equation_indices()
    ckt_nat.assign_equation_indices()
    for a, b in zip(ckt_nat.elements, ckt_py.elements):
        assert dataclasses.asdict(a) == dataclasses.asdict(b), (a, b)


# ---- Monte-Carlo AC (batched lanes x frequencies) ----

def test_monte_carlo_ac_measures():
    net = """\
V1 in 0 DC 0 AC 1
R1 in out 1k DEV=5%
C1 out 0 159.155n DEV=5%
.AC DEC 20 10 100k
.MEASURE AC bw WHEN VDB(out)=-3 FALL=1
.MEASURE AC g0 FIND VM(out) AT=10
.MEASURE AC margin PARAM='bw/1000'
"""
    sim = Simulator.from_text(net)
    bp, vals = sim.monte_carlo(64, seed=5)
    bw = vals["bw"]
    assert bw.shape == (64,)
    # nominal corner 1 kHz; two 5% lognormal tolerances -> ~7% spread
    assert abs(bw.mean() - 1000) < 80
    assert 20 < bw.std() < 200
    np.testing.assert_allclose(vals["g0"], 1.0, atol=1e-3)
    np.testing.assert_allclose(vals["margin"], bw / 1000, rtol=1e-12)
