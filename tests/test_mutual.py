"""K coupled inductors (mutual inductance, extension): transient, AC,
and frontend parity."""

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator
from circuitsimulator_tpu.netlist.parser import parse_netlist_text


def xfmr_net(k="0.8", l1="1m", l2="4m", rload="1e6", extra=""):
    return f"""* transformer
V1 in 0 SIN 0 1 1e5
R1 in p 10
L1 p 0 {l1}
L2 s 0 {l2}
R2 s 0 {rload}
K1 L1 L2 {k}
{extra}.TRAN 1e-8 5e-5
"""


def node_eq(sim, name):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index


def test_open_secondary_voltage_ratio_transient():
    # secondary ~open: v2/vL1 = M/L1 = k*sqrt(L2/L1) = 0.8*2 = 1.6
    sim = Simulator.from_text(xfmr_net())
    res = sim.transient()
    xs = np.asarray(res.xs)
    vp = xs[:, node_eq(sim, "p")]
    vs = xs[:, node_eq(sim, "s")]
    half = len(vp) // 2
    ratio = (np.linalg.norm(vs[half:]) / np.linalg.norm(vp[half:]))
    assert ratio == pytest.approx(1.6, rel=2e-2)


def test_k_zero_is_uncoupled():
    xs_k0 = np.asarray(
        Simulator.from_text(xfmr_net(k="0")).transient().xs)
    xs_nok = np.asarray(
        Simulator.from_text(
            xfmr_net().replace("K1 L1 L2 0.8\n", "")).transient().xs)
    np.testing.assert_allclose(xs_k0, xs_nok, atol=1e-12)


def test_coupling_symmetric():
    a = np.asarray(Simulator.from_text(xfmr_net()).transient().xs)
    b = np.asarray(Simulator.from_text(
        xfmr_net().replace("K1 L1 L2 0.8", "K1 L2 L1 0.8")).transient().xs)
    np.testing.assert_allclose(a, b, atol=1e-12)


def test_ac_secondary_ratio():
    # AC: secondary open -> V(s)/V(p) = M/L1 (frequency-independent)
    net = xfmr_net().replace("V1 in 0 SIN 0 1 1e5",
                             "V1 in 0 DC 0 AC 1") \
                    .replace(".TRAN 1e-8 5e-5", ".AC dec 3 1e4 1e6")
    sim = Simulator.from_text(net)
    acres = sim.ac()
    xs = np.asarray(acres.xs)
    ratio = np.abs(xs[:, node_eq(sim, "s")] / xs[:, node_eq(sim, "p")])
    np.testing.assert_allclose(ratio, 1.6, rtol=1e-3)


def test_ideal_transformer_impedance():
    # k ~ 1, big L: Zin ~ Rload * (L1/L2) = 100 * (1m/4m) = 25 ohm
    net = """* loaded transformer
V1 in 0 DC 0 AC 1
Vam in p 0
L1 p 0 1
L2 s 0 4
R2 s 0 100
K1 L1 L2 0.99999
.AC lin 1 1e5 1e5
"""
    sim = Simulator.from_text(net)
    acres = sim.ac()
    xs = np.asarray(acres.xs)
    # branch current of the ammeter Vam
    br = None
    for e in sim.circuit.elements:
        if e.name == "Vam":
            br = e.branch_eq
    i_in = xs[0, br]
    # the series ammeter's branch current is defined p->m = in->p, i.e.
    # the current delivered into the network
    z_in = 1.0 / i_in
    # exact coupled-coil input impedance:
    #   Zin = jwL1 + (wM)^2 / (R2 + jwL2)
    w = 2 * np.pi * 1e5
    l1, l2, r2, k = 1.0, 4.0, 100.0, 0.99999
    m = k * np.sqrt(l1 * l2)
    z_exact = 1j * w * l1 + (w * m) ** 2 / (r2 + 1j * w * l2)
    assert z_in == pytest.approx(z_exact, rel=1e-6)
    # ideal-transformer limit: Re(Zin) -> Rload * L1/L2 * k^2 = 25 * k^2
    assert z_in.real == pytest.approx(25.0, rel=1e-3)


def test_mutual_native_frontend_parity():
    from circuitsimulator_tpu import native
    if not native.available():
        pytest.skip("native frontend not built")
    import dataclasses
    text = xfmr_net()
    ckt_py, _ = parse_netlist_text(text)
    ckt_nat, _ = native.parse_netlist_text_native(text)
    ckt_py.assign_equation_indices()
    ckt_nat.assign_equation_indices()
    for a, b in zip(ckt_nat.elements, ckt_py.elements):
        assert dataclasses.asdict(a) == dataclasses.asdict(b), (a, b)


def test_mutual_in_subckt():
    net = """* subckt transformer
.SUBCKT xfmr a b
L1 a 0 1m
L2 b 0 4m
K1 L1 L2 0.8
.ENDS
V1 in 0 SIN 0 1 1e5
R1 in p 10
X1 p s xfmr
R2 s 0 1e6
.TRAN 1e-8 5e-5
"""
    sim = Simulator.from_text(net)
    res = sim.transient()
    xs = np.asarray(res.xs)
    vp = xs[:, node_eq(sim, "p")]
    vs = xs[:, node_eq(sim, "s")]
    half = len(vp) // 2
    ratio = np.linalg.norm(vs[half:]) / np.linalg.norm(vp[half:])
    assert ratio == pytest.approx(1.6, rel=2e-2)


def test_unknown_inductor_skipped(capsys):
    sim = Simulator.from_text(
        "V1 a 0 DC 1\nR1 a b 1\nL1 b 0 1m\nK1 L1 Lzz 0.5\n.op\n")
    x = sim.dc()        # must not crash; K skipped with a warning
    assert np.isfinite(np.asarray(x)).all()
