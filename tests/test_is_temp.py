"""IS(T) temperature scaling for diodes and BJTs (EG/XTI keys, extension;
opt-in — without the keys `.TEMP` keeps the vt-only reference semantics)."""

import math

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator

VT0 = 0.025852
K_B, Q_E = 1.380649e-23, 1.602176634e-19


def vt_at(temp_c):
    return K_B * (273.15 + temp_c) / Q_E


def diode_deck(temp_line, keys=""):
    return f"""* diode vf
I1 0 a DC 1m
D1 a 0 IS=1e-14{keys}
{temp_line}
.op
"""


def vf(sim):
    x = sim.dc(polish=True)
    eq = sim.circuit.nodes[sim.circuit.node_name_to_id["a"]].eq_index
    return float(x[eq])


def test_without_keys_temp_only_scales_vt():
    # reference-parity semantics: Vf = n*vt*ln(1 + I/IS) with IS fixed
    sim = Simulator.from_text(diode_deck(".TEMP 100"))
    vt = vt_at(100.0)
    want = vt * math.log(1.0 + 1e-3 / 1e-14)
    assert vf(sim) == pytest.approx(want, abs=1e-6)


def test_eg_xti_scales_is():
    # with EG/XTI the saturation current grows with T, dropping Vf ~ -2mV/C
    sim_hot = Simulator.from_text(diode_deck(".TEMP 100",
                                             " EG=1.11 XTI=3"))
    vt = vt_at(100.0)
    is_hot = 1e-14 * (vt / VT0) ** 3 * math.exp(1.11 * (1 / VT0 - 1 / vt))
    want = vt * math.log(1.0 + 1e-3 / is_hot)
    assert vf(sim_hot) == pytest.approx(want, abs=1e-6)
    # sanity: the classic silicon signature — forward drop FALLS with T
    sim_cold = Simulator.from_text(diode_deck("", " EG=1.11 XTI=3"))
    assert vf(sim_hot) < vf(sim_cold) - 0.1


def test_nominal_temp_is_identity():
    v0 = vf(Simulator.from_text(diode_deck("")))
    v1 = vf(Simulator.from_text(diode_deck("", " EG=1.11 XTI=3")))
    assert v0 == pytest.approx(v1, abs=1e-12)


def test_step_temp_with_eg():
    sim = Simulator.from_text("""* step temp diode
I1 0 a DC 1m
D1 a 0 IS=1e-14 EG=1.11 XTI=3
R1 a 0 1e9
.STEP TEMP LIST 27 127
.op
""")
    res = sim.step()
    eq = sim.circuit.nodes[sim.circuit.node_name_to_id["a"]].eq_index
    v = np.asarray(res.result)[..., eq].ravel()
    vt = vt_at(127.0)
    is_hot = 1e-14 * (vt / VT0) ** 3 * math.exp(1.11 * (1 / VT0 - 1 / vt))
    # .STEP's batched DC is the ramped (unpolished) solve — gmin-scale
    # leak shifts Vf by a few 0.1 mV (reference quirk)
    assert v[0] == pytest.approx(VT0 * math.log(1 + 1e-3 / 1e-14), abs=1e-3)
    assert v[1] == pytest.approx(vt * math.log(1 + 1e-3 / is_hot), abs=1e-3)
    assert v[1] < v[0] - 0.1          # the EG signature survives the leak


def test_bjt_eg_scales_vbe():
    deck = """* bjt vbe vs temp
Vcc c 0 DC 5
I1 0 b DC 10u
Q1 c b 0 qn
.MODEL qn NPN IS=1e-15 BF=100 EG=1.11 XTI=3
{temp}
.op
"""
    def vbe(temp_line):
        sim = Simulator.from_text(deck.replace("{temp}", temp_line))
        x = sim.dc(polish=True)
        eq = sim.circuit.nodes[sim.circuit.node_name_to_id["b"]].eq_index
        return float(x[eq])
    # Vbe falls roughly 1.5-2.5 mV/C over 100 C
    drop = vbe("") - vbe(".TEMP 127")
    assert 0.15 < drop < 0.30


def test_native_parity_eg():
    from circuitsimulator_tpu import native
    if not native.available():
        pytest.skip("native frontend not built")
    import dataclasses
    from circuitsimulator_tpu.netlist.parser import parse_netlist_text
    text = ("D1 a 0 IS=1e-14 EG=1.11 XTI=3\n"
            ".MODEL qn NPN IS=1e-15 EG=0.8 XTI=2\nQ1 a a 0 qn\n"
            "R1 a 0 1k\n.op\n")
    ckt_py, _ = parse_netlist_text(text)
    ckt_nat, _ = native.parse_netlist_text_native(text)
    ckt_py.assign_equation_indices()
    ckt_nat.assign_equation_indices()
    for a, b in zip(ckt_nat.elements, ckt_py.elements):
        assert dataclasses.asdict(a) == dataclasses.asdict(b), (a, b)
