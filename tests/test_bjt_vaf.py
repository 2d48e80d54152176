"""BJT Early voltage (VAF, extension) and JFET channel noise."""

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator
from circuitsimulator_tpu.netlist.parser import parse_netlist_text


def node_eq(sim, name):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index


def ce_amp(vaf):
    return f"""* common emitter
.MODEL qn NPN IS=1e-15 BF=100 {"VAF=" + str(vaf) if vaf else ""}
Vcc vcc 0 DC 10
Vb b 0 DC 0.65
Rc vcc c 1k
Q1 c b 0 qn
.TF V(c) Vb
.op
"""


def test_vaf_gives_finite_output_conductance():
    # Early effect: gce ~ Ic/VAF; without it the .TF Rout is exactly Rc
    sim0 = Simulator.from_text(ce_amp(0))
    res0 = sim0.tf()
    assert float(res0.r_out) == pytest.approx(1000.0, rel=1e-6)
    sim1 = Simulator.from_text(ce_amp(50))
    res1 = sim1.tf()
    x = sim1.dc(polish=True)
    # collector current from the drop across Rc
    ic = (10.0 - float(x[node_eq(sim1, "c")])) / 1000.0
    vce = float(x[node_eq(sim1, "c")])
    # gce = d Ic / d Vce = Ict/(VAF + ...): ~ Ic / (VAF + Vce)
    gce = ic / (50.0 + vce)
    expect_rout = 1.0 / (1e-3 + gce)
    assert float(res1.r_out) == pytest.approx(expect_rout, rel=2e-2)
    # with Ic ~ 0.1 mA the Early conductance is small but strictly lowers Rout
    assert float(res1.r_out) < float(res0.r_out) - 1.0


def test_vaf_increases_ic_with_vce():
    net = """* ic vs vce
.MODEL qn NPN IS=1e-15 BF=100 VAF=30
Vce c 0 DC {v}
Vb b 0 DC 0.65
Q1 c b 0 qn
.op
"""
    def ic(v):
        sim = Simulator.from_text(net.replace("{v}", str(v)))
        x = sim.dc(polish=True)
        # collector current = branch current of Vce (current p->m internal)
        br = next(e for e in sim.circuit.elements if e.name == "Vce").branch_eq
        return -float(x[br])
    i2, i8 = ic(2.0), ic(8.0)
    # slope ~ Ic/VAF: from 2 V to 8 V expect ~ (1 + 8/30)/(1 + 2/30)
    assert i8 / i2 == pytest.approx((30 + 8) / (30 + 2), rel=2e-2)


def test_vaf_native_parity():
    from circuitsimulator_tpu import native
    if not native.available():
        pytest.skip("native frontend not built")
    import dataclasses
    text = ce_amp(75)
    ckt_py, _ = parse_netlist_text(text)
    ckt_nat, _ = native.parse_netlist_text_native(text)
    ckt_py.assign_equation_indices()
    ckt_nat.assign_equation_indices()
    for a, b in zip(ckt_nat.elements, ckt_py.elements):
        assert dataclasses.asdict(a) == dataclasses.asdict(b), (a, b)
    q = next(e for e in ckt_py.elements if e.kind == "Q")
    assert q.vaf == pytest.approx(75.0)


def test_jfet_channel_noise_counts():
    sim = Simulator.from_text("""* jfet noise
.MODEL j1 NJF VTO=-2 BETA=1e-3
Vdd vdd 0 DC 10
Vg g 0 DC 0
Rd vdd d 10k
J1 d g 0 j1
.NOISE V(d) Vg lin 1 1e3 1e3
.op
""")
    nres = sim.noise(out_node="d", freqs=np.asarray([1e3]))
    # gm = 2*beta*|VTO| = 4 mS; channel noise (2/3)*4kT*gm into Rd
    k_b, temp = 1.380649e-23, 300.218
    s_ch = (2.0 / 3.0) * 4 * k_b * temp * 4e-3
    # output sees it through Rd (gds=0 w/o lambda): onoise ~ s_ch*Rd^2 + R noise
    s_rd = 4 * k_b * temp / 1e4
    expect = (s_ch + s_rd) * 1e4 ** 2
    assert float(np.asarray(nres.onoise)[0]) == pytest.approx(expect,
                                                              rel=2e-2)
