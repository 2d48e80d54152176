"""`.TF` DC transfer function (analysis/tf.py) — analytic and
finite-difference validation."""

import jax.numpy as jnp
import numpy as np
import pytest

from circuitsimulator_tpu import Simulator


DIVIDER = """* tf divider
V1 in 0 DC 5
R1 in out 1k
R2 out 0 2k
.TF V(out) V1
.op
"""


def test_divider_gain_rin_rout():
    sim = Simulator.from_text(DIVIDER)
    res = sim.tf()
    assert np.isclose(float(res.gain), 2.0 / 3.0, rtol=1e-9)
    assert np.isclose(float(res.r_in), 3000.0, rtol=1e-9)
    r1, r2 = 1000.0, 2000.0
    assert np.isclose(float(res.r_out), r1 * r2 / (r1 + r2), rtol=1e-9)


def test_isource_input():
    sim = Simulator.from_text("""* tf i-input
I1 0 n DC 1m
R1 n 0 4k
R2 n out 1k
R3 out 0 1k
.TF V(out) I1
""")
    res = sim.tf()
    # v(n) = Iin * (R1 || (R2+R3)); v(out) = v(n) * R3/(R2+R3)
    rin = 4000.0 * 2000.0 / 6000.0
    assert np.isclose(float(res.r_in), rin, rtol=1e-9)
    assert np.isclose(float(res.gain), rin * 0.5, rtol=1e-9)
    # Rout: R3 || (R2 + R1)
    rout = 1000.0 * 5000.0 / 6000.0
    assert np.isclose(float(res.r_out), rout, rtol=1e-9)


def test_current_output():
    sim = Simulator.from_text("""* tf i-out
V1 in 0 DC 5
R1 in mid 1k
Vam mid out 0
R2 out 0 2k
.TF I(Vam) V1
""")
    res = sim.tf()
    # transconductance magnitude: 1/(R1+R2)
    assert np.isclose(abs(float(res.gain)), 1.0 / 3000.0, rtol=1e-9)
    assert np.isclose(float(res.r_in), 3000.0, rtol=1e-9)
    assert res.r_out is None


MOS_AMP = """* common-source amp
.MODEL nm1 vt 0.7 mu 350u cox 2.3m lambda 0.02
Vdd vdd 0 DC 5
Vin g 0 DC 1.5
Rd vdd d 10k
M1 d g 0 nm1 W=0 L=0
.TF V(d) Vin
"""


def test_mos_amp_gain_matches_fd():
    # the MOS line uses the 7-token form: M name d g s model W L
    text = MOS_AMP.replace("M1 d g 0 nm1 W=0 L=0",
                           "M1 d g 0 nm1 1000u 1u")
    sim = Simulator.from_text(text)
    res = sim.tf()
    # analytic saturation-region small-signal model at the TF's polished
    # (gmin = 0) operating point: gm = K*Vov*(1+lam*Vds),
    # gds = 0.5*K*Vov^2*lam (Ids0 is Vds-independent in saturation),
    # gain = -gm/(gds + 1/Rd), Rout = 1/(gds + 1/Rd).
    out_eq = sim.circuit.nodes[sim.circuit.node_name_to_id["d"]].eq_index
    K = 350e-6 * 2.3e-3 * 1000.0
    vov, lam, rd = 1.5 - 0.7, 0.02, 1e4
    vds = float(res.x_op[out_eq])
    gm = K * vov * (1 + lam * vds)
    gds = 0.5 * K * vov * vov * lam
    assert float(res.gain) < -1.0          # inverting amplifier
    assert np.isclose(float(res.gain), -gm / (gds + 1 / rd), rtol=1e-9)
    assert np.isclose(float(res.r_out), 1 / (gds + 1 / rd), rtol=1e-9)
    # MOS gate input: infinite DC input resistance
    assert not np.isfinite(float(res.r_in))
    # finite differences on the converged-but-gmin-leaky reference solve
    # agree to the gmin/G scale (~0.3% here) — document, don't tighten
    h = 1e-5

    def vout(vin):
        p = dict(sim.params)
        p["vs_dc"] = jnp.asarray(p["vs_dc"]).at[1].set(vin)
        return float(sim.dc(params=p)[out_eq])

    fd = (vout(1.5 + h) - vout(1.5 - h)) / (2 * h)
    assert np.isclose(float(res.gain), fd, rtol=1e-2)


def test_tf_native_frontend_parity():
    from circuitsimulator_tpu import native
    if not native.available():
        pytest.skip("native frontend not built")
    import dataclasses
    from circuitsimulator_tpu.netlist.parser import parse_netlist_text
    for text in (DIVIDER,
                 DIVIDER.replace(".TF V(out) V1", ".TF V(out,in) V1"),
                 DIVIDER.replace(".TF V(out) V1", ".TF I(V1) V1")):
        _, sim_py = parse_netlist_text(text)
        _, sim_nat = native.parse_netlist_text_native(text)
        assert dataclasses.asdict(sim_nat.tf) == dataclasses.asdict(sim_py.tf)
        assert sim_py.tf.enabled


def test_tf_card_missing():
    sim = Simulator.from_text("V1 a 0 1\nR1 a 0 1k\n.op\n")
    with pytest.raises(ValueError):
        sim.tf()
