"""Gradient calibration API (Simulator.calibrate): recover parameters
from a waveform through the reverse-mode adjoint + optax Adam."""

import numpy as np
import jax.numpy as jnp

from circuitsimulator_tpu import Simulator


def test_recover_rc_from_waveform():
    # golden waveform from the true deck; start the fit 35% off
    sim = Simulator.from_text("""* rc cal
V1 in 0 PULSE(0 1 0 1n 1n 1 1)
R1 in out 1k
C1 out 0 1u
.TRAN 2e-5 2e-3
.end
""")
    eq = sim.circuit.nodes[sim.circuit.node_name_to_id["out"]].eq_index
    truth = np.asarray(sim.transient().xs)[:, eq]

    p0 = dict(sim.params)
    p0["res_r"] = sim.params["res_r"] * 1.35
    p0["cap_c"] = sim.params["cap_c"] * 0.7
    fitted, hist = sim.calibrate(truth, "out", ["res_r", "cap_c"],
                                 steps=150, lr=0.05, params=p0)
    assert hist[-1] < 1e-7
    assert hist[-1] < hist[0] * 1e-4
    # V(out) is driven through R1 into C1 only, so the waveform
    # identifies the time constant tau = R·C (not R and C separately)
    tau_true = float(sim.params["res_r"][0] * sim.params["cap_c"][0])
    tau_fit = float(fitted["res_r"][0] * fitted["cap_c"][0])
    assert abs(tau_fit - tau_true) / tau_true < 0.01


def test_recover_identifiable_divider():
    # a divider + cap makes BOTH R's identifiable (gain + time constant)
    sim = Simulator.from_text("""* div cal
V1 in 0 PULSE(0 1 0 1n 1n 1 1)
R1 in out 1k
R2 out 0 2k
C1 out 0 1u
.TRAN 2e-5 3e-3
.end
""")
    eq = sim.circuit.nodes[sim.circuit.node_name_to_id["out"]].eq_index
    truth = np.asarray(sim.transient().xs)[:, eq]
    p0 = dict(sim.params)
    p0["res_r"] = sim.params["res_r"] * jnp.asarray([1.4, 0.75])
    fitted, hist = sim.calibrate(truth, "out", ["res_r"],
                                 steps=250, lr=0.05, params=p0)
    r = np.asarray(fitted["res_r"])
    np.testing.assert_allclose(r, [1e3, 2e3], rtol=0.01)
