"""DC sensitivity (.SENS, analysis/sensitivity.py): closed forms and
finite-difference cross-checks across device classes."""

import numpy as np
import jax.numpy as jnp
import pytest

from circuitsimulator_tpu.api import Simulator
from circuitsimulator_tpu.analysis.sensitivity import dc_sensitivity
from circuitsimulator_tpu.utils.options import DEFAULT_OPTIONS

F64 = DEFAULT_OPTIONS.replace(dtype=jnp.float64)


def veq(sim, name):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index


def fd_check(sim, out_eq, key, idx, rel=1e-6):
    """Central finite difference of V(out) wrt params[key][idx], evaluated
    at the same polished (gmin=0) solution the adjoint uses."""
    from circuitsimulator_tpu.analysis.sensitivity import _polish
    from circuitsimulator_tpu.analysis.dc import dc_operating_point
    base = sim.params[key]
    h = float(np.asarray(base)[idx]) * rel or rel

    def f(v):
        p = dict(sim.params)
        p[key] = base.at[idx].set(v)
        x = _polish(sim.engine, p, dc_operating_point(sim.engine, p))
        return float(np.asarray(x)[out_eq])

    v0 = float(np.asarray(base)[idx])
    return (f(v0 + h) - f(v0 - h)) / (2 * h)


def test_divider_closed_form():
    net = """\
V1 in 0 2
R1 in out 1k
R2 out 0 3k
.SENS V(out)
"""
    sim = Simulator.from_text(net, opts=F64)
    grads, rows = sim.sensitivity()
    r1, r2, v = 1e3, 3e3, 2.0
    dR1 = -v * r2 / (r1 + r2) ** 2
    dR2 = v * r1 / (r1 + r2) ** 2
    dV = r2 / (r1 + r2)
    g = {k: np.asarray(val) for k, val in grads.items()
         if hasattr(val, "shape")}
    np.testing.assert_allclose(g["res_r"], [dR1, dR2], rtol=1e-12)
    np.testing.assert_allclose(g["vs_dc"], [dV], rtol=1e-12)
    # report is sorted by |dV/dp|, voltage-source gain first
    assert rows[0][0] == "d/dDC(V1)"


def test_nonlinear_fd_cross_check():
    net = """\
VDD vdd 0 5
VIN in 0 1.1
M1 out in 0 n 10u 1u 2
RL vdd out 20k
D1 out 0 IS=1e-13 N=1.2
.MODEL 2 VT 0.7 MU 3e-2 COX 1e-3 LAMBDA 0.05
"""
    sim = Simulator.from_text(net, opts=F64)
    out = veq(sim, "out")
    grads, x, rnorm = dc_sensitivity(sim.engine, sim.params, out)
    assert float(rnorm) < 1e-10
    for key, idx in [("res_r", 0), ("mos_vth", 0), ("mos_k", 0),
                     ("dio_is", 0), ("dio_n", 0), ("vs_dc", 1),
                     ("vt_thermal", ())]:
        adj = float(np.asarray(grads[key])[idx] if idx != () else
                    np.asarray(grads[key]))
        fd = fd_check(sim, out, key, idx)
        np.testing.assert_allclose(adj, fd, rtol=1e-5, atol=1e-14,
                                   err_msg=key)


def test_controlled_source_sensitivity():
    net = """\
V1 in 0 2
E1 amp 0 in 0 4
R1 amp out 1k
R2 out 0 1k
"""
    sim = Simulator.from_text(net, opts=F64)
    out = veq(sim, "out")
    grads, _, _ = dc_sensitivity(sim.engine, sim.params, out)
    # V(out) = gain * 2 * 0.5 -> d/dgain = 1.0
    np.testing.assert_allclose(np.asarray(grads["vcvs_gain"]), [1.0],
                               rtol=1e-12)


def test_sens_cli_and_errors(capsys):
    sim = Simulator.from_text("V1 a 0 1\nR1 a 0 1k\n", opts=F64)
    with pytest.raises(ValueError, match=".SENS card missing"):
        sim.sensitivity()
    with pytest.raises(ValueError, match="ground"):
        sim.sensitivity(out_node="0")
    from circuitsimulator_tpu.cli import main
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.sp")
        with open(path, "w") as f:
            f.write("V1 in 0 2\nR1 in out 1k\nR2 out 0 3k\n.SENS V(out)\n")
        assert main([path, "--no-tran", "--platform", "cpu"]) == 0
    out = capsys.readouterr().out
    assert "DC sensitivities of V(out)" in out
    assert "d/dDC(V1)" in out


def test_transient_sensitivity_jvp_vs_fd():
    """Forward-mode waveform sensitivity through the full transient (DC
    init + while_loop Newton + scan) against central finite differences."""
    from circuitsimulator_tpu.analysis.sensitivity import (
        transient_sensitivity, unit_tangent)
    net = """\
V1 in 0 PULSE 0 1 0 1e-12 1e-12 1 2
R1 in out 1k
C1 out 0 1u
D1 out 0 IS=1e-12 N=1
.TRAN 1e-4 1e-3
"""
    sim = Simulator.from_text(net, opts=F64)
    out = veq(sim, "out")
    for key, idx in [("res_r", 0), ("cap_c", 0)]:
        tan = unit_tangent(sim.params, key, idx)
        xs, dxs = transient_sensitivity(sim.engine, sim.params, tan,
                                        1e-4, 1e-3)
        h = float(np.asarray(sim.params[key])[idx]) * 1e-6
        ps = {s: dict(sim.params) for s in ("+", "-")}
        ps["+"][key] = sim.params[key].at[idx].add(h)
        ps["-"][key] = sim.params[key].at[idx].add(-h)
        from circuitsimulator_tpu.analysis.transient import run_transient
        fd = (np.asarray(run_transient(sim.engine, ps["+"], 1e-4, 1e-3).xs)
              - np.asarray(run_transient(sim.engine, ps["-"], 1e-4,
                                         1e-3).xs)) / (2 * h)
        scale = max(np.abs(np.asarray(dxs)[:, out]).max(), 1e-12)
        np.testing.assert_allclose(np.asarray(dxs)[:, out], fd[:, out],
                                   atol=3e-3 * scale, rtol=0,
                                   err_msg=key)
        assert np.abs(np.asarray(dxs)[:, out]).max() > 0
