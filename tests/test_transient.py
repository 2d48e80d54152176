"""Transient analysis: analytic RC/RL checks + golden parity on the bundled
netlists, including exact Newton-iteration-count trajectory parity."""

import math

import numpy as np
import pytest

from circuitsimulator_tpu.api import Simulator
from circuitsimulator_tpu.io.csvout import read_csv


GMIN = 1e-6  # transient gmin-to-ground, tanalisis.cpp:243


def test_rc_backward_euler_recurrence_exact():
    # Current source into R || C.  The engine must reproduce the exact BE
    # recurrence *including* the reference's gmin-to-ground:
    #   (C/dt + 1/R + gmin) v_{k+1} = (C/dt) v_k + I
    R, C, dt, n = 1e3, 1e-6, 1e-4, 50
    sim = Simulator.from_text(
        f"I1 0 1 1m\nR1 1 0 {R}\nC1 1 0 {C}\n.TRAN {dt} {n*dt}\n")
    res = sim.transient()
    xs = np.asarray(res.xs)[:, 0]
    gc = C / dt
    vk = xs[0]
    assert vk == pytest.approx(1.0)  # linear DC solve has no gmin
    for k in range(1, n + 1):
        x_raw = (gc * vk + 1e-3) / (gc + 1.0 / R + GMIN)
        # the damped update loop with its early stop (tanalisis.cpp:364-371)
        for _ in range(50):
            v_new = vk + 0.45 * (x_raw - vk)
            err = abs(v_new - vk)
            vk = v_new
            if err < 1e-6:
                break
        assert xs[k] == pytest.approx(vk, abs=1e-12), k


def test_rc_charging_analytic():
    R, C = 1e3, 1e-9
    dt, tstop = 1e-8, 1e-6
    sim = Simulator.from_text(
        f"V1 1 0 PULSE(0 1 0 0 0 1 0)\nR1 1 2 {R}\nC1 2 0 {C}\n"
        f".TRAN {dt} {tstop}\n")
    res = sim.transient()
    xs = np.asarray(res.xs)
    ts = np.asarray(res.times)
    v2 = xs[:, 1]
    # full numpy mini-oracle: BE companion + the damped update loop with its
    # early stop (unknowns [v1, v2, iV]); the PULSE source is 1 for t>0
    g, gc = 1.0 / R, C / dt
    G = np.array([[g + GMIN, -g, 1.0],
                  [-g, g + gc + GMIN, 0.0],
                  [1.0, 0.0, 0.0]])
    x = np.zeros(3)       # DC: pulse contributes 0 at DC (evalDC)
    v2_prev = 0.0
    for k in range(1, len(ts)):
        rhs = np.array([0.0, gc * v2_prev, 1.0])
        x_raw = np.linalg.solve(G, rhs)
        for _ in range(50):
            x_new = x + 0.45 * (x_raw - x)
            err = np.linalg.norm(x_new - x)
            x = x_new
            if err < 1e-6:
                break
        v2_prev = x[1]
        assert v2[k] == pytest.approx(x[1], abs=1e-12), k
    # and it approximates the ODE
    assert v2[-1] == pytest.approx(1 - math.exp(-tstop / (R * C)), rel=0.05)


def test_rl_steady_current():
    # V source drives L through R; i settles at ~V/R (gmin adds a ~1e-5
    # relative perturbation)
    R, L = 10.0, 1e-6
    dt, n = 1e-8, 40
    sim = Simulator.from_text(
        f"V1 1 0 1\nR1 1 2 {R}\nL1 2 0 {L}\n.TRAN {dt} {n*dt}\n")
    res = sim.transient()
    xs = np.asarray(res.xs)
    iL = xs[:, -1]
    np.testing.assert_allclose(iL, np.full(n + 1, 0.1), rtol=1e-4)


@pytest.mark.parametrize("netlist,ref_iters", [("buffer", 6035),
                                               ("dbmixer", 492304)])
def test_transient_matches_reference_golden(netlist, ref_iters, goldens_dir,
                                            tmp_path):
    sim = Simulator.from_file(f"tests/netlists/{netlist}.sp")
    res = sim.transient()
    assert not bool(res.failed)
    # exact Newton-trajectory parity: same total iteration count as the
    # instrumented reference (BASELINE.md)
    assert int(res.newton_iters.sum()) == ref_iters
    out = tmp_path / f"{netlist}.csv"
    sim.write_transient_csv(str(out), res)
    h_ref, d_ref = read_csv(str(goldens_dir / f"{netlist}_tran.csv"))
    h_my, d_my = read_csv(str(out))
    assert h_ref == h_my
    assert d_ref.shape == d_my.shape
    # golden CSVs carry 9 significant digits; everything in these circuits is
    # O(1) volts / O(1e-3) amps, so 1e-8 absolute is print-precision parity
    np.testing.assert_allclose(d_my, d_ref, atol=2e-9, rtol=1e-7)


def test_csv_byte_format(tmp_path, goldens_dir):
    """First rows must match the reference byte-for-byte (same %.9e grid)."""
    sim = Simulator.from_file("tests/netlists/buffer.sp")
    res = sim.transient()
    out = tmp_path / "buffer.csv"
    sim.write_transient_csv(str(out), res)
    ref_lines = (goldens_dir / "buffer_tran.csv").read_text().splitlines()
    my_lines = out.read_text().splitlines()
    assert my_lines[0] == ref_lines[0]          # header identical
    # time column identical as text on every row
    for lr, lm in zip(ref_lines[1:], my_lines[1:]):
        assert lm.split(",")[0] == lr.split(",")[0]


def test_tstart_suppresses_rows(tmp_path):
    sim = Simulator.from_text(
        "V1 1 0 1\nR1 1 2 1k\nC1 2 0 1n\n.TRAN 1e-8 1e-7 5e-8\n")
    res = sim.transient()
    out = tmp_path / "o.csv"
    sim.write_transient_csv(str(out), res)
    _, d = read_csv(str(out))
    assert d[0, 0] >= 5e-8
    assert d.shape[0] == 6  # t = 5e-8 .. 1e-7


def test_vmapped_transient_equals_single():
    import jax
    import jax.numpy as jnp
    from circuitsimulator_tpu.analysis.transient import run_transient
    sim = Simulator.from_text(
        ".MODEL 2 VT 0.4 MU 1e-2 COX 1e-3 LAMBDA 0.05 CJ0 1e-14\n"
        "VDD 1 0 3\nVin 2 0 SIN 1 0.5 1e8\nRD 1 3 1k\n"
        "M1 3 2 0 n 10e-6 1e-6 2\nC1 3 0 1e-13\n.TRAN 1e-10 2e-8\n")
    res1 = sim.transient()
    B = 3
    bparams = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape),
                           sim.params)
    resB = jax.vmap(lambda p: run_transient(
        sim.engine, p, 1e-10, 2e-8))(bparams)
    assert resB.xs.shape == (B,) + res1.xs.shape
    for i in range(B):
        # lanes must agree with the single run to fp-reassociation level
        # (res1 went through jit, resB through vmap: XLA may fuse differently)
        np.testing.assert_allclose(np.asarray(resB.xs[i]),
                                   np.asarray(res1.xs), rtol=0, atol=1e-14)
    # all identical lanes must be bitwise identical to each other
    for i in range(1, B):
        np.testing.assert_array_equal(np.asarray(resB.xs[i]),
                                      np.asarray(resB.xs[0]))


def test_fast_newton_options_same_fixed_point():
    """tran_alpha=1 + predictor + update clamp change the Newton path, not
    the converged per-step solution (the bench.py fast configuration)."""
    import jax.numpy as jnp
    from circuitsimulator_tpu.utils.options import DEFAULT_OPTIONS
    net = """\
V1 vdd 0 5
VIN in 0 SIN 2.5 0.5 2e6
M1 out in vss n 20u 1u 1
Rl vdd out 10k
Rs vss 0 1k
C1 out 0 0.5p
.MODEL 1 VT 0.7 MU 5e-2 COX 2e-3 LAMBDA 0.02 CJ0 1e-14
.TRAN 1e-9 2e-7
"""
    o_ref = DEFAULT_OPTIONS.replace(dtype=jnp.float64)
    o_fast = o_ref.replace(tran_alpha=1.0, tran_predictor=True,
                           tran_newton_clamp=0.5)
    r_ref = Simulator.from_text(net, opts=o_ref).transient()
    r_fast = Simulator.from_text(net, opts=o_fast).transient()
    assert not bool(r_ref.failed) and not bool(r_fast.failed)
    np.testing.assert_allclose(np.asarray(r_fast.xs), np.asarray(r_ref.xs),
                               rtol=0, atol=5e-5)
    assert float(r_fast.newton_iters.sum()) < float(r_ref.newton_iters.sum())


def test_unrolled_newton_matches_converged():
    """tran_unrolled_iters=3 (fixed iterations, no convergence branch)
    reaches the same per-step fixed point as the while_loop configuration
    on a smooth circuit (the bench.py fast configuration)."""
    import jax.numpy as jnp
    from circuitsimulator_tpu.utils.options import DEFAULT_OPTIONS
    net = """\
V1 vdd 0 5
VIN in 0 SIN 2.5 0.5 2e6
M1 out in vss n 20u 1u 1
Rl vdd out 10k
Rs vss 0 1k
C1 out 0 0.5p
.MODEL 1 VT 0.7 MU 5e-2 COX 2e-3 LAMBDA 0.02 CJ0 1e-14
.TRAN 1e-9 2e-7
"""
    o = DEFAULT_OPTIONS.replace(dtype=jnp.float64, tran_alpha=1.0,
                                tran_predictor=True)
    r_loop = Simulator.from_text(net, opts=o).transient()
    r_unrl = Simulator.from_text(
        net, opts=o.replace(tran_unrolled_iters=3)).transient()
    assert not bool(r_unrl.failed)
    np.testing.assert_allclose(np.asarray(r_unrl.xs), np.asarray(r_loop.xs),
                               rtol=0, atol=1e-9)
