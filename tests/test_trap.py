"""Trapezoidal integration method (extension; the reference implements only
Backward Euler)."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from circuitsimulator_tpu.api import Simulator
from circuitsimulator_tpu.utils.options import DEFAULT_OPTIONS

GMIN = 1e-6


def opts(method, solver="woodbury"):
    return DEFAULT_OPTIONS.replace(dtype=jnp.float64, tran_method=method,
                                   tran_solver=solver)


RC_TEXT = ("V1 1 0 PULSE(0 1 0 0 0 1 0)\nR1 1 2 1k\nC1 2 0 1n\n"
           ".TRAN 2e-8 1e-6\n")


def test_trap_recurrence_exact():
    # trapezoidal companion on the RC low-pass: solve the 3x3 system with
    # numpy, including gmin and the damped-update early stop
    R, C, dt = 1e3, 1e-9, 2e-8
    sim = Simulator.from_text(RC_TEXT, opts=opts("trap", solver="lu"))
    res = sim.transient()
    v2 = np.asarray(res.xs)[:, 1]
    g, gc2 = 1.0 / R, 2 * C / dt
    G = np.array([[g + GMIN, -g, 1.0],
                  [-g, g + gc2 + GMIN, 0.0],
                  [1.0, 0.0, 0.0]])
    x = np.zeros(3)
    v_prev, i_prev = 0.0, 0.0
    for k in range(1, len(v2)):
        rhs = np.array([0.0, gc2 * v_prev + i_prev, 1.0])
        x_raw = np.linalg.solve(G, rhs)
        for _ in range(50):
            x_new = x + 0.45 * (x_raw - x)
            err = np.linalg.norm(x_new - x)
            x = x_new
            if err < 1e-6:
                break
        i_prev = gc2 * (x[1] - v_prev) - i_prev
        v_prev = x[1]
        assert v2[k] == pytest.approx(v_prev, abs=1e-12), k


def test_trap_more_accurate_than_be():
    # 2nd-order trap vs 1st-order BE on a *smooth* drive (a step input's
    # discontinuity would excite trap's slowly-decaying startup artifact):
    # RC low-pass driven by sin from rest, closed-form solution
    R, C, f = 1e3, 1e-9, 1e6
    w = 2 * np.pi * f
    text = f"V1 1 0 SIN 0 1 {f}\nR1 1 2 {R}\nC1 2 0 {C}\n.TRAN 2e-8 2e-6\n"
    wrc = w * R * C
    A = 1.0 / np.sqrt(1 + wrc ** 2)
    phi = -np.arctan(wrc)
    B = -A * np.sin(phi)
    errs = {}
    for method in ("be", "trap"):
        # tighten the Newton stop so the damped-update lag doesn't mask the
        # integration-order difference; drop gmin for the analytic compare
        o = opts(method).replace(tran_tol=1e-12, tran_gmin=0.0)
        res = Simulator.from_text(text, opts=o).transient()
        ts = np.asarray(res.times)
        v2 = np.asarray(res.xs)[:, 1]
        exact = A * np.sin(w * ts + phi) + B * np.exp(-ts / (R * C))
        errs[method] = np.abs(v2 - exact).max()
    assert errs["trap"] < 0.2 * errs["be"], errs


def test_trap_woodbury_equals_lu():
    text = (".MODEL 2 VT 0.4 MU 1e-2 COX 1e-3 LAMBDA 0.05 CJ0 1e-13\n"
            "VDD 1 0 3\nVin 2 0 SIN 1 0.5 1e8\nRD 1 3 1k\n"
            "M1 3 2 0 n 10e-6 1e-6 2\nC1 3 0 2e-13\nL1 3 4 1e-9\n"
            "C2 4 0 1e-13\n.TRAN 1e-11 2e-8\n")
    r_lu = Simulator.from_text(text, opts=opts("trap", "lu")).transient()
    r_wb = Simulator.from_text(text, opts=opts("trap", "woodbury")).transient()
    assert not bool(r_lu.failed)
    np.testing.assert_allclose(np.asarray(r_wb.xs), np.asarray(r_lu.xs),
                               rtol=0, atol=1e-10)


def test_trap_inductor_lc_ringing():
    # high-Q LC tank kicked by a half-period voltage pulse through 10k:
    # trap preserves the ringing amplitude, BE damps it numerically
    L, C = 1e-6, 1e-9
    f0 = 1 / (2 * np.pi * np.sqrt(L * C))
    half = 0.5 / f0
    text = (f"V1 2 0 PULSE(0 1 0 0 0 {half} 0)\nR1 2 1 10k\n"
            f"L1 1 0 {L}\nC1 1 0 {C}\n.TRAN {1/(40*f0)} {20/f0}\n")
    ratio = {}
    for method in ("be", "trap"):
        sim = Simulator.from_text(text, opts=opts(method))
        res = sim.transient()
        v = np.asarray(res.xs)[:, 1]   # node "1" (the tank); node "2" is eq 0
        # compare the last-quarter envelope to the second-quarter envelope
        q = len(v) // 4
        ratio[method] = np.abs(v[-q:]).max() / max(np.abs(v[q:2 * q]).max(),
                                                   1e-12)
    assert ratio["trap"] > 0.8          # trap keeps the oscillation
    assert ratio["be"] < 0.5 * ratio["trap"]  # BE visibly damps it
