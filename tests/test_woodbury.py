"""Woodbury rank-k Newton solve vs the per-iteration LU re-factor: the two
transient backends must produce the same trajectories."""

import numpy as np
import jax.numpy as jnp
import pytest

from circuitsimulator_tpu.api import Simulator
from circuitsimulator_tpu.utils.options import DEFAULT_OPTIONS
from circuitsimulator_tpu.ops.woodbury import lu_inverse


def opts(solver):
    return DEFAULT_OPTIONS.replace(dtype=jnp.float64, tran_solver=solver)


def test_lu_inverse():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((9, 9))
    Ainv = np.asarray(lu_inverse(jnp.asarray(A)))
    np.testing.assert_allclose(Ainv, np.linalg.inv(A), rtol=1e-9, atol=1e-10)


def test_woodbury_equals_lu_trajectory_mixer():
    path = "tests/netlists/dbmixer.sp"
    s_lu = Simulator.from_file(path, opts=opts("lu"))
    s_wb = Simulator.from_file(path, opts=opts("woodbury"))
    r_lu = s_lu.transient(tstep=1e-13, tstop=2e-10)
    r_wb = s_wb.transient(tstep=1e-13, tstop=2e-10)
    assert int(r_lu.newton_iters.sum()) == int(r_wb.newton_iters.sum())
    np.testing.assert_allclose(np.asarray(r_wb.xs), np.asarray(r_lu.xs),
                               rtol=0, atol=1e-11)


def test_woodbury_lu_parity_with_inductors_and_pulse():
    text = (".MODEL 2 VT 0.4 MU 1e-2 COX 1e-3 LAMBDA 0.05 CJ0 2e-14\n"
            "VDD 1 0 3\nVin 2 0 PULSE(0 2 1n 1n 1n 5n 10n)\n"
            "RD 1 3 500\nM1 3 2 4 n 20e-6 1e-6 2\nRS 4 0 200\n"
            "L1 3 5 1e-9\nC1 5 0 1e-13\n.TRAN 1e-11 5e-8\n")
    s_lu = Simulator.from_text(text, opts=opts("lu"))
    s_wb = Simulator.from_text(text, opts=opts("woodbury"))
    r_lu = s_lu.transient()
    r_wb = s_wb.transient()
    assert not bool(r_lu.failed) and not bool(r_wb.failed)
    np.testing.assert_allclose(np.asarray(r_wb.xs), np.asarray(r_lu.xs),
                               rtol=0, atol=1e-10)


def test_woodbury_linear_circuit_k0():
    # no nonlinear devices: Woodbury degenerates to the plain z0 solve
    text = "V1 1 0 SIN 0 1 1e6\nR1 1 2 1k\nC1 2 0 1n\n.TRAN 1e-8 2e-6\n"
    s_lu = Simulator.from_text(text, opts=opts("lu"))
    s_wb = Simulator.from_text(text, opts=opts("woodbury"))
    np.testing.assert_allclose(np.asarray(s_wb.transient().xs),
                               np.asarray(s_lu.transient().xs),
                               rtol=0, atol=1e-12)


def test_woodbury_diode_circuit():
    text = ("V1 1 0 SIN 0 2 1e6\nR1 1 2 100\nD1 2 0 IS=1e-14 N=1\n"
            "C1 2 0 1n\n.TRAN 1e-8 1e-6\n")
    s_lu = Simulator.from_text(text, opts=opts("lu"))
    s_wb = Simulator.from_text(text, opts=opts("woodbury"))
    r_lu, r_wb = s_lu.transient(), s_wb.transient()
    assert not bool(r_lu.failed)
    np.testing.assert_allclose(np.asarray(r_wb.xs), np.asarray(r_lu.xs),
                               rtol=0, atol=1e-9)
    # the diode actually rectifies: node 2 clamps near ~0.6-0.8 V on positive
    # swings and follows the source negative
    v2 = np.asarray(r_lu.xs)[:, 1]
    assert v2.max() < 1.0
    assert v2.min() < -1.5
