"""Fused Pallas AC sweep kernel (ops/pallas_ac.py): interpret-mode
parity against complex numpy solves and against the XLA batched path on
real decks.  CI runs on CPU (interpret=True); the hardware number lives
in benchmarks/bench_ac_mc.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from circuitsimulator_tpu import Simulator
from circuitsimulator_tpu.analysis.ac import (ac_system_real,
                                              make_ac_batched_fn)
from circuitsimulator_tpu.ops.pallas_ac import ac_sweep_pallas


def _random_systems(B, n, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    G = rng.standard_normal((B, n, n)) + n * np.eye(n)
    B1 = rng.standard_normal((B, n, n))
    br = rng.standard_normal((B, n))
    bi = rng.standard_normal((B, n))
    return (jnp.asarray(G, dtype), jnp.asarray(B1, dtype),
            jnp.asarray(br, dtype), jnp.asarray(bi, dtype))


@pytest.mark.smoke
@pytest.mark.parametrize("n", [5, 13, 31])
def test_kernel_matches_numpy_complex(n):
    B, F = 6, 4
    G, B1, br, bi = _random_systems(B, n)
    omegas = jnp.asarray(np.logspace(-1, 2, F))
    xr, xi = ac_sweep_pallas(G, B1, br, bi, omegas, interpret=True)
    A = (np.asarray(G)[:, None] + 1j * np.asarray(omegas)[None, :, None, None]
         * np.asarray(B1)[:, None])
    rhs = np.asarray(br) + 1j * np.asarray(bi)
    want = np.linalg.solve(A, rhs[:, None, :, None])[..., 0]
    got = np.asarray(xr) + 1j * np.asarray(xi)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-11)


@pytest.mark.smoke
def test_kernel_pivot_floor_fails_lane():
    # lane 1 carries an exactly singular system -> zero vector, the
    # other lanes unaffected (ops/lu.py contract)
    B, n = 3, 7
    G, B1, br, bi = _random_systems(B, n, seed=3)
    G = G.at[1].set(0.0)
    B1 = B1.at[1].set(0.0)
    omegas = jnp.asarray([0.7, 2.0])
    xr, xi = ac_sweep_pallas(G, B1, br, bi, omegas, interpret=True)
    assert np.all(np.asarray(xr)[1] == 0.0)
    assert np.all(np.asarray(xi)[1] == 0.0)
    assert np.all(np.abs(np.asarray(xr)[0]) + np.abs(np.asarray(xi)[0]) > 0)


@pytest.mark.smoke
def test_kernel_padding_lanes():
    # B not a multiple of the lane block pads with identity systems
    B, n, F = 5, 4, 3
    G, B1, br, bi = _random_systems(B, n, seed=5)
    omegas = jnp.asarray([0.3, 1.0, 4.0])
    xr, xi = ac_sweep_pallas(G, B1, br, bi, omegas, interpret=True,
                             lane_block=4)
    A = (np.asarray(G)[:, None] + 1j * np.asarray(omegas)[None, :, None, None]
         * np.asarray(B1)[:, None])
    rhs = np.asarray(br) + 1j * np.asarray(bi)
    want = np.linalg.solve(A, rhs[:, None, :, None])[..., 0]
    got = np.asarray(xr) + 1j * np.asarray(xi)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-11)


@pytest.mark.smoke
def test_fused_matches_xla_batched_on_dbmixer():
    """End-to-end: the fused path's inputs (vmapped unit-omega assembly)
    driven through the kernel must match the XLA batched AC program on
    the dbmixer deck (R/C/L/V/I/M at a nonlinear operating point)."""
    from circuitsimulator_tpu.parallel.montecarlo import (perturb_params,
                                                          batched_dc_fast)
    import os
    sim = Simulator.from_file(os.path.join(
        os.path.dirname(__file__), "netlists", "dbmixer.sp"))
    B = 4
    bp = perturb_params(sim.params, jax.random.key(1), B,
                        {"res_r": 0.01, "mos_vth": 0.02, "cap_c": 0.02})
    x_ops = batched_dc_fast(sim.engine, bp)
    freqs = jnp.asarray(np.logspace(6, 10, 5), sim.engine.dtype)
    # XLA reference path (fused gate is TPU-only, so this is the
    # default on CPU)
    fn = make_ac_batched_fn(sim.engine, freqs)
    xr_ref, xi_ref = fn(bp, x_ops)
    # kernel path, interpret mode, same inputs
    one = jnp.asarray(1.0, sim.engine.dtype)
    G, B1, br, bi = jax.vmap(
        lambda p, x: ac_system_real(sim.engine, p, x, one))(bp, x_ops)
    om = 2.0 * jnp.pi * freqs
    xr, xi = ac_sweep_pallas(G, B1, br, bi, om,
                             sim.engine.opts.lu_pivot_floor,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(xr_ref),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(xi), np.asarray(xi_ref),
                               rtol=1e-9, atol=1e-12)
