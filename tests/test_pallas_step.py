"""Correctness of the fused Pallas transient-chunk kernel (interpret
mode; perf status documented in ops/pallas_step.py)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import pytest

from circuitsimulator_tpu.api import Simulator
from circuitsimulator_tpu.utils.options import DEFAULT_OPTIONS
from circuitsimulator_tpu.analysis.transient import transient_step_fn
from circuitsimulator_tpu.parallel.montecarlo import perturb_params
from circuitsimulator_tpu.ops import pallas_step


def test_supported_predicate():
    sim = Simulator.from_file("tests/netlists/dbmixer.sp")
    assert pallas_step.supported(sim.engine)
    s2 = Simulator.from_text(
        "V1 1 0 PULSE(0 1 0 0 0 1 0)\nR1 1 0 1k\nD1 1 0\n.op\n")
    assert not pallas_step.supported(s2.engine)
    s3 = Simulator.from_text(   # behavioral source -> general path
        "V1 1 0 1\nR1 1 2 1k\nB1 2 0 V=V(1)*V(1)\n.op\n")
    assert not pallas_step.supported(s3.engine)


def _run_both(opts, B=128, steps=10, dt=1e-13):
    sim = Simulator.from_file("tests/netlists/dbmixer.sp", opts=opts)
    engine = sim.engine
    bp = perturb_params(sim.params, jax.random.key(0), B,
                        {"res_r": 0.01, "mos_vth": 0.02})
    x0 = jnp.zeros((B, engine.N), jnp.float32)
    state0 = jax.vmap(engine.init_state)(x0)
    predictor = opts.tran_predictor

    def lane(p, carry, ts):
        st = transient_step_fn(engine, p, jnp.asarray(dt, jnp.float32),
                               predictor=predictor)

        def body(c, t):
            c, (_, it) = st(c, t)
            return c, it

        return lax.scan(body, carry, ts)

    ts = jnp.arange(1, steps + 1, dtype=jnp.float32) * dt
    failed0 = jnp.zeros((B,), bool)
    carry0 = ((x0, x0, state0, failed0) if predictor
              else (x0, state0, failed0))
    carry, _ = jax.vmap(lane, in_axes=(0, 0, None))(bp, carry0, ts)
    cx, cstate, cfail = carry[0], carry[-2], carry[-1]

    runner = pallas_step.PallasStepRunner(engine, bp, dt)
    xo, xpo, vco, ilo, fo, iters = runner.run_chunk(
        x0, x0, state0["vc"], state0["il"], failed0, 0, steps,
        interpret=True)
    return (cx, cstate, cfail), (xo, vco, ilo, fo, iters)


def test_fused_step_matches_xla_parity_config():
    """Damped while-loop config (per-lane freeze semantics)."""
    opts = DEFAULT_OPTIONS.replace(dtype=jnp.float32, tran_solver="woodbury",
                                   tran_tol=1e-5, dc_tol=1e-5)
    (cx, cstate, cfail), (xo, vco, ilo, fo, iters) = _run_both(opts)
    assert int(np.asarray(iters).sum()) > 0
    np.testing.assert_allclose(np.asarray(xo), np.asarray(cx), atol=5e-6)
    np.testing.assert_allclose(np.asarray(vco), np.asarray(cstate["vc"]),
                               atol=5e-6)
    np.testing.assert_allclose(np.asarray(ilo), np.asarray(cstate["il"]),
                               atol=5e-6)
    np.testing.assert_array_equal(np.asarray(fo), np.asarray(cfail))


def test_fused_step_matches_xla_fast_config():
    """bench.py fast-Newton config: predictor + 2 unrolled iterations."""
    opts = DEFAULT_OPTIONS.replace(dtype=jnp.float32, tran_solver="woodbury",
                                   tran_tol=1e-5, dc_tol=1e-5,
                                   tran_alpha=1.0, tran_predictor=True,
                                   tran_unrolled_iters=2,
                                   tran_max_newton_iters=6)
    (cx, cstate, cfail), (xo, vco, ilo, fo, iters) = _run_both(opts)
    assert int(np.asarray(iters).sum()) == 10 * (128 // 128) * 2
    np.testing.assert_allclose(np.asarray(xo), np.asarray(cx), atol=5e-6)
    np.testing.assert_allclose(np.asarray(vco), np.asarray(cstate["vc"]),
                               atol=5e-6)
    np.testing.assert_allclose(np.asarray(ilo), np.asarray(cstate["il"]),
                               atol=5e-6)
    np.testing.assert_array_equal(np.asarray(fo), np.asarray(cfail))
