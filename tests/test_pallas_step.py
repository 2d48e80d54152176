"""Correctness of the experimental fused Pallas transient-step kernel
(interpret mode; perf status documented in ops/pallas_step.py)."""

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


def test_fused_step_matches_xla():
    opts = DEFAULT_OPTIONS.replace(dtype=jnp.float32, tran_solver="woodbury",
                                   tran_tol=1e-5, dc_tol=1e-5)
    sim = Simulator.from_file("tests/netlists/dbmixer.sp", opts=opts)
    engine = sim.engine
    B, steps, dt = 128, 10, 1e-13
    bp = perturb_params(sim.params, jax.random.key(0), B,
                        {"res_r": 0.01, "mos_vth": 0.02})
    x0 = jnp.zeros((B, engine.N), jnp.float32)
    state0 = jax.vmap(engine.init_state)(x0)

    def lane(p, carry, ts):
        st = transient_step_fn(engine, p, jnp.asarray(dt, jnp.float32))

        def body(c, t):
            c, (_, it) = st(c, t)
            return c, it

        return lax.scan(body, carry, ts)

    ts = jnp.arange(1, steps + 1, dtype=jnp.float32) * dt
    carry0 = (x0, state0, jnp.zeros((B,), bool))
    (cx, cstate, _), _ = jax.vmap(lane, in_axes=(0, 0, None))(bp, carry0, ts)

    runner = pallas_step.PallasStepRunner(engine, bp, dt)
    xo, vco, ilo, iters = runner.run_chunk(x0, state0["vc"], state0["il"],
                                           0, steps, interpret=True)
    assert int(np.asarray(iters).sum()) > 0
    np.testing.assert_allclose(np.asarray(xo), np.asarray(cx), atol=5e-6)
    np.testing.assert_allclose(np.asarray(vco), np.asarray(cstate["vc"]),
                               atol=5e-6)
    np.testing.assert_allclose(np.asarray(ilo), np.asarray(cstate["il"]),
                               atol=5e-6)
