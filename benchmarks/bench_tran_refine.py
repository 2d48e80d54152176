#!/usr/bin/env python
"""Mixed-precision transient throughput/accuracy trade-off on one TPU
chip (r5, VERDICT item 10): B-lane dbmixer transient on the XLA 'lu'
backend in three configurations —

  f32    : all-float32 (the throughput end)
  mixed  : f64 residuals/carry + f32 inner solves (tran_mixed_refine)
  f64    : all-float64 (emulated on TPU; the accuracy end)

Accuracy is each config's max-abs deviation from the f64 trajectory
over the timed window.  Prints one JSON line.  Env: REFINE_B (128),
REFINE_STEPS (500), BENCH_PLATFORM.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from circuitsimulator_tpu import Simulator, DEFAULT_OPTIONS
    from circuitsimulator_tpu.analysis.transient import transient_step_fn
    from circuitsimulator_tpu.parallel.montecarlo import (
        perturb_params, batched_dc_fast)

    B = int(os.environ.get("REFINE_B", 128))
    steps = int(os.environ.get("REFINE_STEPS", 500))
    log(f"device: {jax.devices()[0]}, B={B}, steps={steps}")
    out = {"metric": "mixed_precision_transient", "B": B, "steps": steps,
           "unit": "aggregate steps/s"}
    xs_final = {}

    for name, dtype, mixed in (("f32", jnp.float32, False),
                               ("mixed", jnp.float64, True),
                               ("f64", jnp.float64, False)):
        opts = DEFAULT_OPTIONS.replace(
            dtype=dtype, tran_solver="lu", auto_backend=False,
            tran_mixed_refine=mixed,
            tran_tol=(1e-5 if dtype == jnp.float32 else 1e-6),
            dc_tol=(1e-5 if dtype == jnp.float32 else 1e-9))
        sim = Simulator.from_file(
            os.path.join(REPO, "tests/netlists/dbmixer.sp"), opts=opts)
        engine = sim.engine
        bp = perturb_params(sim.params, jax.random.key(42), B,
                            {"res_r": 0.01, "mos_vth": 0.02,
                             "cap_c": 0.02})
        dt = jnp.asarray(sim.config.tran.tstep, dtype)

        def lane(p, carry, ts):
            step = transient_step_fn(engine, p, dt)

            def body(c, t):
                c, _ = step(c, t)
                return c, None

            return lax.scan(body, carry, ts)[0]

        init = jax.jit(lambda bp: (
            (x0 := batched_dc_fast(engine, bp)),
            engine.init_state(x0),
            jnp.zeros((B,), bool)))
        run = jax.jit(jax.vmap(lane, in_axes=(0, 0, None)))
        carry = init(bp)
        jax.block_until_ready(carry)
        ts = jnp.arange(1, steps + 1, dtype=dtype) * dt
        t0 = time.time()
        carry = run(bp, carry, ts)
        jax.block_until_ready(carry)
        compile_s = time.time() - t0
        t0 = time.time()
        carry = run(bp, carry,
                    jnp.arange(steps + 1, 2 * steps + 1, dtype=dtype) * dt)
        jax.block_until_ready(carry)
        wall = time.time() - t0
        rate = B * steps / wall
        failed = int(np.asarray(carry[-1]).sum())
        xs_final[name] = np.asarray(carry[0], np.float64)
        log(f"[{name}] compile {compile_s:.1f}s, warm {wall:.3f}s -> "
            f"{rate:,.0f} steps/s, failed {failed}")
        out[name] = {"steps_per_sec": round(rate, 1),
                     "compile_s": round(compile_s, 1),
                     "failed_lanes": failed}

    ref = xs_final["f64"]
    for name in ("f32", "mixed"):
        out[name]["max_abs_vs_f64"] = float(
            np.abs(xs_final[name] - ref).max())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
