#!/usr/bin/env python
"""Headline benchmark: batched dbmixer.sp Backward-Euler transient throughput
on one TPU chip (BASELINE.md north star: >=8192 vmapped instances at >100x
the reference's measured 9,500 timesteps/s single-core rate, i.e. >=950k
aggregate timesteps/s/chip).

Prints exactly ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
Diagnostics go to stderr.  Tunables via env: BENCH_BATCH, BENCH_STEPS,
BENCH_DTYPE (f32|f64), BENCH_PLATFORM (leave unset to use the TPU).
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

REF_TIMESTEPS_PER_SEC = 9500.0  # measured reference rate (BASELINE.md)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    platform = os.environ.get("BENCH_PLATFORM")
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
    # persistent compile cache: DC-init/transient programs are large and the
    # remote TPU compile is slow; cache across bench runs
    cache_dir = os.environ.get("BENCH_CACHE", "/tmp/jax_bench_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — older jax without the knobs
        pass
    import jax.numpy as jnp
    from jax import lax

    dtype = jnp.float64 if os.environ.get("BENCH_DTYPE") == "f64" else jnp.float32
    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)

    B = int(os.environ.get("BENCH_BATCH", 8192))
    steps_chunk = int(os.environ.get("BENCH_STEPS", 1000))

    from circuitsimulator_tpu import Simulator, DEFAULT_OPTIONS
    from circuitsimulator_tpu.analysis.transient import transient_step_fn
    from circuitsimulator_tpu.parallel.montecarlo import (
        perturb_params, batched_dc_fast)

    f32 = dtype == jnp.float32
    opts = DEFAULT_OPTIONS.replace(
        dtype=dtype,
        tran_solver="woodbury",
        # f32 cannot resolve the reference's f64 damped-step tolerances;
        # scale them to what f32 arithmetic can actually detect.  f64 runs
        # use the reference tolerances exactly.
        tran_tol=(1e-5 if f32 else 1e-6),
        dc_tol=(1e-5 if f32 else 1e-9),
        # fast Newton: full steps from the extrapolation predictor, with a
        # low iteration cap.  A handful of Monte-Carlo lanes chatter in a
        # tol-scale Newton limit cycle in f32; since a vmapped while_loop
        # costs the max over lanes, capping them is nearly 2x aggregate
        # throughput — and validate_accuracy.py measures this configuration
        # at ~0.4 mV max error vs the f64 oracle, 10x BETTER than the damped
        # reference trajectory's truncation at the same f32 tolerance.  Set
        # BENCH_PARITY=1 for the reference damped-trajectory configuration.
        tran_alpha=(0.45 if os.environ.get("BENCH_PARITY") else 1.0),
        tran_predictor=not os.environ.get("BENCH_PARITY"),
        tran_max_newton_iters=(50 if os.environ.get("BENCH_PARITY")
                               else int(os.environ.get("BENCH_CAP", 6))),
        # fixed unrolled Newton: 2 full iterations from the extrapolated
        # predictor fully converge (identical 0.4 mV oracle error as the
        # capped while_loop) and the branch-free step lets XLA fuse the
        # whole timestep: ~1.3x on top of the capped configuration.
        tran_unrolled_iters=(0 if os.environ.get("BENCH_PARITY")
                             else int(os.environ.get("BENCH_UNROLL", 2))),
    )
    sim = Simulator.from_file(os.path.join(REPO, "tests/netlists/dbmixer.sp"),
                              opts=opts)
    engine = sim.engine
    dev = jax.devices()[0]
    log(f"device: {dev}, dtype: {dtype.__name__}, B={B}, "
        f"chunk={steps_chunk} steps")

    # Monte-Carlo parameter spread (realistic sweep, not identical lanes)
    bparams = perturb_params(sim.params, jax.random.key(42), B,
                             {"res_r": 0.01, "mos_vth": 0.02, "cap_c": 0.02})

    dt_f = sim.config.tran.tstep
    dt = jnp.asarray(dt_f, dtype)

    predictor = opts.tran_predictor

    def batch_init(bp):
        # natively batched DC (Pallas LU per iteration on TPU)
        x0 = batched_dc_fast(engine, bp)
        state = engine.init_state(x0)     # batch-aware (einsum)
        failed = jnp.zeros((B,), bool)
        return (x0, x0, state, failed) if predictor else (x0, state, failed)

    def lane_chunk(p, carry, ts):
        step = transient_step_fn(engine, p, dt, predictor=predictor)

        def body(c, t):
            c, (_, iters) = step(c, t)
            return c, iters

        return lax.scan(body, carry, ts)

    init = jax.jit(batch_init)
    run_chunk = jax.jit(jax.vmap(lane_chunk, in_axes=(0, 0, None)))

    t0 = time.time()
    carry = init(bparams)
    jax.block_until_ready(carry)
    log(f"DC init (B={B}): {time.time()-t0:.2f}s")

    ts = jnp.arange(1, steps_chunk + 1, dtype=dtype) * dt
    t0 = time.time()
    carry, iters = run_chunk(bparams, carry, ts)
    jax.block_until_ready(carry)
    log(f"chunk 1 (compile+run): {time.time()-t0:.2f}s")

    # timed steady-state chunks
    n_timed = 2
    total_steps = 0
    t0 = time.time()
    base = steps_chunk
    for i in range(n_timed):
        ts = (jnp.arange(base + 1, base + steps_chunk + 1, dtype=dtype) * dt)
        carry, iters = run_chunk(bparams, carry, ts)
        base += steps_chunk
        total_steps += steps_chunk
    jax.block_until_ready(carry)
    wall = time.time() - t0

    failed = int(jax.device_get(jnp.sum(carry[-1])))
    mean_iters = float(jax.device_get(jnp.mean(iters.astype(jnp.float32))))
    agg = B * total_steps / wall
    log(f"timed: {total_steps} steps x {B} lanes in {wall:.2f}s; "
        f"mean NR iters/step {mean_iters:.2f}; failed lanes {failed}")

    print(json.dumps({
        "metric": "dbmixer_tran_aggregate_timesteps_per_sec",
        "value": round(agg, 1),
        "unit": f"steps/s/chip (B={B}, {dtype.__name__}, woodbury NR)",
        "vs_baseline": round(agg / REF_TIMESTEPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
