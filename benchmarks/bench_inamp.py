#!/usr/bin/env python
"""Fused-path throughput on a REAL analog cell beyond the old rank gate.

tests/netlists/inamp.sp is a 22-MOS three-op-amp instrumentation
amplifier: Woodbury rank k=22, N=28 — off the round-3 fused envelope
(k <= 16), admitted by the round-4 budget gate (ops/pallas_step.py
MAX_K / _vmem_estimate).  This benchmark measures what that widening
is worth: fused Pallas chunk kernel vs the XLA+Pallas-LU hybrid loop
on the same fast-Newton trajectory, plus the chunk-kernel compile time
at k=22 (the static-unroll cost the MAX_K=32 cap bounds).

Prints one JSON line.  Usage: python benchmarks/bench_inamp.py [B=8192]
Env: INAMP_PLATFORM=cpu to force CPU; BENCH_TIMED chunks (default 10).
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DECK = os.path.join(REPO, "tests", "netlists", "inamp.sp")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    if os.environ.get("INAMP_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["INAMP_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from circuitsimulator_tpu import Simulator, DEFAULT_OPTIONS
    from circuitsimulator_tpu.analysis.dc import dc_operating_point
    from circuitsimulator_tpu.analysis.transient import transient_step_fn
    from circuitsimulator_tpu.ops import pallas_step
    from circuitsimulator_tpu.parallel.montecarlo import (
        perturb_params, batched_dc_warm)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    steps_chunk = int(os.environ.get("INAMP_CHUNK", 1000))
    n_timed = int(os.environ.get("BENCH_TIMED", 10))
    opts = DEFAULT_OPTIONS.replace(
        dtype=jnp.float32, tran_solver="woodbury", tran_tol=1e-5,
        dc_tol=1e-5, tran_alpha=1.0, tran_predictor=True,
        tran_max_newton_iters=6, tran_unrolled_iters=2)
    sim = Simulator.from_file(DECK, opts=opts)
    engine = sim.engine
    assert pallas_step.supported(engine)
    dt = float(sim.config.tran.tstep)

    bp = perturb_params(sim.params, jax.random.key(42), B,
                        {"res_r": 0.01, "mos_vth": 0.02, "cap_c": 0.02})

    # nominal op point with the deck's .NODESET aids, then warm-started
    # batched DC (the Monte-Carlo pattern: lanes sit a few % off nominal)
    t0 = time.time()
    x_nom = dc_operating_point(engine, sim.params, nodeset=sim._nodeset())
    x0 = batched_dc_warm(engine, bp, x_nom)
    jax.block_until_ready(x0)
    dc_s = time.time() - t0
    log(f"[inamp] DC init (warm, B={B}): {dc_s:.2f}s")

    state = engine.init_state(x0)
    runner = pallas_step.PallasStepRunner(engine, bp, dt)
    log(f"[inamp] k={runner.k} N={runner.N} W={runner.W} TB={runner.TB}")
    interp = jax.default_backend() == "cpu"
    run = jax.jit(lambda c, s0: runner.run_chunk(*c, s0, steps_chunk,
                                                 interpret=interp))
    carry = (x0, x0, state["vc"], state["il"], jnp.zeros((B,), bool))

    t0 = time.time()
    out = run(carry, jnp.asarray(0.0, jnp.float32))
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    carry = out[:5]
    log(f"[inamp] fused chunk 1 (compile+run): {compile_s:.2f}s")

    def timed_chunks(run, carry):
        outs = []
        t0 = time.time()
        c = carry
        for i in range(1, n_timed + 1):
            out = run(c, jnp.asarray(float(i * steps_chunk), jnp.float32))
            c = out[:5]
            outs.append(out)
        walls, prev = [], t0
        for o in outs:
            jax.block_until_ready(o)
            now = time.time()
            walls.append(now - prev)
            prev = now
        return sum(walls), walls, outs[-1]

    wall, walls, last = timed_chunks(run, carry)
    fused_rate = B * n_timed * steps_chunk / wall
    failed = int(jax.device_get(jnp.sum(last[4])))
    log(f"[inamp] fused: {n_timed * steps_chunk} steps x {B} lanes in "
        f"{wall:.2f}s -> {fused_rate:,.0f} steps/s; failed {failed}")

    # XLA hybrid loop, same trajectory config
    def lane_chunk(p, carry, ts):
        st = transient_step_fn(engine, p, jnp.asarray(dt, jnp.float32),
                               predictor=True)

        def body(c, t):
            c, (_, it) = st(c, t)
            return c, it

        return lax.scan(body, carry, ts)

    run_x = jax.jit(jax.vmap(lane_chunk, in_axes=(0, 0, None)))
    carry_x = (x0, x0, state, jnp.zeros((B,), bool))
    ts = jnp.arange(1, steps_chunk + 1, dtype=jnp.float32) * dt
    t0 = time.time()
    carry_x, _ = run_x(bp, carry_x, ts)
    jax.block_until_ready(carry_x)
    xla_compile_s = time.time() - t0
    log(f"[inamp] XLA chunk 1 (compile+run): {xla_compile_s:.2f}s")
    t0 = time.time()
    outs = []
    c = carry_x
    for i in range(1, n_timed + 1):
        ts_i = (i * steps_chunk + jnp.arange(1, steps_chunk + 1,
                                             dtype=jnp.float32)) * dt
        c, _ = run_x(bp, c, ts_i)
        outs.append(c)
    jax.block_until_ready(outs[-1])
    xla_wall = time.time() - t0
    xla_rate = B * n_timed * steps_chunk / xla_wall
    log(f"[inamp] XLA: {n_timed * steps_chunk} steps x {B} lanes in "
        f"{xla_wall:.2f}s -> {xla_rate:,.0f} steps/s")

    print(json.dumps({
        "metric": "inamp_fused_steps_per_sec",
        "deck": "inamp.sp (22-MOS in-amp, k=22, N=28)",
        "B": B, "value": round(fused_rate, 1),
        "xla_steps_per_sec": round(xla_rate, 1),
        "fused_over_xla": round(fused_rate / xla_rate, 2),
        "fused_compile_s": round(compile_s, 2),
        "platform": jax.default_backend(),
        "failed_lanes": failed,
    }))


if __name__ == "__main__":
    main()
