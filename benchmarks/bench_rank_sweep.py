#!/usr/bin/env python
"""Fused-kernel rank sweep: compile time + throughput vs Woodbury rank k.

The round-4 gate widening (ops/pallas_step.py MAX_K=32 + _vmem_estimate)
is an empirical budget: the in-kernel pivoted solve unrolls k column
steps of O(k) vector ops, so Mosaic compile cost grows ~k^2 and the
per-step solve cost ~k^2/TB-lane.  This sweep measures both on synthetic
diode-chain decks of rank k in {8, 16, 24, 32} (uniform structure so
only k varies), each vs the XLA+Pallas-LU hybrid on the same trajectory.

Prints one JSON line: per-k {fused_steps_per_sec, xla_steps_per_sec,
compile_s}.  Usage: python benchmarks/bench_rank_sweep.py [B=4096]
Env: RANK_PLATFORM=cpu, RANK_KS=8,16,24,32, BENCH_TIMED (default 5).
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def deck(k: int) -> str:
    """k diode stages hanging off one driven rail: rank exactly k,
    N = k + 2 (rail + drive node + k diode nodes + V branch)."""
    lines = ["* rank sweep deck",
             "V1 in 0 SIN 1.5 1 5e6",
             "Rin in rail 50"]
    for i in range(k):
        lines += [f"R{i} rail d{i} {200 + 7 * i}",
                  f"D{i} d{i} 0",
                  f"C{i} d{i} 0 2p"]
    lines.append(".TRAN 1e-9 1e-6")
    return "\n".join(lines) + "\n"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    if os.environ.get("RANK_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["RANK_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    import jax.numpy as jnp
    from jax import lax
    from circuitsimulator_tpu import Simulator, DEFAULT_OPTIONS
    from circuitsimulator_tpu.analysis.transient import transient_step_fn
    from circuitsimulator_tpu.ops import pallas_step
    from circuitsimulator_tpu.parallel.montecarlo import (
        perturb_params, batched_dc_fast)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    ks = [int(s) for s in os.environ.get("RANK_KS", "8,16,24,32").split(",")]
    steps_chunk = int(os.environ.get("RANK_CHUNK", 1000))
    n_timed = int(os.environ.get("BENCH_TIMED", 5))
    opts = DEFAULT_OPTIONS.replace(
        dtype=jnp.float32, tran_solver="woodbury", tran_tol=1e-5,
        dc_tol=1e-5, tran_alpha=1.0, tran_predictor=True,
        tran_max_newton_iters=6, tran_unrolled_iters=2)
    interp = False
    results = {}
    for k in ks:
        sim = Simulator.from_text(deck(k), opts=opts)
        engine = sim.engine
        assert pallas_step.supported(engine), f"k={k} must be in scope"
        dt = 1e-9
        bp = perturb_params(sim.params, jax.random.key(7), B,
                            {"res_r": 0.01, "cap_c": 0.02})
        x0 = batched_dc_fast(engine, bp)
        state = engine.init_state(x0)
        jax.block_until_ready(x0)

        runner = pallas_step.PallasStepRunner(engine, bp, dt)
        if jax.default_backend() == "cpu":
            interp = True
        run = jax.jit(lambda c, s0, r=runner: r.run_chunk(
            *c, s0, steps_chunk, interpret=interp))
        carry = (x0, x0, state["vc"], state["il"], jnp.zeros((B,), bool))
        t0 = time.time()
        out = run(carry, jnp.asarray(0.0, jnp.float32))
        jax.block_until_ready(out)
        compile_s = time.time() - t0
        carry = out[:5]
        t0 = time.time()
        outs = []
        for i in range(1, n_timed + 1):
            out = run(carry, jnp.asarray(float(i * steps_chunk),
                                         jnp.float32))
            carry = out[:5]
            outs.append(out)
        jax.block_until_ready(outs[-1])
        fused = B * n_timed * steps_chunk / (time.time() - t0)

        def lane_chunk(p, c, ts, e=engine):
            st = transient_step_fn(e, p, jnp.asarray(dt, jnp.float32),
                                   predictor=True)

            def body(cc, t):
                cc, (_, it) = st(cc, t)
                return cc, it

            return lax.scan(body, c, ts)

        run_x = jax.jit(jax.vmap(lane_chunk, in_axes=(0, 0, None)))
        carry_x = (x0, x0, state, jnp.zeros((B,), bool))
        ts = jnp.arange(1, steps_chunk + 1, dtype=jnp.float32) * dt
        carry_x, _ = run_x(bp, carry_x, ts)
        jax.block_until_ready(carry_x)
        t0 = time.time()
        c = carry_x
        for i in range(1, n_timed + 1):
            tsi = (i * steps_chunk
                   + jnp.arange(1, steps_chunk + 1, dtype=jnp.float32)) * dt
            c, _ = run_x(bp, c, tsi)
        jax.block_until_ready(c)
        xla = B * n_timed * steps_chunk / (time.time() - t0)
        failed = int(jax.device_get(jnp.sum(out[4])))
        log(f"[rank k={k}] N={engine.N} compile {compile_s:.1f}s fused "
            f"{fused:,.0f} xla {xla:,.0f} steps/s ({fused/xla:.2f}x) "
            f"failed {failed}")
        results[k] = {"N": engine.N,
                      "fused_steps_per_sec": round(fused, 1),
                      "xla_steps_per_sec": round(xla, 1),
                      "fused_over_xla": round(fused / xla, 2),
                      "compile_s": round(compile_s, 2),
                      "failed_lanes": failed}
    print(json.dumps({"metric": "fused_rank_sweep", "B": B,
                      "platform": jax.default_backend(),
                      "per_k": results}))


if __name__ == "__main__":
    main()
