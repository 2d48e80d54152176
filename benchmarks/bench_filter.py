#!/usr/bin/env python
"""Linear-deck benchmark: Monte-Carlo RLC filter transient throughput.

Fully linear decks (no MOS/diode/BJT/JFET) are in the fused Pallas chunk
kernel's scope with k == 0 — each timestep is the exact solve
x = G0inv @ b(t) evaluated entirely in VMEM (ops/pallas_step.py), no
Newton machinery compiled.  This measures that path against the vmapped
XLA scan on a 9-unknown RLC band-pass + divider deck with SIN and PULSE
drives, B lanes of lognormal R/C perturbations.

The reference has no batched or linear-fast path at all — every deck pays
the full Newton + LU machinery per step (tanalisis.cpp:255-362), so its
9.5k steps/s dbmixer baseline is the comparable order of magnitude.

Usage: python benchmarks/bench_filter.py [B=8192] [CHUNK=2000]
Env: FILTER_PLATFORM=cpu to force CPU (interpret-mode kernel).
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FILTER_DECK = """* linear RLC band-pass + RC divider
V1 in 0 SIN 0 1 2e6
I1 0 mid PULSE(0 1m 0 0 0 100n 250n)
R1 in a 1k
L1 a mid 10u
C1 mid 0 100p
R2 mid out 2k
C2 out 0 50p
RL out 0 10k
.tran 1n 100u
.end
"""


def main():
    import jax
    if os.environ.get("FILTER_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["FILTER_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from circuitsimulator_tpu import Simulator, DEFAULT_OPTIONS
    from circuitsimulator_tpu.analysis.transient import transient_step_fn
    from circuitsimulator_tpu.parallel.montecarlo import perturb_params
    from circuitsimulator_tpu.ops import pallas_step

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    interpret = jax.default_backend() == "cpu"

    opts = DEFAULT_OPTIONS.replace(dtype=jnp.float32, tran_solver="woodbury",
                                   tran_tol=1e-5, dc_tol=1e-5,
                                   tran_alpha=1.0, tran_predictor=True,
                                   tran_unrolled_iters=1)
    sim = Simulator.from_text(FILTER_DECK, opts=opts)
    engine = sim.engine
    assert pallas_step.supported(engine)
    dt = 1e-9
    bparams = perturb_params(sim.params, jax.random.key(7), B,
                             {"res_r": 0.02, "cap_c": 0.05, "ind_l": 0.05})
    x0 = jnp.zeros((B, engine.N), jnp.float32)
    state0 = jax.vmap(engine.init_state)(x0)
    failed0 = jnp.zeros((B,), bool)

    # ---- fused Pallas path -------------------------------------------
    runner = pallas_step.PallasStepRunner(engine, bparams, dt)
    run = jax.jit(lambda c, s0: runner.run_chunk(*c, s0, chunk,
                                                 interpret=interpret))
    carry = (x0, x0, state0["vc"], state0["il"], failed0)
    t0 = time.time()
    out = run(carry, jnp.asarray(0.0, jnp.float32))
    jax.block_until_ready(out)
    print(f"[fused] chunk 1 (compile+run): {time.time()-t0:.2f}s",
          file=sys.stderr)
    carry = out[:5]
    n_timed = 3
    t0 = time.time()
    for i in range(1, n_timed + 1):
        out = run(carry, jnp.asarray(float(i * chunk), jnp.float32))
        carry = out[:5]
    jax.block_until_ready(out)
    wall = time.time() - t0
    fused_sps = B * n_timed * chunk / wall
    x_fused = np.asarray(out[0])
    print(f"[fused] {n_timed * chunk} steps x {B} lanes in {wall:.2f}s -> "
          f"{fused_sps:,.0f} steps/s", file=sys.stderr)

    # ---- XLA scan path (same trajectory) -----------------------------
    def lane_chunk(p, carry, ts):
        st = transient_step_fn(engine, p, jnp.asarray(dt, jnp.float32),
                               predictor=True)

        def body(c, t):
            c, (_, it) = st(c, t)
            return c, it

        return lax.scan(body, carry, ts)

    run_x = jax.jit(jax.vmap(lane_chunk, in_axes=(0, 0, None)))
    carry = (x0, x0, state0, failed0)
    ts = jnp.arange(1, chunk + 1, dtype=jnp.float32) * dt
    t0 = time.time()
    carry, _ = run_x(bparams, carry, ts)
    jax.block_until_ready(carry)
    print(f"[xla] chunk 1 (compile+run): {time.time()-t0:.2f}s",
          file=sys.stderr)
    t0 = time.time()
    for i in range(1, n_timed + 1):
        ts = (jnp.arange(1, chunk + 1, dtype=jnp.float32)
              + float(i * chunk)) * dt
        carry, _ = run_x(bparams, carry, ts)
    jax.block_until_ready(carry)
    wall_x = time.time() - t0
    xla_sps = B * n_timed * chunk / wall_x
    x_xla = np.asarray(carry[0])
    print(f"[xla] {n_timed * chunk} steps x {B} lanes in {wall_x:.2f}s -> "
          f"{xla_sps:,.0f} steps/s", file=sys.stderr)

    err = float(np.max(np.abs(x_fused - x_xla)))
    print(f"[check] fused vs XLA final-state max abs err: {err:.3e}",
          file=sys.stderr)
    import json
    print(json.dumps({
        "metric": "linear_rlc_filter_aggregate_timesteps_per_sec",
        "value": round(fused_sps, 1), "unit": f"steps/s (B={B}, f32, fused)",
        "xla_steps_per_sec": round(xla_sps, 1),
        "fused_vs_xla_final_err": err,
    }))


if __name__ == "__main__":
    main()
