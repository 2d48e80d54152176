#!/usr/bin/env python
"""Switch-deck benchmark: Monte-Carlo chopper transient throughput.

Switch (S/W) decks historically fell off the fast path entirely — their
Jacobian row couples the switched node pair to a DIFFERENT control pair
(width 4), outside the width-3 Woodbury plan, forcing a per-iteration
dense LU.  The W=4 plan (ops/woodbury.py) carries them now, and the
fused Pallas chunk kernel evaluates the log-smoothstep conductance
in-kernel (ops/pallas_step.py), so a chopper/switched-cap sweep runs the
same VMEM-resident path as the dbmixer headline.

Deck: PULSE-driven series switch chopping a SIN source into an RC load
with a MOS shunt and a catch diode — all three rank-1 classes plus the
width-4 switch row in one Woodbury plan (k = 3, W = 4, N = 6).

The reference has no switch device at all (SURVEY.md §2 device table);
its comparable order of magnitude is the 9.5k steps/s single-core
dbmixer baseline.

Usage: python benchmarks/bench_chopper.py [B=8192] [CHUNK=2000]
Env: CHOPPER_PLATFORM=cpu to force CPU (interpret-mode kernel).
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHOPPER_DECK = """* series-switch chopper into RC load
.MODEL swm SW RON=10 ROFF=1e8 VT=0.5 VH=0.1
.MODEL mn VT 0.6 MU 2e-2 COX 1e-3
VCTL c 0 PULSE 0 1 0 1u 1u 8u 20u
VIN in 0 SIN 0 2 5e4
S1 in mid c 0 swm
RL mid 0 1k
C1 mid 0 100n
M1 mid g 0 b mn W=5u L=1u
VG g 0 0.8
D1 mid 0
.tran 1u 100m
.end
"""


def main():
    import jax
    if os.environ.get("CHOPPER_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["CHOPPER_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from circuitsimulator_tpu import Simulator, DEFAULT_OPTIONS
    from circuitsimulator_tpu.analysis.transient import transient_step_fn
    from circuitsimulator_tpu.analysis.dc import dc_operating_point
    from circuitsimulator_tpu.parallel.montecarlo import perturb_params
    from circuitsimulator_tpu.ops import pallas_step

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    interpret = jax.default_backend() == "cpu"

    opts = DEFAULT_OPTIONS.replace(dtype=jnp.float32, tran_solver="woodbury",
                                   tran_tol=1e-5, dc_tol=1e-5,
                                   tran_alpha=1.0, tran_predictor=True,
                                   tran_unrolled_iters=2)
    sim = Simulator.from_text(CHOPPER_DECK, opts=opts)
    engine = sim.engine
    assert pallas_step.supported(engine)
    dt = 1e-7
    bparams = perturb_params(sim.params, jax.random.key(11), B,
                             {"res_r": 0.02, "cap_c": 0.05,
                              "sw_ron": 0.05, "mos_vth": 0.02})
    x0 = jax.jit(jax.vmap(lambda p: dc_operating_point(engine, p)))(
        bparams).astype(jnp.float32)
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
        "metric": "switch_chopper_aggregate_timesteps_per_sec",
        "value": fused_sps,
        "unit": "lane-steps/s",
        "xla_steps_per_sec": xla_sps,
        "fused_vs_xla_final_err": err,
        "batch": B,
        "chunk": chunk,
    }))


if __name__ == "__main__":
    main()
