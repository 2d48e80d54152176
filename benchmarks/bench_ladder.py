#!/usr/bin/env python
"""Secondary benchmark: the synthetic 10k-node RC-ladder + diode-chain
stress config (BASELINE.md config #4) — measures transient timesteps/s with
the bordered-tridiagonal cyclic-reduction backend.

Usage: python benchmarks/bench_ladder.py [N_NODES=10000] [STEPS=500]
Env: LADDER_PLATFORM=cpu to force CPU.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    if os.environ.get("LADDER_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["LADDER_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    import jax.numpy as jnp
    from circuitsimulator_tpu import Simulator, DEFAULT_OPTIONS
    from circuitsimulator_tpu.synthetic import rc_ladder_netlist

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    tstep = 1e-11
    # full Newton + extrapolation predictor: the synthetic ladder config has
    # no reference-parity constraint (the reference binary cannot run it),
    # so the damped alpha=0.45 reference trajectory is not required.  The
    # converged per-step solution is the same fixed point at the same tol.
    # one fixed full-Newton corrector from the extrapolated predictor:
    # agrees with the fully-converged while_loop run to machine epsilon
    # (f64 cross-check on a 2000-node ladder) and removes the convergence
    # branch from the hot loop.
    opts = DEFAULT_OPTIONS.replace(dtype=jnp.float32, dc_tol=1e-5,
                                   tran_tol=1e-4, tran_alpha=1.0,
                                   tran_predictor=True,
                                   tran_unrolled_iters=1)
    sim = Simulator.from_text(
        rc_ladder_netlist(n, tstep=tstep, tstop=steps * tstep), opts=opts)
    assert sim.opts.tran_solver == "tridiag", "ladder backend not selected"
    print(f"nodes={n} unknowns={sim.topo.n_unknowns} "
          f"backend={sim.opts.tran_solver} steps={steps}", file=sys.stderr)

    t0 = time.time()
    res = sim.transient(save_xs=False)
    res.x_final.block_until_ready()
    print(f"first run (compile+run): {time.time()-t0:.2f}s", file=sys.stderr)
    t0 = time.time()
    res = sim.transient(save_xs=False)
    res.x_final.block_until_ready()
    wall = time.time() - t0
    iters = int(jax.device_get(res.newton_iters.sum()))
    print(f"steady: {steps} steps in {wall:.2f}s; "
          f"{iters/steps:.2f} NR iters/step; failed={bool(res.failed)}",
          file=sys.stderr)
    import json
    print(json.dumps({
        "metric": "rc_ladder_10k_timesteps_per_sec",
        "value": round(steps / wall, 1),
        "unit": f"steps/s ({n} nodes, tridiag PCR, float32)",
    }))


if __name__ == "__main__":
    main()
