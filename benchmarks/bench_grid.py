#!/usr/bin/env python
"""Large NON-ladder circuit benchmark: a 100x100 RC resistor-grid mesh
(10k nodes, half-bandwidth ~100 after RCM) + diode chain, measuring
transient timesteps/s with the bordered block-tridiagonal cyclic-reduction
backend (ops/blockband.py + ops/blockcr.py).

The reference's dense LU (solver.hpp:30-80) is O(N^3) per Newton iteration
— ~6.6e11 FLOP per solve at N=10^4, minutes per timestep single-core.  The
block-CR path is O(nb*k^3) ~ 1e8 FLOP in O(log nb) sequential stages.

Usage: python benchmarks/bench_grid.py [ROWS=100] [COLS=100] [STEPS=500]
Env: GRID_PLATFORM=cpu to force CPU; GRID_RAIL=1 adds a global rail hub.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    if os.environ.get("GRID_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["GRID_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    import jax.numpy as jnp
    from circuitsimulator_tpu import Simulator, DEFAULT_OPTIONS
    from circuitsimulator_tpu.synthetic import rc_grid_netlist

    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    cols = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    tstep = 1e-11
    # no reference-parity constraint here (the reference binary cannot run
    # this size); same fast-Newton reasoning as bench_ladder.py
    opts = DEFAULT_OPTIONS.replace(dtype=jnp.float32, dc_tol=1e-5,
                                   tran_tol=1e-4, tran_alpha=1.0,
                                   tran_predictor=True,
                                   tran_unrolled_iters=1)
    sim = Simulator.from_text(
        rc_grid_netlist(rows, cols, rail=bool(os.environ.get("GRID_RAIL")),
                        diode_every=int(os.environ.get("GRID_DIODE_EVERY",
                                                       10)),
                        mos_every=int(os.environ.get("GRID_MOS_EVERY", 0)),
                        moscap_charge=bool(os.environ.get("GRID_MOSCAP")),
                        tstep=tstep, tstop=steps * tstep), opts=opts)
    assert sim.opts.tran_solver in ("blockband", "blockwb"), \
        "block-banded backend not selected"
    solver = os.environ.get("GRID_SOLVER")
    if solver:  # e.g. blockwb: pre-factored block-CR + Woodbury rank-1 rows
        sim.opts = sim.opts.replace(tran_solver=solver)
        from circuitsimulator_tpu.ops.assemble import Engine
        sim.engine = Engine(sim.lowered, sim.opts)
    from circuitsimulator_tpu.ops.blockband import get_layout
    lay = get_layout(sim.engine)
    print(f"nodes={rows * cols} unknowns={sim.topo.n_unknowns} "
          f"backend=blockband h={lay.h} k={lay.k} nb={lay.nb} mb={lay.mb} "
          f"steps={steps}", file=sys.stderr)

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
        "metric": "rc_grid_10k_timesteps_per_sec",
        "value": round(steps / wall, 1),
        "unit": f"steps/s ({rows}x{cols} grid, blockband CR, float32)",
    }))


if __name__ == "__main__":
    main()
