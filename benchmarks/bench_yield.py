#!/usr/bin/env python
"""Deployment-shape benchmark: Monte-Carlo yield sweep of the dbmixer
transient with STREAMING .MEASURE scoring — 8192 perturbed lanes, no
waveform storage, per-lane measurements + pass/fail computed in flight.

Prints one JSON line.  Env: YB_BATCH, YB_STEPS, YB_PLATFORM.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    if os.environ.get("YB_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["YB_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    import jax.numpy as jnp
    import numpy as np
    from circuitsimulator_tpu import Simulator, DEFAULT_OPTIONS
    from circuitsimulator_tpu.parallel.montecarlo import (
        perturb_params, batched_transient_measures)

    B = int(os.environ.get("YB_BATCH", 8192))
    steps = int(os.environ.get("YB_STEPS", 2000))
    tstep = 1e-13
    opts = DEFAULT_OPTIONS.replace(
        dtype=jnp.float32, tran_solver="woodbury", tran_tol=1e-5,
        tran_alpha=1.0, tran_predictor=True, tran_unrolled_iters=2)
    text = open(os.path.join(REPO, "tests", "netlists", "dbmixer.sp")).read()
    text = text.replace(".TRAN 1e-13 5e-9",
                        f".TRAN {tstep} {steps * tstep}")
    text += ("\n.MEASURE TRAN vrms RMS V(104)\n"
             ".MEASURE TRAN vpp PP V(104)\n"
             ".MEASURE TRAN vmax MAX V(104)\n")
    sim = Simulator.from_text(text, opts=opts)
    assert sim.config.tran.enabled and len(sim.config.measures) == 3
    bp = perturb_params(sim.params, jax.random.key(0), B,
                        {"res_r": 0.02, "mos_vth": 0.02})
    t0 = time.time()
    res, vals = batched_transient_measures(
        sim.engine, bp, tstep, steps * tstep, sim.config.measures, sim.topo)
    jax.block_until_ready(vals)
    compile_s = time.time() - t0
    t0 = time.time()
    res, vals = batched_transient_measures(
        sim.engine, bp, tstep, steps * tstep, sim.config.measures, sim.topo)
    jax.block_until_ready(vals)
    wall = time.time() - t0
    rate = B * steps / wall
    print(f"compile+run: {compile_s:.2f}s; steady: {wall:.2f}s; "
          f"vrms spread {float(np.std(np.asarray(vals['vrms']))):.4g}",
          file=sys.stderr)
    print(json.dumps({
        "metric": "dbmixer_mc_measured_sweep_timesteps_per_sec",
        "value": round(rate, 1),
        "unit": f"steps/s/chip (B={B}, streaming measures, no waveforms)",
        "vs_baseline": round(rate / 9500.0, 2),
    }))


if __name__ == "__main__":
    main()
