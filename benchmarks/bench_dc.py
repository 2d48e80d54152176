#!/usr/bin/env python
"""DC-init throughput benchmark (VERDICT r1 #7): yield/sweep workloads
re-run the batched DC operating point per configuration, so its cost is a
first-class metric, not just transient-amortized overhead.

Measures, at B lanes of perturbed dbmixer:
  ramp  — batched_dc_fast: the reference 10-step source ramp, batched,
          Pallas f32 LU per Newton iteration;
  warm  — batched_dc_warm: one nominal solve + final-scale Newton for all
          lanes (no ramp) — the Monte-Carlo fast path.
and cross-checks that both reach the same operating point.

Prints one JSON line.  Usage: python benchmarks/bench_dc.py [B=8192]
Env: DC_PLATFORM=cpu to force CPU.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DECK = os.path.join(REPO, "tests", "netlists", "dbmixer.sp")


def main():
    import jax
    if os.environ.get("DC_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["DC_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    import jax.numpy as jnp
    import numpy as np
    from circuitsimulator_tpu import Simulator, DEFAULT_OPTIONS
    from circuitsimulator_tpu.analysis.dc import dc_operating_point
    from circuitsimulator_tpu.parallel.montecarlo import (
        perturb_params, batched_dc_fast, batched_dc_warm)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    opts = DEFAULT_OPTIONS.replace(dtype=jnp.float32, dc_tol=1e-5)
    sim = Simulator.from_file(DECK, opts=opts)
    engine = sim.engine
    bp = perturb_params(sim.params, jax.random.key(42), B,
                        {"res_r": 0.01, "mos_vth": 0.02, "cap_c": 0.02})

    def timed(fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)          # compile warm-up
        t0 = time.time()
        out = fn(*a)
        jax.block_until_ready(out)
        return out, time.time() - t0

    ramp_fn = jax.jit(lambda p: batched_dc_fast(engine, p))
    x_ramp, t_ramp = timed(ramp_fn, bp)

    nom_fn = jax.jit(lambda p: dc_operating_point(engine, p))
    x_nom, t_nom = timed(nom_fn, sim.params)
    warm_fn = jax.jit(lambda p, x0: batched_dc_warm(engine, p, x0))
    x_warm, t_warm = timed(warm_fn, bp, x_nom)
    t_warm_total = t_nom + t_warm

    dmax = float(jnp.max(jnp.abs(x_ramp - x_warm)))
    print(f"B={B} device={jax.devices()[0]}", file=sys.stderr)
    print(f"ramp: {t_ramp:.3f}s ({B / t_ramp:,.0f} lanes/s)   "
          f"warm: {t_warm_total:.3f}s ({B / t_warm_total:,.0f} lanes/s; "
          f"nominal {t_nom * 1e3:.0f} ms + batch {t_warm * 1e3:.0f} ms)",
          file=sys.stderr)
    print(f"ramp-vs-warm max |dx| = {dmax:.3e} "
          f"(same fixpoint at tol {sim.opts.dc_tol})", file=sys.stderr)
    assert np.isfinite(dmax) and dmax < 50 * sim.opts.dc_tol, dmax

    print(json.dumps({
        "metric": "dbmixer_batched_dc_lanes_per_sec",
        "value": round(B / t_warm_total, 1),
        "unit": f"lanes/s (B={B}, warm-start path; ramp path "
                f"{B / t_ramp:,.0f})",
        "warm_s": round(t_warm_total, 4),
        "ramp_s": round(t_ramp, 4),
        "max_dx_vs_ramp": dmax,
    }))


if __name__ == "__main__":
    main()
