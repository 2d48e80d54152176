#!/usr/bin/env python
"""f64-on-TPU quantification (SURVEY.md §7 hard-part 4 / VERDICT r1 #5).

Measures, on the real chip, the batched dbmixer DC operating point in three
precision strategies and reports throughput + the achieved gmin-free DC
residual (always evaluated in float64):

  f32         — the bench configuration (Pallas batched f32 LU);
  f32+refine  — f32 DC, then N mixed-precision refinement sweeps
                (f64 residual, f32 Pallas LU solve; analysis/dc.dc_refine);
  f64         — full float64 Newton (XLA-emulated f64 arithmetic; the TPU
                has no f64 ALU).

Writes benchmarks/precision_tpu.json and prints a table.

Usage: python benchmarks/precision_table.py [B=1024]
Env: PREC_PLATFORM=cpu to force CPU (numbers then meaningless for the
f32-vs-f64 question, but the script still validates).
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
    if os.environ.get("PREC_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["PREC_PLATFORM"])
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    import jax.numpy as jnp
    from circuitsimulator_tpu import Simulator, DEFAULT_OPTIONS
    from circuitsimulator_tpu.analysis.dc import dc_refine, dc_residual
    from circuitsimulator_tpu.parallel.montecarlo import (perturb_params,
                                                          batched_dc_fast)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    sig = {"res_r": 0.01, "mos_vth": 0.02, "cap_c": 0.02}

    sim32 = Simulator.from_file(DECK, opts=DEFAULT_OPTIONS.replace(
        dtype=jnp.float32, dc_tol=1e-5, tran_tol=1e-5))
    sim64 = Simulator.from_file(DECK, opts=DEFAULT_OPTIONS.replace(
        dtype=jnp.float64, dc_tol=1e-9, tran_tol=1e-6))

    bp32 = perturb_params(sim32.params, jax.random.key(42), B, sig)
    # identical circuits in f64: upcast the f32 draws (don't redraw — the
    # bit patterns of normal() differ per dtype)
    bp64 = {k: (v.astype(jnp.float64) if v.dtype == jnp.float32 else v)
            for k, v in bp32.items()}

    def timed(fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)          # compile warm-up
        t0 = time.time()
        out = fn(*a)
        jax.block_until_ready(out)
        return out, time.time() - t0

    res64 = jax.jit(lambda x, p: jnp.max(dc_residual(sim64.engine, p, x)))

    rows = []

    f32_dc = jax.jit(lambda p: batched_dc_fast(sim32.engine, p))
    x32, t_f32 = timed(f32_dc, bp32)
    r_f32 = float(res64(x32.astype(jnp.float64), bp64))
    rows.append(("f32", t_f32, r_f32))

    refine = jax.jit(lambda x, p: dc_refine(sim64.engine, p, x,
                                            n_iter=2, batch=B))
    x64r, t_ref = timed(refine, x32.astype(jnp.float64), bp64)
    r_ref = float(res64(x64r, bp64))
    rows.append(("f32+refine(2)", t_f32 + t_ref, r_ref))

    f64_dc = jax.jit(lambda p: batched_dc_fast(sim64.engine, p))
    x64, t_f64 = timed(f64_dc, bp64)
    r_f64 = float(res64(x64, bp64))
    rows.append(("f64", t_f64, r_f64))

    dev = str(jax.devices()[0])
    print(f"\nbatched dbmixer DC, B={B}, device={dev}")
    print(f"{'config':<15}{'wall (s)':>10}{'lanes/s':>12}"
          f"{'max f64 residual':>20}")
    out = {"B": B, "device": dev, "rows": {}}
    for name, wall, resid in rows:
        print(f"{name:<15}{wall:>10.3f}{B / wall:>12.0f}{resid:>20.3e}")
        out["rows"][name] = {"wall_s": round(wall, 4),
                             "lanes_per_s": round(B / wall, 1),
                             "max_residual": resid}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "precision_tpu.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
