#!/usr/bin/env python
"""Batched AC Monte-Carlo throughput on one TPU chip (HARDWARE_CHECKLIST
item 6): the whole (lanes × frequencies) small-signal sweep as ONE jitted
program (analysis/ac.py make_ac_batched_fn — vmap over lanes around the
vmapped frequency axis, complex-free device code).

Workload: the dbmixer linearized at its DC operating point, B=4096 lanes
× 64 log-spaced frequencies (1 MHz–10 GHz) — 262,144 complex 31×31 MNA
solves per call.  Metric: AC solves/s (lanes × freqs / warm wall).

Prints one JSON line.  Env: BENCH_AC_B (default 4096), BENCH_AC_F (64),
BENCH_PLATFORM.  Reference parses `.ac` but never executes it
(parser.cpp:526) — no baseline exists.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    platform = os.environ.get("BENCH_PLATFORM")
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
    cache_dir = os.environ.get("BENCH_CACHE", "/tmp/jax_bench_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass
    from circuitsimulator_tpu import Simulator
    from circuitsimulator_tpu.analysis.ac import make_ac_batched_fn
    from circuitsimulator_tpu.parallel.montecarlo import (
        perturb_params, batched_dc_fast)

    B = int(os.environ.get("BENCH_AC_B", 4096))
    F = int(os.environ.get("BENCH_AC_F", 64))
    log(f"device: {jax.devices()[0]}, B={B}, F={F}")

    sim = Simulator.from_file(os.path.join(REPO, "tests/netlists/dbmixer.sp"))
    bp = perturb_params(sim.params, jax.random.key(11), B,
                        {"res_r": 0.01, "mos_vth": 0.02, "cap_c": 0.02})
    # dbmixer carries no AC spec — drive source 0 so the sweep solves a
    # non-trivial RHS (the elimination cost is RHS-independent, but the
    # result should be a real transfer function, not zeros)
    bp = dict(bp)
    bp["vs_ac_mag"] = bp["vs_ac_mag"].at[:, 0].set(1.0)
    t0 = time.time()
    x_ops = batched_dc_fast(sim.engine, bp)
    jax.block_until_ready(x_ops)
    dc_s = time.time() - t0
    log(f"DC init (B={B}): {dc_s:.2f}s")

    freqs = np.logspace(6, 10, F)
    fn = make_ac_batched_fn(sim.engine, freqs)
    t0 = time.time()
    out = fn(bp, x_ops)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    log(f"compile+run: {compile_s:.2f}s")

    n_rep = 5
    t0 = time.time()
    for _ in range(n_rep):
        out = fn(bp, x_ops)
    jax.block_until_ready(out)
    warm_s = (time.time() - t0) / n_rep
    solves = B * F
    rate = solves / warm_s
    log(f"warm: {warm_s * 1e3:.1f}ms for {solves:,} complex "
        f"{sim.engine.N}x{sim.engine.N} solves -> {rate:,.0f} AC solves/s")

    print(json.dumps({
        "metric": "batched_ac_mc_solves_per_sec",
        "value": round(rate, 1),
        "unit": f"complex {sim.engine.N}x{sim.engine.N} MNA solves/s/chip "
                f"(B={B}, F={F})",
        "fused": os.environ.get("CSIM_AC_FUSED", "1") != "0",
        "dc_init_s": round(dc_s, 2),
        "compile_s": round(compile_s, 2),
        "warm_s": round(warm_s, 4),
        "lane_sweeps_per_sec": round(B / warm_s, 1)}))


if __name__ == "__main__":
    main()
