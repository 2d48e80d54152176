#!/usr/bin/env python
"""Batched harmonic-balance throughput on one TPU chip (HARDWARE_CHECKLIST
item 8): lanes/s for Monte-Carlo HB — the whole B-lane Newton (warm-up
transient scans + dense (K·N)² solves) as ONE jitted program
(analysis/hb.py make_hb_batched_fn / harmonic_balance_batched).

Two workloads:
  - rectifier: the tests/test_hb_batched.py diode rectifier, H=7
    (K=15, N=3, KN=45) at B=1024 — small-system regime, vmap count wins.
  - dbmixer:   the reference Gilbert mixer's own `.hb 100e6` card
    (dbmixer.sp:45) truncated to H=8 (K=17, N=31, KN=527) at B=64 —
    large dense-solve regime, MXU wins (527² batched LU per Newton iter).

Prints one JSON line.  Env: BENCH_HB_B / BENCH_HB_B_MIXER, BENCH_PLATFORM.
Reference has no HB at all (empty src/sstateanalysis.cpp) — there is no
baseline to beat; the recorded number is the capability evidence.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RECT = """* diode rectifier with a toleranced series R
V1 in 0 SIN 0 1 1e6
R1 in out 1k DEV=10%
D1 out 0 1
.MODEL 1 IS 1e-12
RL out 0 1k
.hb 1e6 7
"""


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_deck(jax, sim, f0, n_harm, B, tag, n_newton=15):
    import jax.numpy as jnp
    from circuitsimulator_tpu.analysis.hb import make_hb_batched_fn
    from circuitsimulator_tpu.parallel.montecarlo import (
        perturb_params, batched_dc_fast)

    bp = perturb_params(sim.params, jax.random.key(7), B,
                        {"res_r": 0.01, "mos_vth": 0.02, "cap_c": 0.02})
    t0 = time.time()
    x0s = batched_dc_fast(sim.engine, bp)
    jax.block_until_ready(x0s)
    dc_s = time.time() - t0

    _, fn = make_hb_batched_fn(sim.engine, f0, n_harm=n_harm,
                               n_newton=n_newton)
    t0 = time.time()
    out = fn(bp, x0s)
    jax.block_until_ready(out)
    compile_s = time.time() - t0

    n_rep = 3
    t0 = time.time()
    for _ in range(n_rep):
        out = fn(bp, x0s)
    jax.block_until_ready(out)
    warm_s = (time.time() - t0) / n_rep

    finals = jax.device_get(out[1])
    conv = int((finals < 1e-6).sum())
    lanes_s = B / warm_s
    K = 2 * n_harm + 1
    log(f"[{tag}] B={B} H={n_harm} K={K} N={sim.engine.N} "
        f"KN={K * sim.engine.N}: DC {dc_s:.2f}s, compile+run "
        f"{compile_s:.2f}s, warm {warm_s * 1e3:.1f}ms -> "
        f"{lanes_s:,.0f} HB lanes/s ({conv}/{B} converged)")
    return {"B": B, "n_harm": n_harm, "N": sim.engine.N,
            "KN": K * sim.engine.N,
            "dc_init_s": round(dc_s, 3),
            "compile_s": round(compile_s, 2),
            "warm_s": round(warm_s, 4),
            "lanes_per_sec": round(lanes_s, 1),
            "converged": conv}


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

    log(f"device: {jax.devices()[0]}")
    out = {"metric": "batched_hb_lanes_per_sec", "unit": "HB lanes/s/chip"}

    B = int(os.environ.get("BENCH_HB_B", 1024))
    sim = Simulator.from_text(RECT)
    out["rectifier"] = bench_deck(jax, sim, 1e6, 7, B, "rectifier")

    # B=64 at KN=527 used to fault the device whole-batch
    # ("UNAVAILABLE: TPU device error"); the auto working-set chunking
    # (hb._hb_lane_chunk, r5) now bounds the live set, so the default
    # sweeps B=32/64/128 — the knob-free eligibility evidence
    simm = Simulator.from_file(
        os.path.join(REPO, "tests/netlists/dbmixer.sp"))
    bm_env = os.environ.get("BENCH_HB_B_MIXER", "32,64,128")
    for Bm in (int(b) for b in str(bm_env).split(",")):
        out[f"dbmixer_h8_B{Bm}"] = bench_deck(jax, simm, 100e6, 8, Bm,
                                              f"dbmixer_h8_B{Bm}")

    out["value"] = out["rectifier"]["lanes_per_sec"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
