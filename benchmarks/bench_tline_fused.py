#!/usr/bin/env python
"""Fused-kernel T-line leg ON CHIP (HARDWARE_CHECKLIST item 2): the VMEM
delay ring (ops/pallas_step.py) vs the XLA scan path, B=1024 lanes of a
mismatched 50Ω→200Ω line with a diode clamp, on the real TPU (the test
suite runs this comparison only in interpret mode on CPU).

Compares x_final fused-vs-XLA (same trajectory family) and reports both
throughputs.  Prints one JSON line.  Env: BENCH_TL_B (1024),
BENCH_TL_STEPS (4000), BENCH_PLATFORM.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DECK = """* T-line reflections + diode clamp at the far end
V1 in 0 PULSE(0 1 1n 0.2n 0.2n 6n 14n)
RS in a 50
T1 a 0 b 0 Z0=50 TD=2n
RL b 0 200
D1 b 0
.TRAN 0.25n 1000n
"""


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
    import jax.numpy as jnp
    from circuitsimulator_tpu import Simulator, DEFAULT_OPTIONS
    from circuitsimulator_tpu.ops import pallas_step
    from circuitsimulator_tpu.parallel.montecarlo import (
        perturb_params, batched_transient)

    B = int(os.environ.get("BENCH_TL_B", 1024))
    n_steps = int(os.environ.get("BENCH_TL_STEPS", 4000))
    dt = 0.25e-9
    tstop = n_steps * dt

    opts = DEFAULT_OPTIONS.replace(
        dtype=jnp.float32, tran_solver="woodbury", tran_tol=1e-5,
        dc_tol=1e-5, tran_alpha=1.0, tran_predictor=True,
        tran_max_newton_iters=6, tran_unrolled_iters=2)
    sim = Simulator.from_text(DECK, opts=opts)
    assert pallas_step.supported(sim.engine, dt)
    bp = perturb_params(sim.params, jax.random.key(5), B, {"res_r": 0.02})
    log(f"device: {jax.devices()[0]}, B={B}, steps={n_steps}, "
        f"ring ticks={sim.engine.tl_ticks(dt)}")

    results = {}
    finals = {}
    for tag, fused in (("fused", True), ("xla", False)):
        t0 = time.time()
        res = batched_transient(sim.engine, bp, dt, tstop, fused=fused)
        jax.block_until_ready(res.x_final)
        cold = time.time() - t0
        t0 = time.time()
        res = batched_transient(sim.engine, bp, dt, tstop, fused=fused)
        jax.block_until_ready(res.x_final)
        warm = time.time() - t0
        agg = B * n_steps / warm
        failed = int(jax.device_get(res.failed.sum()))
        log(f"[{tag}] cold {cold:.2f}s, warm {warm:.2f}s -> "
            f"{agg:,.0f} steps/s (failed {failed})")
        results[tag] = round(agg, 1)
        finals[tag] = np.asarray(jax.device_get(res.x_final))

    diff = float(np.abs(finals["fused"] - finals["xla"]).max())
    log(f"fused-vs-XLA x_final max abs diff on chip: {diff:.3e}")
    print(json.dumps({
        "metric": "tline_fused_onchip",
        "value": results["fused"],
        "unit": f"steps/s/chip (B={B}, {n_steps} steps, VMEM delay ring)",
        "xla_steps_per_sec": results["xla"],
        "fused_vs_xla_max_abs": diff}))


if __name__ == "__main__":
    main()
