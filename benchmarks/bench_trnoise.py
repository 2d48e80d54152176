#!/usr/bin/env python
"""TRNOISE-fused overhead on one TPU chip (HARDWARE_CHECKLIST item 7):
B=8192 noisy dbmixer (TRNOISE white noise added to the LO source) stepped
by the fused Pallas chunk kernel vs the same deck noise-free.

The noisy path streams per-step source-noise values into the kernel
(Engine.trnoise_stream precomputes each chunk's draws with the XLA path's
exact threefry stream; parallel/montecarlo._fused_batched_transient).
Expected overhead: a few percent — the stream adds ~nN·B·4 bytes/step of
HBM traffic plus one batched threefry per chunk.

Prints one JSON line.  Env: BENCH_TN_B (default 8192), BENCH_TN_STEPS
(default 10000), BENCH_PLATFORM.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_case(jax, sim, B, tstep, n_steps, noise_key):
    """Warm fused-chunk timing: ONE runner + jit, DC and compile paid
    outside the timed window — the honest stream-overhead measurement
    (timing batched_transient per call buries the overhead in a fresh
    DC solve + retrace every call)."""
    import jax.numpy as jnp
    from circuitsimulator_tpu.parallel.montecarlo import (
        perturb_params, make_fused_transient_fn)
    bp = perturb_params(sim.params, jax.random.key(42), B,
                        {"res_r": 0.01, "mos_vth": 0.02, "cap_c": 0.02})
    t0 = time.time()
    carry, jit_full, meta = make_fused_transient_fn(
        sim.engine, bp, tstep, noise_key=noise_key)
    chunk = meta["chunk"]
    carry, iters = jit_full(carry, jnp.asarray(0.0, jnp.float32))
    jax.block_until_ready(carry[0][0])
    cold = time.time() - t0
    n_chunks = max(n_steps // chunk, 1)
    t0 = time.time()
    for i in range(1, n_chunks + 1):
        carry, iters = jit_full(carry,
                                jnp.asarray(float(i * chunk), jnp.float32))
    jax.block_until_ready(carry[0][0])
    warm = time.time() - t0
    failed = int(jax.device_get(carry[0][4].sum()))
    return cold, warm, n_chunks * chunk, failed


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
    from circuitsimulator_tpu import Simulator, DEFAULT_OPTIONS
    import jax.numpy as jnp

    B = int(os.environ.get("BENCH_TN_B", 8192))
    n_steps = int(os.environ.get("BENCH_TN_STEPS", 10000))
    tstep = 1e-13
    tstop = n_steps * tstep

    deck = open(os.path.join(REPO, "tests/netlists/dbmixer.sp")).read()
    # white TRNOISE on the LO+ source (1 mV RMS per sample)
    noisy = deck.replace("Vlo+ 154 0 SIN 1 0.6 900e6 0",
                         "Vlo+ 154 0 SIN 1 0.6 900e6 0 TRNOISE(1m 0)")
    assert noisy != deck
    opts = DEFAULT_OPTIONS.replace(
        dtype=jnp.float32, tran_solver="woodbury", tran_tol=1e-5,
        dc_tol=1e-5, tran_alpha=1.0, tran_predictor=True,
        tran_max_newton_iters=6, tran_unrolled_iters=2)

    log(f"device: {jax.devices()[0]}, B={B}, steps={n_steps}")
    sim0 = Simulator.from_text(deck, opts=opts)
    c0, w0, s0, f0 = run_case(jax, sim0, B, tstep, n_steps, None)
    agg0 = B * s0 / w0
    log(f"[noise-free] cold {c0:.2f}s, warm {w0:.2f}s ({s0} steps) -> "
        f"{agg0:,.0f} steps/s (failed {f0})")

    sim1 = Simulator.from_text(noisy, opts=opts)
    assert sim1.engine.has_trnoise
    c1, w1, s1, f1 = run_case(jax, sim1, B, tstep, n_steps,
                              jax.random.key(123))
    agg1 = B * s1 / w1
    # per-step rate ratio (the noisy chunk length may differ)
    over = (agg0 / agg1 - 1.0) * 100.0
    log(f"[trnoise]    cold {c1:.2f}s, warm {w1:.2f}s ({s1} steps) -> "
        f"{agg1:,.0f} steps/s (failed {f1}); overhead {over:+.1f}%")

    print(json.dumps({
        "metric": "trnoise_fused_overhead_pct",
        "value": round(over, 2),
        "unit": f"% wall overhead (B={B}, {n_steps} steps, fused Pallas)",
        "noise_free_steps_per_sec": round(agg0, 1),
        "trnoise_steps_per_sec": round(agg1, 1),
        "failed_lanes": [f0, f1]}))


if __name__ == "__main__":
    main()
