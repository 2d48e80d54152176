#!/usr/bin/env python
"""Accuracy validation for the f32 benchmark configuration.

Runs the FULL dbmixer transient (50,000 steps by default — the complete
.TRAN 1e-13 5e-9 card) twice —
  (a) float64, exact reference tolerances, CPU (the parity-tested oracle);
  (b) float32, bench tolerances, on the default platform —
and reports per-column maximum / RMS waveform error for
  - f32 vs the f64 oracle, and
  - f32 vs the reference binary's own golden CSV
    (tests/goldens/dbmixer_tran.csv, from tanalisis.cpp:182-231).

This quantifies what the throughput benchmark's relaxed Newton stop costs in
accuracy, against the reference itself, over the whole judged run.  bench.py
independently measures the same golden diff on-device and embeds it in its
JSON line; this script is the detailed breakdown.

Usage: python benchmarks/validate_accuracy.py [VSTEPS=50000]
Env: VAL_FAST=1 validates the bench fast-Newton config (default here),
     VAL_FAST=0 the damped parity config; VAL_TOL / VAL_CAP / VAL_UNROLL.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GOLDEN = os.path.join(REPO, "tests", "goldens", "dbmixer_tran.csv")


def run(dtype_name: str, platform: str, steps: int):
    import subprocess
    import json
    fast = os.environ.get("VAL_FAST", "1") != "0"
    code = f"""
import json, sys
sys.path.insert(0, {REPO!r})
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_bench_cache')
{"jax.config.update('jax_platforms', 'cpu'); jax.config.update('jax_enable_x64', True)" if platform == 'cpu' else ''}
import jax.numpy as jnp
import numpy as np
from circuitsimulator_tpu import Simulator, DEFAULT_OPTIONS
dtype = jnp.{dtype_name}
import os as _os
opts = DEFAULT_OPTIONS.replace(dtype=dtype, tran_solver='woodbury',
                               tran_tol=(float(_os.environ.get('VAL_TOL', '1e-5')) if dtype == jnp.float32 else 1e-6),
                               dc_tol=(1e-5 if dtype == jnp.float32 else 1e-9))
# fast-Newton bench configuration (f32 side only; VAL_FAST=0 for damped parity)
if dtype == jnp.float32 and {fast!r}:
    opts = opts.replace(tran_alpha=1.0, tran_predictor=True,
                        tran_max_newton_iters=int(_os.environ.get('VAL_CAP', '6')),
                        tran_unrolled_iters=int(_os.environ.get('VAL_UNROLL', '2')))
sim = Simulator.from_file({os.path.join(REPO, 'tests/netlists/dbmixer.sp')!r}, opts=opts)
res = sim.transient(tstep=1e-13, tstop={steps}e-13)
xs = np.asarray(jax.device_get(res.xs), dtype=np.float64)
# map to the reference CSV column order (V columns then I columns)
col_eqs = np.concatenate([sim.topo.volt_col_eqs, sim.topo.branch_col_eqs]).astype(int)
np.save('/tmp/val_{dtype_name}.npy', xs[:, col_eqs])
print(json.dumps({{'iters': int(np.asarray(res.newton_iters).sum()),
                   'failed': bool(np.any(np.asarray(res.failed)))}}))
"""
    out = subprocess.run([sys.executable, "-u", "-c", code],
                         capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def run_fused_full(steps: int, chunk: int = 200):
    """Advance the full run with the fused Pallas chunk kernel
    (ops/pallas_step.py) on the default platform, streaming EVERY golden
    CSV column at EVERY step through the kernel's probe output (the same
    probe_mat machinery .MEASURE uses) — the full-trajectory accuracy
    evidence for the headline path, not boundary samples.
    Returns (step_indices 0..steps, waveform (steps+1, P) in the
    reference CSV column order)."""
    import jax
    interpret = bool(os.environ.get("VAL_INTERPRET"))
    if interpret:                      # CPU plumbing check (tiny steps)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    from circuitsimulator_tpu import Simulator, DEFAULT_OPTIONS
    from circuitsimulator_tpu.ops import pallas_step

    opts = DEFAULT_OPTIONS.replace(
        dtype=jnp.float32, tran_solver="woodbury", tran_tol=1e-5,
        dc_tol=1e-5, tran_alpha=1.0, tran_predictor=True,
        tran_max_newton_iters=6, tran_unrolled_iters=2)
    sim = Simulator.from_file(os.path.join(REPO, "tests/netlists/dbmixer.sp"),
                              opts=opts)
    engine = sim.engine
    B = 128  # one lane block, identical unperturbed lanes
    bp = jax.tree.map(
        lambda a: jnp.broadcast_to(jnp.asarray(a)[None],
                                   (B,) + jnp.asarray(a).shape),
        dict(sim.params))
    dt = float(sim.config.tran.tstep)
    x0 = sim.dc()
    x0b = jnp.broadcast_to(x0[None], (B, engine.N))
    st0 = engine.init_state(x0)
    vc0 = jnp.broadcast_to(st0["vc"][None], (B,) + st0["vc"].shape)
    il0 = jnp.broadcast_to(st0["il"][None], (B,) + st0["il"].shape)
    col_eqs = np.concatenate([sim.topo.volt_col_eqs,
                              sim.topo.branch_col_eqs]).astype(int)
    P = len(col_eqs)
    probe_mat = np.zeros((P, engine.N), np.float32)
    probe_mat[np.arange(P), col_eqs] = 1.0
    runner = pallas_step.PallasStepRunner(engine, bp, dt,
                                          probe_mat=probe_mat)
    run = jax.jit(lambda c, s0: runner.run_chunk(*c, s0, chunk,
                                                 interpret=interpret))
    carry = (x0b, x0b, vc0, il0, jnp.zeros((B,), bool))
    waves = [np.asarray(x0)[col_eqs][None]]      # step 0 = DC point
    n_chunks = steps // chunk
    for i in range(n_chunks):
        out = run(carry, jnp.asarray(float(i * chunk), jnp.float32))
        carry = out[:5]
        # probe block (chunk, P, B): every step, lane 0
        waves.append(np.asarray(jax.device_get(out[6][:, :, 0]),
                                np.float64))
    waves = np.concatenate(waves, axis=0)        # (steps+1, P)
    idx = np.arange(waves.shape[0])
    return idx, waves


def report(tag, ref, ours):
    import numpy as np
    n = min(len(ref), len(ours))
    err = np.abs(ref[:n] - ours[:n])
    scale = np.maximum(np.abs(ref[:n]).max(axis=0), 1e-12)
    print(f"--- f32 vs {tag} ({n - 1} steps) ---")
    print(f"max abs error:  {err.max():.3e}")
    print(f"max rel error:  {(err.max(axis=0) / scale).max():.3e}")
    print(f"rms abs error:  {np.sqrt((err ** 2).mean()):.3e}")
    worst = int(np.argmax(err.max(axis=0)))
    print(f"worst column index {worst}: max {err[:, worst].max():.3e} "
          f"(signal amplitude {scale[worst]:.3e})")
    return {"steps": n - 1, "max_abs": float(err.max()),
            "max_rel": float((err.max(axis=0) / scale).max()),
            "rms_abs": float(np.sqrt((err ** 2).mean()))}


def main():
    import json
    import numpy as np
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    fast = os.environ.get("VAL_FAST", "1") != "0"
    cfg = "fast-Newton bench" if fast else "damped parity"

    if os.environ.get("VAL_FUSED"):
        # fused Pallas chunk kernel vs the reference golden at EVERY
        # step over the full run (per-step probe streaming)
        chunk = int(os.environ.get("VAL_FUSED_CHUNK", "200"))
        idx, ours = run_fused_full(steps, chunk)
        with open(GOLDEN) as f:
            f.readline()
            golden = np.loadtxt(f, delimiter=",")[:, 1:]
        golden_s = golden[idx[idx < len(golden)]]
        summary = {"config": cfg + "+fused", "steps": steps,
                   "samples": int(len(idx)),
                   "vs_ref_golden": report(
                       f"reference golden (all {len(idx)} steps)",
                       golden_s, ours[: len(golden_s)])}
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "accuracy_dbmixer_fused.json")
        with open(out, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"wrote {out}")
        return
    print(f"validating {steps} dbmixer steps: f32 ({cfg} config) "
          f"vs f64 oracle AND vs reference golden")
    a = run("float64", "cpu", steps)
    b = run("float32", "default", steps)
    oracle = np.load("/tmp/val_float64.npy")
    f32 = np.load("/tmp/val_float32.npy")
    print(f"f64 Newton iters: {a['iters']}   f32 Newton iters: {b['iters']}")
    summary = {"config": cfg, "steps": steps,
               "vs_f64_oracle": report("f64 oracle", oracle, f32)}

    with open(GOLDEN) as f:
        f.readline()
        golden = np.loadtxt(f, delimiter=",")[:, 1:]   # drop time column
    summary["vs_ref_golden"] = report("reference golden", golden, f32)
    # oracle-vs-golden closes the triangle: shows the f64 path itself matches
    # the C++ binary to print precision, so the f32 deltas are f32's alone.
    summary["oracle_vs_ref_golden"] = report("(oracle vs golden)",
                                             golden, oracle)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "accuracy_dbmixer.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
