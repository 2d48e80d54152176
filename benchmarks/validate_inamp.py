#!/usr/bin/env python
"""Long-trajectory accuracy artifact for a k > 16 fused deck (r5,
VERDICT item 9).

inamp.sp (22-MOS instrumentation amplifier, Woodbury rank k = 22) runs
the fused kernel's column-pivoted Gauss-Jordan branch — the one path
whose pivoting differs from the XLA LU, so it only holds f32-resolution
agreement per step.  This script quantifies the drift over a LONG
trajectory the way accuracy_dbmixer_fused.json does for the k <= 16
branch: 50,000 steps (dt = 1e-9, 50 periods of the 1 MHz input), every
probe column streamed at every step through the kernel's probe output,
against the f64 CPU oracle (exact reference tolerances, the
parity-tested XLA path).

Writes benchmarks/accuracy_inamp_fused.json.  Env: VAL_STEPS (50000),
VAL_INTERPRET=1 for a tiny CPU plumbing check, VAL_FUSED_CHUNK (200).
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DECK = os.path.join(REPO, "tests", "netlists", "inamp.sp")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def oracle_f64(steps: int):
    """f64 oracle in a subprocess (needs x64 + CPU before any jnp op)."""
    import subprocess
    code = f"""
import sys
sys.path.insert(0, {REPO!r})
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_bench_cache')
import jax.numpy as jnp
import numpy as np
from circuitsimulator_tpu import Simulator, DEFAULT_OPTIONS
opts = DEFAULT_OPTIONS.replace(dtype=jnp.float64, tran_solver='woodbury')
sim = Simulator.from_file({DECK!r}, opts=opts)
sim.config.tran.tstop = {steps} * sim.config.tran.tstep
res = sim.transient()
xs = np.asarray(res.xs, np.float64)
cols = np.concatenate([sim.topo.volt_col_eqs,
                       sim.topo.branch_col_eqs]).astype(int)
np.save('/tmp/inamp_oracle.npy', xs[:, cols])
print('oracle steps:', xs.shape[0] - 1, 'failed:', bool(np.any(np.asarray(res.failed))))
"""
    r = subprocess.run([sys.executable, "-c", code])
    if r.returncode != 0:
        raise RuntimeError("f64 oracle run failed")
    import numpy as np
    return np.load("/tmp/inamp_oracle.npy")


def fused_f32(steps: int, chunk: int):
    import jax
    interpret = bool(os.environ.get("VAL_INTERPRET"))
    if interpret:
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
    sim = Simulator.from_file(DECK, opts=opts)
    engine = sim.engine
    dt = float(sim.config.tran.tstep)
    assert pallas_step.supported(engine, dt), "inamp must be fused-eligible"
    B = 128
    bp = jax.tree.map(
        lambda a: jnp.broadcast_to(jnp.asarray(a)[None],
                                   (B,) + jnp.asarray(a).shape),
        dict(sim.params))
    x0 = sim.dc()
    x0b = jnp.broadcast_to(x0[None], (B, engine.N))
    st0 = engine.init_state(x0)
    vc0 = jnp.broadcast_to(st0["vc"][None], (B,) + st0["vc"].shape)
    il0 = jnp.broadcast_to(st0["il"][None], (B,) + st0["il"].shape)
    cols = np.concatenate([sim.topo.volt_col_eqs,
                           sim.topo.branch_col_eqs]).astype(int)
    P = len(cols)
    probe_mat = np.zeros((P, engine.N), np.float32)
    probe_mat[np.arange(P), cols] = 1.0
    runner = pallas_step.PallasStepRunner(engine, bp, dt,
                                          probe_mat=probe_mat)
    run = jax.jit(lambda c, s0: runner.run_chunk(*c, s0, chunk,
                                                 interpret=interpret))
    carry = (x0b, x0b, vc0, il0, jnp.zeros((B,), bool))
    rows = [np.asarray(jax.device_get(x0))[cols][None]]
    n_chunks = steps // chunk
    for i in range(n_chunks):
        out = run(carry, jnp.asarray(float(i * chunk), jnp.float32))
        carry = out[:5]
        probes = np.asarray(jax.device_get(out[6]))   # (chunk, P, B)
        rows.append(probes[:, :, 0])
        if (i + 1) % 50 == 0:
            log(f"fused chunk {i + 1}/{n_chunks}")
    failed = int(np.asarray(jax.device_get(out[4])).sum())
    log(f"fused failed lanes: {failed}/{B}")
    return np.concatenate(rows, axis=0)               # (steps+1, P)


def xla_f32(steps: int):
    """Same fast-Newton configuration on the XLA loop (partial-pivot
    Pallas/XLA LU) — isolates the Gauss-Jordan branch's pivoting cost
    from the fast-Newton trajectory cost."""
    import subprocess
    code = f"""
import sys
sys.path.insert(0, {REPO!r})
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_bench_cache')
{"jax.config.update('jax_platforms', 'cpu')" if os.environ.get('VAL_INTERPRET') else ''}
import jax.numpy as jnp
import numpy as np
from circuitsimulator_tpu import Simulator, DEFAULT_OPTIONS
opts = DEFAULT_OPTIONS.replace(dtype=jnp.float32, tran_solver='woodbury',
                               tran_tol=1e-5, dc_tol=1e-5, tran_alpha=1.0,
                               tran_predictor=True, tran_max_newton_iters=6,
                               tran_unrolled_iters=2)
sim = Simulator.from_file({DECK!r}, opts=opts)
sim.config.tran.tstop = {steps} * sim.config.tran.tstep
res = sim.transient()
xs = np.asarray(res.xs, np.float64)
cols = np.concatenate([sim.topo.volt_col_eqs,
                       sim.topo.branch_col_eqs]).astype(int)
np.save('/tmp/inamp_xla32.npy', xs[:, cols])
print('xla f32 failed:', bool(np.any(np.asarray(res.failed))))
"""
    r = subprocess.run([sys.executable, "-c", code])
    if r.returncode != 0:
        raise RuntimeError("f32 XLA run failed")
    import numpy as np
    return np.load("/tmp/inamp_xla32.npy")


def _report(want, got):
    import numpy as np
    n = min(len(got), len(want))
    err = np.abs(got[:n].astype(np.float64) - want[:n])
    scale = np.maximum(np.abs(want[:n]).max(axis=0), 1e-12)
    return n, {"max_abs": float(err.max()),
               "max_rel": float((err.max(axis=0) / scale).max()),
               "rms_abs": float(np.sqrt((err ** 2).mean()))}


def main():
    import numpy as np
    steps = int(os.environ.get("VAL_STEPS", 50000))
    chunk = int(os.environ.get("VAL_FUSED_CHUNK", 200))
    steps = (steps // chunk) * chunk
    log(f"inamp k=22 fused accuracy: {steps} steps vs f64 oracle")
    ours = fused_f32(steps, chunk)
    want = oracle_f64(steps)
    x32 = xla_f32(steps)
    n, fused_rep = _report(want, ours)
    _, xla_rep = _report(want, x32)
    _, branch_rep = _report(x32, ours)
    summary = {
        "deck": "inamp.sp (k=22, Gauss-Jordan fused branch)",
        "config": "fast-Newton bench+fused vs f64 oracle",
        "steps": n - 1,
        "samples": n,
        "vs_f64_oracle": fused_rep,
        "xla_f32_vs_f64_oracle": xla_rep,
        "fused_vs_xla_f32": branch_rep,
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "accuracy_inamp_fused.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    log(json.dumps(summary))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
