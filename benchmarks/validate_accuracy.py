#!/usr/bin/env python
"""Accuracy validation for the f32 benchmark configuration.

Runs the dbmixer transient for VSTEPS steps twice —
  (a) float64, exact reference tolerances, CPU (the parity-tested oracle);
  (b) float32, bench tolerances (tran_tol=1e-4), on the default platform —
and reports per-column maximum / RMS waveform error.  This quantifies what
the throughput benchmark's relaxed Newton stop costs in accuracy.

Usage: python benchmarks/validate_accuracy.py [VSTEPS=5000]
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(dtype_name: str, platform: str, steps: int):
    import subprocess
    import json
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
# VAL_FAST: validate the bench's fast-Newton configuration (f32 side only)
if dtype == jnp.float32 and _os.environ.get('VAL_FAST'):
    opts = opts.replace(tran_alpha=1.0, tran_predictor=True,
                        tran_max_newton_iters=int(_os.environ.get('VAL_CAP', '6')),
                        tran_unrolled_iters=int(_os.environ.get('VAL_UNROLL', '0')))
sim = Simulator.from_file({os.path.join(REPO, 'tests/netlists/dbmixer.sp')!r}, opts=opts)
res = sim.transient(tstep=1e-13, tstop={steps}e-13)
xs = np.asarray(res.xs, dtype=np.float64)
np.save('/tmp/val_{dtype_name}.npy', xs)
print(json.dumps({{'iters': int(np.asarray(res.newton_iters).sum()),
                   'failed': bool(np.any(np.asarray(res.failed)))}}))
"""
    out = subprocess.run([sys.executable, "-u", "-c", code],
                         capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    import numpy as np
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    print(f"validating {steps} dbmixer steps: f32 (bench config) vs f64 oracle")
    a = run("float64", "cpu", steps)
    b = run("float32", "default", steps)
    ref = np.load("/tmp/val_float64.npy")
    f32 = np.load("/tmp/val_float32.npy")
    err = np.abs(ref - f32)
    scale = np.maximum(np.abs(ref).max(axis=0), 1e-12)
    print(f"f64 Newton iters: {a['iters']}   f32 Newton iters: {b['iters']}")
    print(f"max abs error:  {err.max():.3e}")
    print(f"max rel error:  {(err.max(axis=0) / scale).max():.3e}")
    print(f"rms abs error:  {np.sqrt((err ** 2).mean()):.3e}")
    worst = int(np.argmax(err.max(axis=0)))
    print(f"worst column index {worst}: max {err[:, worst].max():.3e} "
          f"(signal amplitude {scale[worst]:.3e})")


if __name__ == "__main__":
    main()
