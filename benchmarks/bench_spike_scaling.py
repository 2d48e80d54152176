#!/usr/bin/env python
"""SPIKE scaling curve on the virtual CPU mesh (VERDICT r2 item 8):
one 10k-unknown grid transient, its banded solve SPIKE-decomposed over
1/2/4/8 virtual devices (parallel/spike.py over shard_map).

On a single-socket host the virtual mesh measures ALGORITHMIC overhead
(partitioning + reduced-system cost as device count grows), not
hardware speedup — all devices share the same cores.  The useful
signals are (a) every configuration solves the same trajectory, and
(b) wall time stays roughly flat as the mesh widens: the partitioned
solve does ~the same total work, so on REAL chips (each shard on its
own core/chip) the per-device work drops ~linearly.

Usage: python benchmarks/bench_spike_scaling.py [ROWS=125] [COLS=80]
[STEPS=20].  Prints one JSON line.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from circuitsimulator_tpu import Simulator, DEFAULT_OPTIONS
    from circuitsimulator_tpu.analysis.transient import run_transient
    from circuitsimulator_tpu.parallel.spike import PART_AXIS
    from circuitsimulator_tpu.synthetic import rc_grid_netlist

    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 125
    cols = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    tstep, tstop = 1e-12, steps * 1e-12
    sim = Simulator.from_text(
        rc_grid_netlist(rows, cols, diode_every=37, tstep=tstep,
                        tstop=tstop),
        opts=DEFAULT_OPTIONS.replace(dtype=jnp.float32, dc_tol=1e-5,
                                     tran_tol=1e-4,
                                     tran_solver="blockband"))
    N = sim.topo.n_unknowns
    devs = jax.devices()
    out = {"metric": "spike_scaling_virtual_mesh",
           "unit": f"s for {steps} steps, {N} unknowns (virtual CPU "
                   "mesh: algorithmic overhead, not hardware speedup)",
           "points": []}
    ref = None
    for nd in (1, 2, 4, 8):
        mesh = Mesh(np.array(devs[:nd]), (PART_AXIS,))
        fn = jax.jit(lambda p, m=mesh: run_transient(
            sim.engine, p, tstep, tstop, mesh=m))
        t0 = time.time()
        res = fn(sim.params)
        jax.block_until_ready(res.xs)
        cold = time.time() - t0
        t0 = time.time()
        res = fn(sim.params)
        jax.block_until_ready(res.xs)
        warm = time.time() - t0
        xf = np.asarray(res.x_final if hasattr(res, "x_final")
                        else res.xs[-1])
        if ref is None:
            ref = xf
        drift = float(np.abs(xf - ref).max())
        assert not bool(np.asarray(res.failed).any())
        out["points"].append({"devices": nd, "cold_s": round(cold, 1),
                              "warm_s": round(warm, 2),
                              "max_diff_vs_1dev": drift})
        print(f"[spike] {nd} devices: cold {cold:.1f}s warm {warm:.2f}s "
              f"max|x - x_1dev| {drift:.2e}", file=sys.stderr, flush=True)
    out["value"] = out["points"][-1]["warm_s"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
