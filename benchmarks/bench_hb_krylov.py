#!/usr/bin/env python
"""Matrix-free Newton-GMRES HB vs the dense-Jacobian solver on one chip.

Two regimes:
  - dbmixer H=64 (K=129, N=31, KN=3999): both solvers run; per-call wall
    at a fixed Newton budget shows the crossover territory.
  - nonlinear RC ladder, 60 sections, H=64 (N=62, KN=7998): the dense
    Jacobian is a 7998^2 f32 matrix (256 MB) LU-solved per Newton —
    gmres-only here; the recorded number is the capability figure for
    harmonic-count x node-count products the dense path cannot touch.

Prints one JSON line.  Env: BENCH_PLATFORM=cpu for the CPU fallback.
Reference has no HB at all (empty src/sstateanalysis.cpp).
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def ladder_text(sections=60, every=3):
    lines = ["V1 1 0 SIN 0 2 1e6"]
    for i in range(1, sections + 1):
        lines.append(f"R{i} {i} {i+1} 100")
        lines.append(f"C{i} {i+1} 0 1e-9")
        if i % every == 0:
            lines.append(f"D{i} {i+1} 0 1")
    lines += [".MODEL 1 IS 1e-12", ".hb 1e6 64"]
    return "\n".join(lines) + "\n"


def run(sim, f0, n_harm, solver, max_newton, tag):
    from circuitsimulator_tpu.analysis.hb import harmonic_balance
    import jax
    t0 = time.time()
    r = harmonic_balance(sim.engine, sim.params, f0, n_harm=n_harm,
                         solver=solver, max_newton=max_newton,
                         warmup_periods=2)
    jax.block_until_ready(r.xs)
    wall = time.time() - t0
    KN = (2 * n_harm + 1) * sim.engine.N
    log(f"[{tag}] {solver}: KN={KN} wall {wall:.1f}s "
        f"res={float(r.residual):.2e} iters={r.newton_iters} "
        f"conv={bool(r.converged)}")
    return {"solver": solver, "KN": KN, "wall_s": round(wall, 2),
            "residual": float(r.residual), "newton_iters": r.newton_iters,
            "converged": bool(r.converged)}


def main():
    platform = os.environ.get("BENCH_PLATFORM")
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("BENCH_CACHE",
                                         "/tmp/jax_bench_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:  # noqa: BLE001
        pass
    from circuitsimulator_tpu import Simulator

    log(f"device: {jax.devices()[0]}")
    out = {"metric": "hb_krylov", "unit": "wall_s per HB solve"}

    simm = Simulator.from_file(
        os.path.join(REPO, "tests/netlists/dbmixer.sp"))
    out["dbmixer_h64_dense"] = run(simm, 100e6, 64, "dense", 6,
                                   "dbmixer_h64")
    out["dbmixer_h64_gmres"] = run(simm, 100e6, 64, "gmres", 6,
                                   "dbmixer_h64")

    siml = Simulator.from_text(ladder_text())
    out["ladder_h64_gmres"] = run(siml, 1e6, 64, "gmres", 8,
                                  "ladder_h64")

    out["value"] = out["ladder_h64_gmres"]["wall_s"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
