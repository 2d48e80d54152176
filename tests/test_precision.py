"""Mixed-precision DC: iterative refinement (f32-factorization Newton with
high-precision residuals, analysis/dc.dc_refine) and the Monte-Carlo
warm-start batched DC (parallel/montecarlo.batched_dc_warm).

SURVEY.md §7 hard-part 4: the TPU has no f64 ALU, so the f64 strategy is
f32 LU + refinement — these tests pin that the refined point beats even the
plain f64 ramped solve (which carries the ~1e-6 gmin leak)."""

import numpy as np
import jax.numpy as jnp

from circuitsimulator_tpu import Simulator, DEFAULT_OPTIONS
from circuitsimulator_tpu.analysis.dc import dc_refine, dc_residual
from circuitsimulator_tpu.parallel.montecarlo import (perturb_params,
                                                      batched_dc_fast,
                                                      batched_dc_warm)

DECK = "tests/netlists/dbmixer.sp"


def test_dc_refine_reaches_f64_residual():
    sim64 = Simulator.from_file(DECK)
    sim32 = Simulator.from_file(DECK, opts=DEFAULT_OPTIONS.replace(
        dtype=jnp.float32, dc_tol=1e-5))
    x32 = jnp.asarray(np.asarray(sim32.dc()), jnp.float64)
    r0 = float(dc_residual(sim64.engine, sim64.params, x32))
    assert r0 < 1e-3                       # f32 start is sane
    x_ref = dc_refine(sim64.engine, sim64.params, x32, n_iter=3)
    r_ref = float(dc_residual(sim64.engine, sim64.params, x_ref))
    assert r_ref < 1e-10, r_ref
    # beats the plain f64 ramped solve, which keeps gmin stamped
    x64 = sim64.dc()
    r64 = float(dc_residual(sim64.engine, sim64.params, x64))
    assert r_ref < r64


def test_dc_refine_batched():
    sim64 = Simulator.from_file(DECK)
    B = 4
    bp = perturb_params(sim64.params, __import__("jax").random.key(7), B,
                        {"res_r": 0.01, "mos_vth": 0.02})
    x = batched_dc_fast(sim64.engine, bp)
    x_ref = dc_refine(sim64.engine, bp, x, n_iter=2, batch=B)
    r = np.asarray(dc_residual(sim64.engine, bp, x_ref))
    assert r.shape == (B,)
    assert r.max() < 1e-10, r


def test_batched_dc_warm_same_fixpoint():
    import jax
    sim = Simulator.from_file(DECK)
    B = 8
    bp = perturb_params(sim.params, jax.random.key(3), B,
                        {"res_r": 0.01, "mos_vth": 0.02, "cap_c": 0.02})
    x_ramp = batched_dc_fast(sim.engine, bp)
    x_nom = sim.dc()
    x_warm = batched_dc_warm(sim.engine, bp, x_nom)
    d = float(jnp.max(jnp.abs(x_ramp - x_warm)))
    # same tolerance, same gmin schedule at scale 1 — same fixpoint to
    # within the Newton stop
    assert d < 50 * sim.opts.dc_tol, d
