"""Mixed-precision transient (opts.tran_mixed_refine, r5 VERDICT item
10): f64 residuals/carry with f32 inner Newton solves must track the
full-f64 trajectory to ~refinement accuracy — orders below the all-f32
path's error — because Newton itself is the refinement loop."""

import jax.numpy as jnp
import numpy as np
import pytest

from circuitsimulator_tpu import Simulator, DEFAULT_OPTIONS

DECK = "tests/netlists/dbmixer.sp"
STEPS = 500


def _run(opts):
    sim = Simulator.from_file(DECK, opts=opts)
    sim.config.tran.tstop = STEPS * sim.config.tran.tstep
    res = sim.transient()
    assert not bool(np.any(np.asarray(res.failed)))
    return np.asarray(res.xs, np.float64)


@pytest.mark.smoke
def test_mixed_refine_tracks_f64():
    o64 = DEFAULT_OPTIONS.replace(dtype=jnp.float64, tran_solver="lu",
                                  auto_backend=False)
    x64 = _run(o64)
    xmx = _run(o64.replace(tran_mixed_refine=True))
    err_mixed = np.abs(xmx - x64).max()
    assert err_mixed < 1e-9, err_mixed

    o32 = DEFAULT_OPTIONS.replace(dtype=jnp.float32, tran_solver="lu",
                                  auto_backend=False,
                                  tran_tol=1e-5, dc_tol=1e-5)
    x32 = _run(o32)
    err_f32 = np.abs(x32 - x64).max()
    # the mixed path buys >=3 orders over all-f32 at f32 solve cost
    assert err_mixed < 1e-3 * err_f32, (err_mixed, err_f32)
