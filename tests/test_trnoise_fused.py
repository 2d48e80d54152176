"""Fused-kernel TRNOISE: noisy Monte-Carlo transients on the Pallas chunk
kernel.  The per-step source-noise values are precomputed OUTSIDE the
kernel by Engine.trnoise_stream — the same threefry draws as the XLA
scan's state carry (bitwise for white noise; the flicker AR(1) recursion
matches to f32 fusion order) — and streamed in as a (chunk, nN, B) VMEM
block (ops/pallas_step.py run_chunk(noise=...)).

Noise is an extension (the reference has no noise at all); these tests
pin the fused path to the XLA noise path, which test_trnoise.py pins
statistically."""

import numpy as np
import jax
import jax.numpy as jnp

from circuitsimulator_tpu import Simulator, DEFAULT_OPTIONS
from circuitsimulator_tpu.parallel import montecarlo as mc
from circuitsimulator_tpu.ops import pallas_step


WHITE_DECK = """* white noise, V and I sources, diode load
V1 in 0 DC 1 TRNOISE(5m 0)
I1 0 out 1m TRNOISE(2u 2.5e-7)
R1 in out 1k
R2 out 0 1k
C1 out 0 1n
D1 out 0
.TRAN 1e-7 4e-6
"""

FLICKER_DECK = """* white + flicker, sample-hold window
V1 in 0 DC 1 TRNOISE(2m 3e-7 1.0 1m)
R1 in out 1k
R2 out 0 1k
C1 out 0 1n
.TRAN 1e-7 3e-6
.MEASURE TRAN vavg AVG V(out) FROM=0 TO=3e-6
"""


def _opts():
    return DEFAULT_OPTIONS.replace(dtype=jnp.float32,
                                   tran_solver="woodbury",
                                   tran_tol=1e-5, dc_tol=1e-5)


def _sim(deck):
    sim = Simulator.from_text(deck, opts=_opts())
    bp = mc.perturb_params(sim.params, jax.random.key(0), 128,
                           {"res_r": 0.01})
    return sim, bp


def test_trnoise_stream_is_the_xla_carry_sequence():
    """trnoise_stream == the init_state/update_state per-step carry,
    bitwise for the white part, chunk-stitched across a boundary."""
    sim, _ = _sim(WHITE_DECK)
    eng, p = sim.engine, sim.params
    key, dt = jax.random.key(7), 1e-7
    x0 = jnp.zeros((eng.N,), jnp.float32)
    st = dict(eng.init_state(x0, p, dt, noise_key=key))
    upd = eng.make_update_state(dt)
    seq_v, seq_i = [st["tn_v"]], [st["tn_i"]]
    for _ in range(11):
        st = upd(p, x0, st)
        seq_v.append(st["tn_v"])
        seq_i.append(st["tn_i"])
    seq_v = np.stack([np.asarray(a) for a in seq_v])
    seq_i = np.stack([np.asarray(a) for a in seq_i])

    tnv, tni, _, _ = eng.trnoise_stream(p, key, 0, 12, dt)
    np.testing.assert_array_equal(np.asarray(tnv), seq_v)
    np.testing.assert_array_equal(np.asarray(tni), seq_i)

    tv1, ti1, fv1, fi1 = eng.trnoise_stream(p, key, 0, 5, dt)
    tv2, ti2, _, _ = eng.trnoise_stream(p, key, 5, 7, dt, fv1, fi1)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(tv1), np.asarray(tv2)]), seq_v)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(ti1), np.asarray(ti2)]), seq_i)


def test_trnoise_stream_flicker_stitches_chunks():
    """The flicker AR(1) bank state hands off between chunks (f32
    fusion-order tolerance; amplitude 1m -> 1e-9 is ULP-level)."""
    sim, _ = _sim(FLICKER_DECK)
    eng, p = sim.engine, sim.params
    key, dt = jax.random.key(3), 1e-7
    whole = eng.trnoise_stream(p, key, 0, 12, dt)[0]
    tv1, _, fv1, fi1 = eng.trnoise_stream(p, key, 0, 5, dt)
    tv2 = eng.trnoise_stream(p, key, 5, 7, dt, fv1, fi1)[0]
    np.testing.assert_allclose(
        np.concatenate([np.asarray(tv1), np.asarray(tv2)]),
        np.asarray(whole), atol=1e-8)


def test_fused_white_noise_matches_xla():
    sim, bp = _sim(WHITE_DECK)
    nk = jax.random.key(99)
    r_x = mc.batched_transient(sim.engine, bp, 1e-7, 4e-6, fused=False,
                               noise_key=nk)
    r_f = mc.batched_transient(sim.engine, bp, 1e-7, 4e-6, fused=True,
                               noise_key=nk)
    np.testing.assert_allclose(np.asarray(r_f.x_final),
                               np.asarray(r_x.x_final), atol=5e-6)
    np.testing.assert_array_equal(np.asarray(r_f.failed),
                                  np.asarray(r_x.failed))
    # and the noise actually did something
    r_0 = mc.batched_transient(sim.engine, bp, 1e-7, 4e-6, fused=True)
    assert np.abs(np.asarray(r_f.x_final)
                  - np.asarray(r_0.x_final)).max() > 1e-4


def test_fused_flicker_multichunk_matches_xla():
    """chunk=7 over 30 steps: 4 full chunks + remainder, flicker bank
    carried across every boundary."""
    sim, bp = _sim(FLICKER_DECK)
    nk = jax.random.key(5)
    r_x = mc.batched_transient(sim.engine, bp, 1e-7, 3e-6, fused=False,
                               noise_key=nk)
    r_f = mc._fused_batched_transient(sim.engine, bp, 1e-7, 3e-6,
                                      chunk=7, interpret=True,
                                      noise_key=nk)
    np.testing.assert_allclose(np.asarray(r_f.x_final),
                               np.asarray(r_x.x_final), atol=5e-6)


def test_fused_streaming_measures_with_noise():
    sim, bp = _sim(FLICKER_DECK)
    nk = jax.random.key(5)
    _, vals_f = mc.batched_transient_measures(
        sim.engine, bp, 1e-7, 3e-6, sim.config.measures, sim.topo,
        fused=True, noise_key=nk)
    _, vals_x = mc.batched_transient_measures(
        sim.engine, bp, 1e-7, 3e-6, sim.config.measures, sim.topo,
        fused=False, noise_key=nk)
    np.testing.assert_allclose(np.asarray(vals_f["vavg"]),
                               np.asarray(vals_x["vavg"]), atol=5e-6)


def test_noise_block_budget_gate():
    assert pallas_step.noise_block_ok(1, 2000)
    assert pallas_step.noise_block_ok(16, 512)
    assert not pallas_step.noise_block_ok(17, 512)
    assert not pallas_step.noise_block_ok(0, 512)
