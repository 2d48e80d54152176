"""Batch layer: vmap consistency, Monte-Carlo perturbation, multi-chip
sharding on the virtual 8-device CPU mesh, checkpoint/resume."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from circuitsimulator_tpu.api import Simulator
from circuitsimulator_tpu.parallel.montecarlo import (
    broadcast_params, perturb_params, batched_dc, batched_transient,
)
from circuitsimulator_tpu.parallel.sharding import (
    make_mesh, sharded_transient, sweep_statistics,
)
from circuitsimulator_tpu.parallel.checkpoint import ChunkedTransient

MIXER = "tests/netlists/dbmixer.sp"
BUFFER = "tests/netlists/buffer.sp"


def test_broadcast_batch_equals_single():
    sim = Simulator.from_file(BUFFER)
    x1 = np.asarray(sim.dc())
    xb = np.asarray(batched_dc(sim.engine, broadcast_params(sim.params, 8)))
    assert xb.shape == (8, 13)
    for i in range(8):
        np.testing.assert_array_equal(xb[i], x1)


def test_perturbed_monte_carlo_dc_spread():
    sim = Simulator.from_file(BUFFER)
    B = 64
    bp = perturb_params(sim.params, jax.random.key(0), B,
                        {"mos_vth": 0.05, "res_r": 0.01})
    xb = np.asarray(batched_dc(sim.engine, bp))
    assert xb.shape == (B, 13)
    assert np.all(np.isfinite(xb))
    # V(107) (eq 3) is MOS-bias dependent: must actually vary across lanes
    assert np.std(xb[:, 3]) > 1e-4
    # VDD node (eq 0) is pinned by the source: must stay 3 V
    np.testing.assert_allclose(xb[:, 0], 3.0, atol=1e-9)


def test_batched_transient_short():
    sim = Simulator.from_file(MIXER)
    B = 4
    bp = broadcast_params(sim.params, B)
    res = batched_transient(sim.engine, bp, 1e-13, 2e-11, save_xs=False)
    assert res.x_final.shape == (B, 31)
    assert not np.any(np.asarray(res.failed))
    single = sim.transient(tstep=1e-13, tstop=2e-11, save_xs=False)
    np.testing.assert_allclose(np.asarray(res.x_final[0]),
                               np.asarray(single.x_final),
                               rtol=0, atol=1e-12)


def test_batched_transient_fused_dispatch():
    """fused=True routes the sweep through the Pallas chunk kernel
    (interpret mode on CPU); final state matches the vmapped XLA loop.
    Engine tolerances are relaxed to the fused kernel's f32 scope."""
    from circuitsimulator_tpu.utils.options import DEFAULT_OPTIONS
    opts = DEFAULT_OPTIONS.replace(dtype=jnp.float32, tran_solver="woodbury",
                                   tran_tol=1e-5, dc_tol=1e-5)
    sim = Simulator.from_file(MIXER, opts=opts)
    B = 128
    bp = broadcast_params(sim.params, B)
    res_f = batched_transient(sim.engine, bp, 1e-13, 1e-11, save_xs=False,
                              fused=True)
    res_x = batched_transient(sim.engine, bp, 1e-13, 1e-11, save_xs=False,
                              fused=False)
    assert res_f.xs is None and res_f.x_final.shape == (B, 31)
    assert not np.any(np.asarray(res_f.failed))
    np.testing.assert_allclose(np.asarray(res_f.x_final),
                               np.asarray(res_x.x_final), atol=5e-5)


def test_sharded_transient_on_8_device_mesh():
    assert len(jax.devices()) == 8, "conftest should give 8 virtual devices"
    sim = Simulator.from_file(MIXER)
    mesh = make_mesh()
    B = 16  # 2 lanes per device
    bp = broadcast_params(sim.params, B)
    res = sharded_transient(sim.engine, mesh, bp, 1e-13, 1e-11,
                            save_xs=False)
    xf = res.x_final
    # result is actually sharded over the mesh
    assert not xf.sharding.is_fully_replicated
    assert xf.shape == (B, 31)
    single = sim.transient(tstep=1e-13, tstop=1e-11, save_xs=False)
    for i in range(B):
        np.testing.assert_allclose(np.asarray(xf[i]),
                                   np.asarray(single.x_final),
                                   rtol=0, atol=1e-12)
    stats = jax.jit(sweep_statistics)(xf)
    np.testing.assert_allclose(np.asarray(stats["mean"]),
                               np.asarray(single.x_final), atol=1e-13)
    np.testing.assert_allclose(np.asarray(stats["std"]), 0.0, atol=1e-13)


def test_checkpoint_resume_bitwise(tmp_path):
    sim = Simulator.from_file(BUFFER)
    tstep, tstop = 1e-9, 60e-9
    # straight run
    ref = sim.transient(tstep=tstep, tstop=tstop, save_xs=False)
    # chunked run without checkpoint file
    r1 = ChunkedTransient(sim.engine, sim.params, tstep, tstop,
                          ckpt_path=None, chunk_steps=17)
    carry1, iters1 = r1.run()
    np.testing.assert_allclose(np.asarray(carry1[0]),
                               np.asarray(ref.x_final), rtol=0, atol=1e-12)
    assert iters1 == int(np.asarray(ref.newton_iters).sum())

    # interrupted + resumed run must agree exactly with the uninterrupted one
    ck = str(tmp_path / "run.npz")
    r2 = ChunkedTransient(sim.engine, sim.params, tstep, tstop,
                          ckpt_path=ck, chunk_steps=25)
    carry = r2.initial_carry()
    # simulate a crash: run only the first chunk manually, persist
    import jax.numpy as jnp
    from circuitsimulator_tpu.parallel.checkpoint import save_carry, load_carry
    ts = jnp.arange(1, 26, dtype=sim.engine.dtype) * tstep
    carry, _ = r2._run_chunk(carry, ts)
    save_carry(ck, jax.device_get(carry), 25)
    # new object resumes from step 25
    r3 = ChunkedTransient(sim.engine, sim.params, tstep, tstop,
                          ckpt_path=ck, chunk_steps=25)
    carry3, _ = r3.run()
    np.testing.assert_array_equal(np.asarray(carry3[0]),
                                  np.asarray(carry1[0]))


def test_sharded_streaming_measures_on_mesh():
    from circuitsimulator_tpu.parallel.sharding import (
        sharded_transient_measures)
    assert len(jax.devices()) == 8
    sim = Simulator.from_text("""* rc sweep
V1 in 0 PULSE(0 1 0 1n 1n 1 2)
R1 in out 1k
C1 out 0 1n
.TRAN 20n 4u
.MEASURE TRAN t63 WHEN V(out)=0.632 RISE=1
""")
    mesh = make_mesh()
    B = 16
    bp = perturb_params(sim.params, jax.random.key(3), B, {"res_r": 0.1})
    res, vals = sharded_transient_measures(
        sim.engine, mesh, bp, sim.config.tran.tstep, sim.config.tran.tstop,
        sim.config.measures, sim.topo)
    t63 = vals["t63"]
    assert t63.shape == (B,)
    assert not t63.sharding.is_fully_replicated   # computed where the lanes live
    r = np.asarray(bp["res_r"])[:, 0]
    np.testing.assert_allclose(np.asarray(t63),
                               r * 1e-9 * (-np.log(1 - 0.632)), rtol=8e-2)


def test_checkpoint_resume_with_tline_state(tmp_path):
    # the delay-ring state 'tlw' must survive the checkpoint round-trip
    import jax.numpy as jnp
    from circuitsimulator_tpu.parallel.checkpoint import (
        save_carry, load_carry)
    sim = Simulator.from_text("""* tline ckpt
V1 in 0 PULSE(0 1 0 1n 1n 1 2)
Rs in a 50
T1 a 0 b 0 Z0=50 TD=2n
Rl b 0 200
.TRAN 2e-10 4e-8
""")
    tstep, tstop = sim.config.tran.tstep, sim.config.tran.tstop
    ref = sim.transient()
    r = ChunkedTransient(sim.engine, sim.params, tstep, tstop,
                         ckpt_path=None, chunk_steps=37)
    carry_full, _ = r.run()
    assert "tlw" in carry_full[1]
    np.testing.assert_allclose(np.asarray(carry_full[0]),
                               np.asarray(ref.x_final), rtol=0, atol=1e-12)
    # save/load round-trip preserves every state key bit-for-bit
    ck = str(tmp_path / "tl.npz")
    save_carry(ck, jax.device_get(carry_full), 123)
    carry2, step = load_carry(ck)
    assert step == 123
    assert set(carry2[1]) == set(carry_full[1])
    for k in carry_full[1]:
        np.testing.assert_array_equal(np.asarray(carry2[1][k]),
                                      np.asarray(carry_full[1][k]))
