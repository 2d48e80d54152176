"""TRNOISE transient noise (extension): white Gaussian noise on V/I
sources, drawn per solver step inside the scan via counter-keyed
fold_in (O(1) memory, reproducible, per-lane independent under vmap)."""

import numpy as np
import pytest
import jax

from circuitsimulator_tpu import Simulator
from circuitsimulator_tpu.netlist.parser import parse_netlist_text


NA = 10e-3

DECK = f"""* noisy source
V1 in 0 DC 1 TRNOISE({NA} 0)
R1 in out 1k
R2 out 0 1k
.TRAN 1e-6 2e-3
.end
"""


def _veq(sim, name):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index


def test_parse_trnoise():
    ckt, _ = parse_netlist_text(DECK)
    e = next(e for e in ckt.elements if e.name == "V1")
    assert e.spec.tn_na == pytest.approx(NA)
    assert e.spec.tn_nt == 0.0
    assert e.spec.dc == 1.0
    ckt2, _ = parse_netlist_text(
        "I1 0 a 1m TRNOISE(2u 5n)\nR1 a 0 1k\n.op\n")
    e2 = ckt2.elements[0]
    assert e2.spec.tn_na == pytest.approx(2e-6)
    assert e2.spec.tn_nt == pytest.approx(5e-9)


def test_sin_stops_at_trnoise_keyword():
    """'SIN v0 va freq [td [phi]]' must stop consuming optional args at a
    trailing TRNOISE(...) (regression: 'SIN 1 0.6 9e8 0 TRNOISE(1m 0)'
    used to abort the whole waveform trying to read 'TRNOISE(1m' as the
    phase)."""
    ckt, _ = parse_netlist_text(
        "V1 a 0 SIN 1 0.6 900e6 0 TRNOISE(1m 0)\nR1 a 0 1k\n.tran 1n 4n\n")
    e = ckt.elements[0]
    assert e.spec.wave.kind != 0
    assert e.spec.wave.va == pytest.approx(0.6)
    assert e.spec.wave.freq == pytest.approx(9e8)
    assert e.spec.tn_na == pytest.approx(1e-3)


def test_native_parity_trnoise():
    from circuitsimulator_tpu import native
    if not native.available():
        pytest.skip("native frontend not built")
    import dataclasses
    for deck in (DECK, "I1 0 a 1m TRNOISE(2u 5n)\nR1 a 0 1k\n.op\n",
                 "V1 a 0 TRNOISE(1m)\nR1 a 0 1k\n.op\n",
                 "V1 a 0 SIN 1 0.6 9e8 0 TRNOISE(1m 0)\nR1 a 0 1k\n.op\n",
                 "V1 a 0 SIN 0 1 1e6 TRNOISE(2m 1n 1 3m)\nR1 a 0 1k\n.op\n",
                 "V1 a 0 SIN 0 1 1e6 0 30 TRNOISE(1u)\nR1 a 0 1k\n.op\n"):
        ckt_py, _ = parse_netlist_text(deck)
        ckt_nat, _ = native.parse_netlist_text_native(deck)
        ckt_py.assign_equation_indices()
        ckt_nat.assign_equation_indices()
        for a, b in zip(ckt_nat.elements, ckt_py.elements):
            assert dataclasses.asdict(a) == dataclasses.asdict(b), deck


def test_noise_statistics_and_reproducibility():
    # resistive divider: V(in) = 1 + noise each step, so the waveform's
    # per-step std equals the source RMS na
    sim = Simulator.from_text(DECK)
    assert sim.engine.has_trnoise
    res = sim.transient()
    v = np.asarray(res.xs)[1:, _veq(sim, "in")]
    assert abs(v.mean() - 1.0) < 2e-3
    assert NA * 0.9 < v.std() < NA * 1.1          # 2000 samples
    # distinct consecutive values (nt=0 -> redraw every step)
    assert np.count_nonzero(np.diff(v) == 0) < 5
    # same seed reproduces bit-for-bit; another seed differs
    res2 = sim.transient()
    np.testing.assert_array_equal(np.asarray(res.xs), np.asarray(res2.xs))
    res3 = sim.transient(noise_seed=1)
    assert np.abs(np.asarray(res3.xs) - np.asarray(res.xs)).max() > 1e-4
    # noise_seed=None disables the noise entirely
    quiet = sim.transient(noise_seed=None)
    vq = np.asarray(quiet.xs)[1:, _veq(sim, "in")]
    assert np.abs(vq - 1.0).max() < 1e-9


def test_sample_hold_interval():
    # nt = 4*dt: the noise value holds for 4 consecutive steps
    sim = Simulator.from_text("""* held noise
V1 in 0 DC 0 TRNOISE(1m 4e-6)
R1 in 0 1k
.TRAN 1e-6 4e-4
.end
""")
    res = sim.transient()
    v = np.asarray(res.xs)[1:, _veq(sim, "in")]
    # within a hold window the solution still creeps at tol level (the
    # replicated step-size convergence quirk leaves ~1e-7 of the previous
    # step in each iterate), so detect redraws by LARGE jumps only
    changes = np.flatnonzero(np.abs(np.diff(v)) > 1e-4)
    assert len(changes) > 50
    gaps = np.diff(changes)
    assert np.all(gaps % 4 == 0)                  # only on hold boundaries
    assert np.median(gaps) == 4


def test_rc_filters_noise():
    # exact discrete-time physics: the BE-discretized RC driven by white
    # noise is the AR(1) process y_k = b·y_{k-1} + (1−b)·u_k with
    # b = 1/(1+dt/RC), so std_out = na·(1−b)/sqrt(1−b²)
    import math
    dt, R, C, na = 1e-6, 10e3, 10e-9, 10e-3
    sim = Simulator.from_text(f"""* rc filtered noise
V1 in 0 DC 0 TRNOISE({na} 0)
R1 in out {R}
C1 out 0 {C}
.TRAN {dt} 20e-3
.end
""")
    res = sim.transient()
    vi = np.asarray(res.xs)[1:, _veq(sim, "in")]
    vo = np.asarray(res.xs)[1:, _veq(sim, "out")]
    assert na * 0.95 < vi.std() < na * 1.05       # 20k samples
    b = 1.0 / (1.0 + dt / (R * C))
    pred = na * (1.0 - b) / math.sqrt(1.0 - b * b)
    # AR(1) std estimator converges slowly (correlated samples): 15%
    assert vo.std() == pytest.approx(pred, rel=0.15)


def test_batched_lanes_independent():
    from circuitsimulator_tpu.parallel.montecarlo import (
        broadcast_params, batched_transient)
    sim = Simulator.from_text(DECK)
    bp = broadcast_params(sim.params, 4)
    res = batched_transient(sim.engine, bp, 1e-6, 2e-4, save_xs=True,
                            noise_key=jax.random.key(0))
    xs = np.asarray(res.xs)                       # (4, T, N)
    e = _veq(sim, "in")
    for i in range(4):
        for j in range(i + 1, 4):
            assert np.abs(xs[i, 1:, e] - xs[j, 1:, e]).max() > 1e-4
    # without a key the batch is noise-free and identical across lanes
    res2 = batched_transient(sim.engine, bp, 1e-6, 2e-4, save_xs=True)
    xs2 = np.asarray(res2.xs)
    assert np.abs(xs2[0] - xs2[1]).max() < 1e-12


def test_parse_flicker_args():
    ckt, _ = parse_netlist_text(
        "V1 a 0 DC 0 TRNOISE(1m 0 1.5 2m)\nR1 a 0 1k\n.op\n")
    e = ckt.elements[0]
    assert e.spec.tn_alpha == pytest.approx(1.5)
    assert e.spec.tn_namp == pytest.approx(2e-3)
    # defaults: alpha=1, namp=0 (white only)
    ckt2, _ = parse_netlist_text("V1 a 0 DC 0 TRNOISE(1m)\nR1 a 0 1k\n.op\n")
    assert ckt2.elements[0].spec.tn_alpha == 1.0
    assert ckt2.elements[0].spec.tn_namp == 0.0


def test_native_parity_flicker():
    from circuitsimulator_tpu import native
    if not native.available():
        pytest.skip("native frontend not built")
    import dataclasses
    deck = "V1 a 0 DC 0 TRNOISE(1m 2n 1.5 2m)\nI1 0 a TRNOISE(0 0 0.8 1u)\nR1 a 0 1k\n.op\n"
    ckt_py, _ = parse_netlist_text(deck)
    ckt_nat, _ = native.parse_netlist_text_native(deck)
    ckt_py.assign_equation_indices()
    ckt_nat.assign_equation_indices()
    for a, b in zip(ckt_nat.elements, ckt_py.elements):
        assert dataclasses.asdict(a) == dataclasses.asdict(b)


def _psd_slope(v, dt, f_lo, f_hi, nseg=2048):
    segs = v[:(len(v) // nseg) * nseg].reshape(-1, nseg)
    w = np.hanning(nseg)
    P = np.mean([np.abs(np.fft.rfft(s * w)) ** 2 for s in segs], axis=0)
    f = np.fft.rfftfreq(nseg, dt)
    m = (f > f_lo) & (f < f_hi)
    return np.polyfit(np.log10(f[m]), np.log10(P[m]), 1)[0]


@pytest.mark.parametrize("alpha", [0.5, 1.0, 1.8])
def test_flicker_psd_slope(alpha):
    # the octave-spaced AR(1) bank must reproduce the requested 1/f^alpha
    # spectral slope across the mid-band
    namp = 5e-3
    sim = Simulator.from_text(f"""* flicker
V1 in 0 DC 0 TRNOISE(0 0 {alpha} {namp})
R1 in 0 1k
.TRAN 1e-6 32768e-6
.end
""")
    assert sim.engine.vs_flicker
    res = sim.transient()
    v = np.asarray(res.xs)[1:, _veq(sim, "in")]
    slope = _psd_slope(v, 1e-6, 1e3, 1e5)
    assert slope == pytest.approx(-alpha, abs=0.25)
    # the bank is normalized to total RMS namp (long-run sample std
    # underestimates for steep alpha: power hides below the window)
    assert 0.5 * namp < v.std() < 1.3 * namp


def test_flicker_composes_with_white():
    # white + flicker: total variance adds
    sim = Simulator.from_text("""* both
V1 in 0 DC 0 TRNOISE(10m 0 1.0 10m)
R1 in 0 1k
.TRAN 1e-6 16e-3
.end
""")
    res = sim.transient()
    v = np.asarray(res.xs)[1:, _veq(sim, "in")]
    total = np.hypot(10e-3, 10e-3)
    assert 0.8 * total < v.std() < 1.2 * total


def test_noisy_checkpoint_resume_bitwise(tmp_path):
    # counter-keyed draws make the noise realization state-free: a
    # chunked run that checkpoints (serializing the PRNG key as raw key
    # data) and resumes matches the uninterrupted run BITWISE
    from circuitsimulator_tpu.parallel.checkpoint import (
        ChunkedTransient, load_carry)
    sim = Simulator.from_text("""* noisy ckpt
V1 in 0 DC 0 TRNOISE(5m 0 1.0 5m)
R1 in out 1k
C1 out 0 1u
.TRAN 1e-6 4e-4
.end
""")
    key = jax.random.key(3)
    ck = str(tmp_path / "run.npz")
    r1 = ChunkedTransient(sim.engine, sim.params, 1e-6, 4e-4,
                          ckpt_path=ck, chunk_steps=150, noise_key=key)
    carry_a, _ = r1.run()
    # single-shot reference agrees to float noise (different XLA
    # compilations; the NOISE VALUES are identical by construction)
    from circuitsimulator_tpu.analysis.transient import run_transient
    ref = run_transient(sim.engine, sim.params, 1e-6, 4e-4,
                        save_xs=False, noise_key=key)
    np.testing.assert_allclose(np.asarray(carry_a[0]),
                               np.asarray(ref.x_final),
                               rtol=0, atol=1e-12)
    # simulate a crash after the SECOND chunk: truncate to that
    # checkpoint and resume — must match the uninterrupted chunked run
    # BITWISE (counter-keyed draws are state-free)
    carry_b, step_done = load_carry(ck)
    assert step_done == 400
    assert "tn_key" in carry_b[1]                  # key survived the npz
    np.testing.assert_array_equal(np.asarray(carry_b[1]["tn_v"]),
                                  np.asarray(carry_a[1]["tn_v"]))
    r2 = ChunkedTransient(sim.engine, sim.params, 1e-6, 4e-4,
                          ckpt_path=None, chunk_steps=150, noise_key=key)
    mid = r2.initial_carry()
    # drive r2 manually to step 300, checkpoint, reload, finish
    import jax.numpy as jnp
    from circuitsimulator_tpu.parallel.checkpoint import save_carry
    dt = 1e-6
    ts1 = jnp.arange(1, 301, dtype=sim.engine.dtype) * dt
    mid, _ = r2._run_chunk(mid, ts1)
    p = str(tmp_path / "mid.npz")
    save_carry(p, jax.device_get(mid), 300)
    mid2, sd = load_carry(p)
    assert sd == 300
    ts2 = jnp.arange(301, 401, dtype=sim.engine.dtype) * dt
    fin_direct, _ = r2._run_chunk(mid, ts2)
    fin_resumed, _ = r2._run_chunk(mid2, ts2)
    np.testing.assert_array_equal(np.asarray(fin_direct[0]),
                                  np.asarray(fin_resumed[0]))


def test_noisy_ensemble_measures():
    # streaming .MEASURE over independent noise lanes: O(1) waveform
    # memory per lane, per-lane values spread by the noise
    from circuitsimulator_tpu.parallel.montecarlo import (
        broadcast_params, batched_transient_measures)
    from circuitsimulator_tpu.netlist.parser import parse_netlist_text
    sim = Simulator.from_text(f"""* ensemble
V1 in 0 DC 1 TRNOISE({NA} 4e-6)
R1 in out 1k
R2 out 0 1k
.TRAN 1e-6 2e-4
.MEASURE TRAN vend FIND V(in) AT=1.98e-4
.end
""")
    ms = [m for m in sim.config.measures if m.analysis == "tran"]
    bp = broadcast_params(sim.params, 32)
    _, vals = batched_transient_measures(
        sim.engine, bp, 1e-6, 2e-4, ms, sim.topo,
        noise_key=jax.random.key(5))
    v = np.asarray(vals["vend"])
    assert v.shape == (32,)
    assert abs(v.mean() - 1.0) < 5e-3
    assert NA * 0.5 < v.std() < NA * 1.6      # 32 single-sample draws
    # without a key: noise-free, all lanes identical
    _, vq = batched_transient_measures(sim.engine, bp, 1e-6, 2e-4, ms,
                                       sim.topo)
    vq = np.asarray(vq["vend"])
    assert np.abs(vq - vq[0]).max() < 1e-12


def test_fused_kernel_gate():
    # the kernel stays ELIGIBLE for TRNOISE decks (it reproduces the
    # noise-free behavior); the noise path itself never dispatches fused
    from circuitsimulator_tpu.ops import pallas_step
    sim = Simulator.from_text(DECK)
    assert pallas_step.supported(sim.engine, 1e-6)
    from circuitsimulator_tpu.parallel.montecarlo import (
        broadcast_params, batched_transient)
    bp = broadcast_params(sim.params, 128)
    with pytest.raises(AssertionError):
        # forcing fused WITH a noise key must refuse (noise needs the
        # scan carry; eligibility includes noise_key is None)
        batched_transient(sim.engine, bp, 1e-6, 2e-5, fused=True,
                          noise_key=jax.random.key(0))


def test_batched_params_single_key_broadcasts():
    # the review-fix contract: ONE key + pre-broadcast batched params
    # (the ChunkedTransient shape) must not crash, and broadcasts one
    # realization across lanes
    import jax.numpy as jnp
    from circuitsimulator_tpu.parallel.montecarlo import broadcast_params
    sim = Simulator.from_text(DECK)
    bp = broadcast_params(sim.params, 3)
    key = jax.random.key(9)
    x0 = jnp.zeros((3, sim.engine.N))
    st = sim.engine.init_state(x0, bp, 1e-6, noise_key=key)
    v = np.asarray(st["tn_v"])
    assert v.shape == (3, 1)
    np.testing.assert_array_equal(v[0], v[1])      # shared realization
    upd = sim.engine.make_update_state(jnp.asarray(1e-6), "be")
    st2 = upd(bp, x0, st)
    assert np.asarray(st2["tn_v"]).shape == (3, 1)
    assert np.abs(np.asarray(st2["tn_v"]) - v).max() > 0  # redrawn
