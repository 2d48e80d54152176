"""Correctness of the fused Pallas transient-chunk kernel (interpret
mode; perf status documented in ops/pallas_step.py)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import pytest

from circuitsimulator_tpu.api import Simulator
from circuitsimulator_tpu.utils.options import DEFAULT_OPTIONS
from circuitsimulator_tpu.analysis.transient import transient_step_fn
from circuitsimulator_tpu.parallel.montecarlo import perturb_params
from circuitsimulator_tpu.ops import pallas_step


def test_supported_predicate():
    sim = Simulator.from_file("tests/netlists/dbmixer.sp")
    assert pallas_step.supported(sim.engine)
    s2 = Simulator.from_text(   # PULSE waveform -> in scope
        "V1 1 0 PULSE(0 1 0 0 0 1 0)\nR1 1 0 1k\nD1 1 0\n.op\n")
    assert pallas_step.supported(s2.engine)
    s3 = Simulator.from_text(   # behavioral source -> in scope (vjp rows)
        "V1 1 0 1\nR1 1 2 1k\nB1 2 0 V=V(1)*V(1)\n.op\n")
    assert pallas_step.supported(s3.engine)
    s4 = Simulator.from_text(   # diode deck with SIN drive -> in scope
        "V1 1 0 SIN 0 2 1e6\nR1 1 2 100\nD1 2 0\n.op\n")
    assert pallas_step.supported(s4.engine)
    s5 = Simulator.from_text(   # linear transient -> in scope (k == 0)
        "V1 1 0 SIN 0 2 1e6\nR1 1 2 100\nC1 2 0 1n\n.op\n")
    assert pallas_step.supported(s5.engine)
    s6 = Simulator.from_text(   # PWL with <= 8 breakpoints -> in scope
        "V1 1 0 PWL(0 0 1u 1 2u 0)\nR1 1 2 1k\nD1 2 0\n.op\n")
    assert pallas_step.supported(s6.engine)
    s7 = Simulator.from_text(   # PWL with > 8 breakpoints -> general path
        "V1 1 0 PWL(0 0 1u 1 2u 0 3u 1 4u 0 5u 1 6u 0 7u 1 8u 0)\n"
        "R1 1 2 1k\nD1 2 0\n.op\n")
    assert not pallas_step.supported(s7.engine)


# rectifier with a forward diode and a zener in breakdown
DIODE_DECK = """* diode rectifier + zener
V1 in 0 SIN 0 4 5e6
R1 in a 100
D1 a out
C1 out 0 1n
R2 out 0 10k
RBD in bd 500
D2 0 bd BV=3 IBV=1e-3
.op
"""

# NPN common-emitter stage + PNP follower off the same rail (p = -1 path)
BJT_DECK = """* npn + pnp stages
.MODEL qn NPN IS=1e-15 BF=120 BR=2 VAF=50
.MODEL qp PNP IS=1e-15 BF=80 BR=1
VCC 1 0 5
Vin 2 0 SIN 0.65 0.01 1e6
RB 2 3 10k
RC 1 4 2k
Q1 4 3 0 qn
VB2 5 0 DC 4.3
RB2 5 6 10k
RC2 7 0 2k
Q2 7 6 1 qp
CL 4 0 1p
.op
"""

# all four nonlinear classes in one plan (mos, jfet, diode, bjt order)
MIXED_DECK = """* mixed nonlinear classes
.MODEL 2 VT 0.386 MU 3.0238e-2 COX 6.058e-3 LAMBDA 0.05 CJ0 4.0e-14
.MODEL j1 NJF VTO=-2 BETA=1e-3 LAMBDA=0.01
.MODEL qn NPN IS=1e-15 BF=120 BR=2
VDD 1 0 DC 3
Vin 2 0 SIN 0.8 0.2 5e6
M1 3 2 0 n 10e-6 0.35e-6 2
RL1 1 3 2k
J1 4 2 0 j1
RL2 1 4 2k
RB 2 7 20k
Q1 5 7 0 qn
RL3 1 5 2k
D1 6 0
RD 1 6 1k
C1 3 0 1p
.op
"""


def _run_both(opts, B=128, steps=10, dt=1e-13, text=None, from_dc=False,
              file=None):
    if text is not None:
        sim = Simulator.from_text(text, opts=opts)
    else:
        sim = Simulator.from_file(file or "tests/netlists/dbmixer.sp",
                                  opts=opts)
    engine = sim.engine
    bp = perturb_params(sim.params, jax.random.key(0), B,
                        {"res_r": 0.01, "mos_vth": 0.02})
    if from_dc:
        # exponential-device decks (diode/BJT) MUST start from the DC
        # operating point, as run_transient does: from x=0 with full rails
        # the damped Newton hits the 50-iteration cap on some lanes, and a
        # non-converged iterate of a junction at ~9e4 S is chaotic — any
        # f32 ULP difference between two algebraically identical
        # implementations amplifies to O(volts) (verified: every per-piece
        # comparison of the kernel vs the XLA path is bitwise at x0=0).
        from circuitsimulator_tpu.analysis.dc import dc_operating_point
        ns = sim._nodeset()
        x0 = jax.vmap(lambda p: dc_operating_point(engine, p, nodeset=ns))(bp)
        x0 = x0.astype(jnp.float32)
    else:
        x0 = jnp.zeros((B, engine.N), jnp.float32)
    if engine.mos_charge:
        state0 = jax.vmap(lambda xx, p: engine.init_state(xx, p))(x0, bp)
    else:
        state0 = jax.vmap(engine.init_state)(x0)
    predictor = opts.tran_predictor

    def lane(p, carry, ts):
        st = transient_step_fn(engine, p, jnp.asarray(dt, jnp.float32),
                               predictor=predictor)

        def body(c, t):
            c, (_, it) = st(c, t)
            return c, it

        return lax.scan(body, carry, ts)

    ts = jnp.arange(1, steps + 1, dtype=jnp.float32) * dt
    failed0 = jnp.zeros((B,), bool)
    carry0 = ((x0, x0, state0, failed0) if predictor
              else (x0, state0, failed0))
    carry, _ = jax.vmap(lane, in_axes=(0, 0, None))(bp, carry0, ts)
    cx, cstate, cfail = carry[0], carry[-2], carry[-1]

    runner = pallas_step.PallasStepRunner(engine, bp, dt)
    xo, xpo, vco, ilo, fo, iters = runner.run_chunk(
        x0, x0, state0["vc"], state0["il"], failed0, 0, steps,
        interpret=True)
    return (cx, cstate, cfail), (xo, vco, ilo, fo, iters)


def test_fused_step_matches_xla_parity_config():
    """Damped while-loop config (per-lane freeze semantics)."""
    opts = DEFAULT_OPTIONS.replace(dtype=jnp.float32, tran_solver="woodbury",
                                   tran_tol=1e-5, dc_tol=1e-5)
    (cx, cstate, cfail), (xo, vco, ilo, fo, iters) = _run_both(opts)
    assert int(np.asarray(iters).sum()) > 0
    np.testing.assert_allclose(np.asarray(xo), np.asarray(cx), atol=5e-6)
    np.testing.assert_allclose(np.asarray(vco), np.asarray(cstate["vc"]),
                               atol=5e-6)
    np.testing.assert_allclose(np.asarray(ilo), np.asarray(cstate["il"]),
                               atol=5e-6)
    np.testing.assert_array_equal(np.asarray(fo), np.asarray(cfail))


def test_fused_step_matches_xla_fast_config():
    """bench.py fast-Newton config: predictor + 2 unrolled iterations."""
    opts = DEFAULT_OPTIONS.replace(dtype=jnp.float32, tran_solver="woodbury",
                                   tran_tol=1e-5, dc_tol=1e-5,
                                   tran_alpha=1.0, tran_predictor=True,
                                   tran_unrolled_iters=2,
                                   tran_max_newton_iters=6)
    (cx, cstate, cfail), (xo, vco, ilo, fo, iters) = _run_both(opts)
    assert int(np.asarray(iters).sum()) == 10 * (128 // 128) * 2
    np.testing.assert_allclose(np.asarray(xo), np.asarray(cx), atol=5e-6)
    np.testing.assert_allclose(np.asarray(vco), np.asarray(cstate["vc"]),
                               atol=5e-6)
    np.testing.assert_allclose(np.asarray(ilo), np.asarray(cstate["il"]),
                               atol=5e-6)
    np.testing.assert_array_equal(np.asarray(fo), np.asarray(cfail))


def _parity_opts():
    return DEFAULT_OPTIONS.replace(dtype=jnp.float32, tran_solver="woodbury",
                                   tran_tol=1e-5, dc_tol=1e-5)


def _check(pair, atol=5e-6):
    # Exponential-device decks (diode/BJT) carry junction conductances of
    # ~1e3 S, so ULP-order differences between the kernel's unrolled
    # pivoted elimination and the XLA path's LU amplify to a few 1e-5 in
    # the damped-Newton trajectory; the MOS decks above match at 5e-6.
    (cx, cstate, cfail), (xo, vco, ilo, fo, iters) = pair
    np.testing.assert_allclose(np.asarray(xo), np.asarray(cx), atol=atol)
    np.testing.assert_allclose(np.asarray(vco), np.asarray(cstate["vc"]),
                               atol=atol)
    np.testing.assert_allclose(np.asarray(ilo), np.asarray(cstate["il"]),
                               atol=atol)
    np.testing.assert_array_equal(np.asarray(fo), np.asarray(cfail))


def test_fused_step_diode_deck():
    """Shockley + reverse-breakdown rows (plan has nMJ == 0)."""
    _check(_run_both(_parity_opts(), steps=6, dt=1e-9, text=DIODE_DECK,
                     from_dc=True))


def test_fused_step_bjt_deck():
    """Ebers-Moll rank-2 rows, NPN + PNP, Early voltage on."""
    _check(_run_both(_parity_opts(), steps=6, dt=1e-9, text=BJT_DECK,
                     from_dc=True), atol=1e-4)


def test_fused_step_mixed_deck():
    """All four nonlinear segments in one Woodbury plan."""
    _check(_run_both(_parity_opts(), steps=6, dt=1e-9, text=MIXED_DECK,
                     from_dc=True), atol=1e-4)


# every waveform kind in one deck (V-PULSE, V-PWL, V-EXP, I-SFFM,
# I-PULSE), MOS load so the plan is nonlinear
WAVEFORM_DECK = """* all source kinds
.MODEL 2 VT 0.386 MU 3.0238e-2 COX 6.058e-3 LAMBDA 0.05 CJ0 4.0e-14
VDD 1 0 DC 3
Vp 2 0 PULSE(0 1.5 10n 5n 5n 40n 100n)
Vw 3 0 PWL(0 0 20n 1 50n 0.4 80n 1.2)
Ve 4 0 EXP(0 2 5n 10n 60n 15n)
Rp 2 5 1k
Rw 3 5 2k
Re 4 5 2k
Is 0 5 SFFM(1m 0.5m 2e7 2 3e6)
Ip 0 6 PULSE(0 1m 0 0 0 50n 120n)
R6 6 0 1k
M1 7 5 0 n 10e-6 0.35e-6 2
RL 1 7 2k
C1 7 0 1p
.op
"""


# fully linear deck (k == 0): RLC filter + RC divider, mixed waveforms
LINEAR_DECK = """* linear RLC filter
V1 in 0 SIN 0 1 2e6
I1 0 mid PULSE(0 1m 0 0 0 100n 250n)
R1 in a 1k
L1 a mid 10u
C1 mid 0 100p
R2 mid out 2k
C2 out 0 50p
RL out 0 10k
.op
"""


def test_fused_step_linear_deck():
    """k == 0 decks run in-kernel as the exact solve x = G0inv @ b(t);
    trajectory matches the XLA Woodbury path (which returns z0 at k=0)."""
    _check(_run_both(_parity_opts(), steps=12, dt=2e-9, text=LINEAR_DECK),
           atol=1e-5)


def test_fused_step_all_waveform_kinds():
    """PULSE/PWL/EXP/SFFM V and I sources evaluate in-kernel, matching
    the XLA path's eval_tran_static_kinds trajectories."""
    _check(_run_both(_parity_opts(), steps=12, dt=2e-9, text=WAVEFORM_DECK,
                     from_dc=True), atol=1e-4)


# SIN-driven rectifier with .MEASURE cards — in the fused kernel's scope
MEASURE_DECK = """* fused streaming measures
V1 in 0 SIN 0 3 1e6
R1 in a 100
D1 a out
C1 out 0 10n
R2 out 0 10k
.TRAN 2n 3u
.MEASURE TRAN vmax MAX V(out)
.MEASURE TRAN vavg AVG V(out) FROM=1u TO=3u
.MEASURE TRAN t1 WHEN V(out)=1.0 RISE=1
.MEASURE TRAN irms RMS V(in) FROM=0 TO=3u
"""


def test_fused_streaming_measures_matches_xla():
    """The fused kernel's in-kernel probe output must drive the streaming
    .MEASURE accumulators to the same per-lane values as the vmapped XLA
    loop (parallel/montecarlo.fused_transient_measures)."""
    from circuitsimulator_tpu.parallel.montecarlo import (
        batched_transient_measures)
    opts = DEFAULT_OPTIONS.replace(dtype=jnp.float32, tran_solver="woodbury",
                                   tran_tol=1e-5, dc_tol=1e-5)
    sim = Simulator.from_text(MEASURE_DECK, opts=opts)
    assert pallas_step.supported(sim.engine)
    B = 128
    bp = perturb_params(sim.params, jax.random.key(3), B, {"res_r": 0.05})
    tstep, tstop = sim.config.tran.tstep, sim.config.tran.tstop
    res_x, vals_x = batched_transient_measures(
        sim.engine, bp, tstep, tstop, sim.config.measures, sim.topo,
        fused=False)
    res_f, vals_f = batched_transient_measures(
        sim.engine, bp, tstep, tstop, sim.config.measures, sim.topo,
        fused=True)
    assert res_f.xs is None
    np.testing.assert_array_equal(np.asarray(res_f.failed),
                                  np.asarray(res_x.failed))
    for name in vals_x:
        a = np.asarray(vals_x[name])
        b = np.asarray(vals_f[name])
        assert a.shape == b.shape == (B,)
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-6,
                                   err_msg=name)


# smooth-transition switch (width-4 V^T row) + MOS + diode in one plan
SWITCH_DECK = """* switch chopper + mixed classes
.MODEL swm SW RON=10 ROFF=1e8 VT=0.5 VH=0.1
.MODEL mn VT 0.6 MU 2e-2 COX 1e-3
VCTL c 0 PULSE 0 1 0 1u 1u 8u 20u
VIN in 0 SIN 0 2 5e4
S1 in mid c 0 swm
RL mid 0 1k
C1 mid 0 100n
M1 mid g 0 b mn W=5u L=1u
VG g 0 0.8
D1 mid 0
.op
"""


def test_supported_includes_switches():
    sim = Simulator.from_text(SWITCH_DECK)
    assert pallas_step.supported(sim.engine)
    # width-4 plan
    from circuitsimulator_tpu.ops.woodbury import WoodburyPlan
    plan = WoodburyPlan(sim.engine)
    assert plan.W == 4 and plan.nS == 1


def test_fused_step_switch_deck():
    """Width-4 V^T rows: switch + MOS + diode in one Woodbury plan."""
    _check(_run_both(_parity_opts(), steps=12, dt=1e-7, text=SWITCH_DECK,
                     from_dc=True), atol=1e-4)


def test_woodbury_switch_matches_lu():
    """XLA Woodbury path with a switch == per-iteration LU (f64)."""
    import dataclasses
    res = {}
    for solver in ("lu", "woodbury"):
        opts = dataclasses.replace(DEFAULT_OPTIONS, dtype=jnp.float64,
                                   tran_solver=solver)
        sim = Simulator.from_text(SWITCH_DECK.replace(".op", ".TRAN 1u 100u"),
                                  opts=opts)
        res[solver] = np.asarray(sim.transient().xs)
    np.testing.assert_allclose(res["woodbury"], res["lu"], atol=1e-12)


def test_adaptive_switch_woodbury_matches_lu():
    """Adaptive-LTE integrator with a switch on the W=4 Woodbury plan."""
    import dataclasses
    net = SWITCH_DECK.replace(".op", ".TRAN 1u 100u").replace(
        "M1 mid g 0 b mn W=5u L=1u\nVG g 0 0.8\n", "")
    res = {}
    for solver in ("lu", "woodbury"):
        opts = dataclasses.replace(DEFAULT_OPTIONS, dtype=jnp.float64,
                                   tran_solver=solver)
        sim = Simulator.from_text(net, opts=opts)
        res[solver] = np.asarray(sim.transient(adaptive=True).xs)
    np.testing.assert_allclose(res["woodbury"], res["lu"], atol=1e-12)


# behavioral sources: compiled expressions trace INTO the kernel
B_DECK = """* behavioral multiplier + limiter + diode
.PARAM gain=1m
V1 a 0 SIN 0 1 1e4
V2 b 0 SIN 0 1 1.3e4
R1 a 0 1k
R2 b 0 1k
B1 p 0 I=v(a)*v(b)*gain
RP p 0 1k
B2 q 0 V=tanh(v(p)*2)+0.1*sin(6.28e4*time)
RQ q 0 2k
C1 q 0 10n
D1 q 0 IS=1e-14
.op
"""


def test_supported_includes_bsources(monkeypatch):
    sim = Simulator.from_text(B_DECK)
    assert pallas_step.supported(sim.engine)
    monkeypatch.setenv("CSIM_FUSED_B", "0")     # safety hatch
    assert not pallas_step.supported(sim.engine)


def test_fused_step_bsource_deck():
    """B-source vjp rows in-kernel (I-form, V-form with a time term)."""
    _check(_run_both(_parity_opts(), steps=10, dt=1e-6, text=B_DECK,
                     from_dc=True), atol=1e-4)


# transmission line: the Branin delay ring rides the VMEM chunk carry
TL_DECK = """* T-line reflections + diode clamp at the far end
V1 in 0 PULSE(0 1 1n 0.2n 0.2n 6n 0)
RS in a 50
T1 a 0 b 0 Z0=50 TD=2n
RL b 0 200
D1 b 0
.op
"""


def test_supported_tline_dt_dependent():
    sim = Simulator.from_text(TL_DECK)
    assert not pallas_step.supported(sim.engine)          # no dt: general
    assert pallas_step.supported(sim.engine, 0.25e-9)     # ticks = 8
    assert not pallas_step.supported(sim.engine, 1e-12)   # ring too long


def test_fused_step_tline_deck():
    """Delay-ring carry: fused chunk vs XLA scan on a mismatched line."""
    opts = _parity_opts()
    sim = Simulator.from_text(TL_DECK, opts=opts)
    engine = sim.engine
    dt = 0.25e-9
    B, steps = 128, 40
    bp = perturb_params(sim.params, jax.random.key(0), B, {"res_r": 0.02})
    from circuitsimulator_tpu.analysis.dc import dc_operating_point
    x0 = jax.vmap(lambda p: dc_operating_point(engine, p))(bp)
    x0 = x0.astype(jnp.float32)
    state0 = jax.vmap(lambda p, xr: engine.init_state(xr, params=p, dt=dt),
                      in_axes=(0, 0))(bp, x0)
    predictor = opts.tran_predictor

    def lane_fn(p, carry, ts):
        st = transient_step_fn(engine, p, jnp.asarray(dt, jnp.float32),
                               predictor=predictor)

        def body(c, t):
            c, (_, it) = st(c, t)
            return c, it

        return lax.scan(body, carry, ts)

    ts = jnp.arange(1, steps + 1, dtype=jnp.float32) * dt
    failed0 = jnp.zeros((B,), bool)
    carry0 = ((x0, x0, state0, failed0) if predictor
              else (x0, state0, failed0))
    carry, _ = jax.vmap(lane_fn, in_axes=(0, 0, None))(bp, carry0, ts)
    cx = np.asarray(carry[0])
    cring = np.asarray(carry[-2]["tlw"])

    runner = pallas_step.PallasStepRunner(engine, bp, dt)
    out = runner.run_chunk(x0, x0, state0["vc"], state0["il"], failed0,
                           0, steps, interpret=True, tlw=state0["tlw"])
    np.testing.assert_allclose(np.asarray(out[0]), cx, atol=5e-6)
    np.testing.assert_allclose(np.asarray(out[-1]),
                               cring[:, :runner.Dmax], atol=5e-6)


def test_fused_batched_transient_tline_dispatch():
    """batched_transient auto path threads the ring through chunks."""
    from circuitsimulator_tpu.parallel.montecarlo import batched_transient
    opts = _parity_opts()
    sim = Simulator.from_text(TL_DECK.replace(".op", ".TRAN 0.25n 20n"),
                              opts=opts)
    bp = perturb_params(sim.params, jax.random.key(1), 128,
                        {"res_r": 0.02})
    res = batched_transient(sim.engine, bp, 0.25e-9, 20e-9, fused=True)
    assert not bool(np.asarray(res.failed).any())
    # XLA reference (same trajectory family)
    res_x = batched_transient(sim.engine, bp, 0.25e-9, 20e-9, fused=False)
    np.testing.assert_allclose(np.asarray(res.x_final),
                               np.asarray(res_x.x_final), atol=5e-5)


def test_supported_widened_gate():
    """Round-4 gate: hard N<=64/k<=16 replaced by MAX_K + a VMEM-budget
    estimate, so real analog cells (rank > 16) ride the fused path."""
    # 22-MOS three-op-amp instrumentation amp: rank 22, IN scope
    sim = Simulator.from_file("tests/netlists/inamp.sp")
    assert pallas_step.supported(sim.engine)
    # synthetic rank-33 deck exceeds the static-unroll cap MAX_K=32
    lines = ["V1 1 0 SIN 0 2 1e6"]
    for i in range(33):
        lines += [f"R{i} 1 d{i} 1k", f"D{i} d{i} 0"]
    s2 = Simulator.from_text("\n".join(lines) + "\n.op\n")
    assert not pallas_step.supported(s2.engine)
    # the VMEM estimate keeps the old envelope in scope and bounds growth
    assert pallas_step._vmem_estimate(64, 16, 3) <= pallas_step.VMEM_BUDGET
    assert pallas_step._vmem_estimate(96, 32, 3) <= pallas_step.VMEM_BUDGET
    assert pallas_step._vmem_estimate(128, 32, 3) > pallas_step.VMEM_BUDGET


def test_fused_step_inamp_deck():
    """Rank-22 analog cell (3-op-amp in-amp, 22 MOS, N=28) — beyond the
    old k<=16 gate.  High loop gain (two-stage Miller OTAs) amplifies
    ULP-order differences between the kernel's unrolled elimination and
    the XLA path's LU, so the tolerance matches the exp-device decks."""
    _check(_run_both(_parity_opts(), steps=10, dt=1e-9,
                     file="tests/netlists/inamp.sp", from_dc=True),
           atol=1e-4)


# 2-MOS inverter stage under the charge-conserving cap model:
# rank = 2 conduction + 10 charge rows = 12 (unrolled-solve branch)
CHARGE_DECK = """* charge-model CMOS stage
.OPTIONS MOSCAP=CHARGE
.MODEL 1 VT -0.75 MU 5e-2 COX 0.3e-4 LAMBDA 0.05 CJ0 4.0e-14
.MODEL 2 VT 0.83 MU 1.5e-1 COX 0.3e-4 LAMBDA 0.05 CJ0 4.0e-14
VDD 1 0 3
Vin 2 0 SIN 1.5 0.5 5e6
M1 3 2 1 p 30e-6 0.35e-6 1
M2 3 2 0 n 10e-6 0.35e-6 2
C1 3 0 0.5p
RL 3 0 10k
.op
"""


def test_supported_charge_decks():
    """MOSCAP=CHARGE is fused-eligible when k + 5*nM fits the gate
    (round 4 — the round-3 guard excluded charge decks outright)."""
    s1 = Simulator.from_text(CHARGE_DECK)
    assert s1.engine.mos_charge
    assert pallas_step.supported(s1.engine)          # k = 12
    opts = DEFAULT_OPTIONS.replace(mos_cap_model="charge")
    s2 = Simulator.from_file("tests/netlists/dbmixer.sp", opts=opts)
    assert not pallas_step.supported(s2.engine)      # k = 36 > MAX_K
    s3 = Simulator.from_file("tests/netlists/buffer.sp", opts=opts)
    assert pallas_step.supported(s3.engine)          # k = 24


def test_fused_step_charge_deck_unrolled():
    """Charge rows in the UNROLLED solve branch (k = 12 <= 16).  The
    Ward-Dutton/depletion charges and their jvp Jacobians evaluate
    in-kernel; q_prev is recomputed from the incoming x each step.
    inv_dt = 1e9 amplifies ULP differences in the charge evaluation, so
    the bar matches the exp-device decks."""
    opts = _parity_opts().replace(mos_cap_model="charge")
    _check(_run_both(opts, steps=8, dt=1e-9, text=CHARGE_DECK,
                     from_dc=True), atol=1e-4)


def test_fused_step_charge_deck_gj():
    """Charge rows in the GAUSS-JORDAN branch (buffer.sp: k = 24)."""
    opts = _parity_opts().replace(mos_cap_model="charge")
    _check(_run_both(opts, steps=8, dt=1e-9,
                     file="tests/netlists/buffer.sp", from_dc=True),
           atol=1e-4)
