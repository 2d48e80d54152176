"""Charge-conserving MOS capacitance model (.OPTIONS MOSCAP=CHARGE).

The reference's MOS caps are fixed, bias-independent lumps
(Cgs=Cgd=Cj0/2, Csb=Cdb=Cj0, /root/reference/src/tanalisis.cpp:321-353)
— the default here, bitwise.  MOSCAP=CHARGE is the opt-in fidelity step:
Ward-Dutton terminal charges + SPICE depletion junction charges
(models/moscap.py), integrated as i = dq/dt so charge is conserved
exactly over any closed bias loop.
"""

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator
from circuitsimulator_tpu.models.moscap import (
    PB, FC, mos_gate_charges, depletion_charge)
from circuitsimulator_tpu.utils.options import SolverOptions


def node_eq(sim, name):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index


# ---------------------------------------------------------------------
# unit: gate-charge physics (Ward-Dutton partition)
# ---------------------------------------------------------------------

COX = 2e-12  # COX*W*L of the test device


def _q(vd, vg, vs, vth=0.7, p=1):
    import jax.numpy as jnp
    qd, qg, qs = mos_gate_charges(
        jnp.asarray([float(vd)]), jnp.asarray([float(vg)]),
        jnp.asarray([float(vs)]), jnp.asarray([0.7 if vth is None else vth]),
        jnp.asarray([COX]), jnp.asarray([float(p)]))
    return float(qd[0]), float(qg[0]), float(qs[0])


def test_gate_charges_sum_to_zero():
    rng = np.random.default_rng(0)
    for _ in range(50):
        vd, vg, vs = rng.uniform(-3, 3, 3)
        qd, qg, qs = _q(vd, vg, vs)
        assert qd + qg + qs == pytest.approx(0.0, abs=1e-22)


def test_cutoff_zero_saturation_value():
    assert _q(2.0, 0.5, 0.0) == (0.0, 0.0, 0.0)          # vgt < 0
    # saturation: q_G = (2/3)Cox*vgt, 40/60 D/S split of -q_G
    vgt = 1.3
    qd, qg, qs = _q(5.0, vgt + 0.7, 0.0)
    assert qg == pytest.approx(2.0 / 3.0 * COX * vgt, rel=1e-12)
    assert qd == pytest.approx(-(4.0 / 15.0) * COX * vgt, rel=1e-12)
    assert qs == pytest.approx(-(2.0 / 5.0) * COX * vgt, rel=1e-12)


def test_region_continuity():
    vgt = 1.0
    for d_edge in (0.0, vgt):  # deep-triode and sat boundaries
        lo = np.asarray(_q(d_edge - 1e-7, vgt + 0.7, 0.0))
        hi = np.asarray(_q(d_edge + 1e-7, vgt + 0.7, 0.0))
        np.testing.assert_allclose(lo, hi, atol=COX * 1e-6)
    # vgt = 0 boundary
    lo = np.asarray(_q(1.0, 0.7 - 1e-7, 0.0))
    hi = np.asarray(_q(1.0, 0.7 + 1e-7, 0.0))
    np.testing.assert_allclose(lo, hi, atol=COX * 1e-6)


def test_gate_capacitance_limits():
    # deep triode (vds=0): C_gg = dq_G/dvg = Cox exactly
    eps = 1e-6
    qg1 = _q(0.0, 2.0 + eps, 0.0)[1]
    qg0 = _q(0.0, 2.0, 0.0)[1]
    assert (qg1 - qg0) / eps == pytest.approx(COX, rel=1e-4)
    # saturation: C_gg = (2/3) Cox, C_dg... dq_D/dvg = -(4/15) Cox
    qd1, qgs1, _ = _q(5.0, 2.0 + eps, 0.0)
    qd0, qgs0, _ = _q(5.0, 2.0, 0.0)
    assert (qgs1 - qgs0) / eps == pytest.approx(2 / 3 * COX, rel=1e-4)
    assert (qd1 - qd0) / eps == pytest.approx(-(4 / 15) * COX, rel=1e-4)


def test_pmos_mirror():
    # PMOS = NMOS with every terminal voltage and charge negated
    for vd, vg, vs in [(0.3, 1.5, 0.0), (2.0, 1.8, 0.5), (-0.4, 1.1, 0.2)]:
        qn = np.asarray(_q(vd, vg, vs, p=1))
        qp = np.asarray(_q(-vd, -vg, -vs, p=-1))
        np.testing.assert_allclose(qp, -qn, atol=1e-24)


def test_source_drain_swap_symmetry():
    # the charge sheet is symmetric physics: swapping D and S (and their
    # voltages) swaps q_d and q_s, leaves q_g
    qd, qg, qs = _q(0.4, 2.0, 0.1)
    qd2, qg2, qs2 = _q(0.1, 2.0, 0.4)
    assert qg2 == pytest.approx(qg, rel=1e-12)
    assert qd2 == pytest.approx(qs, rel=1e-12)
    assert qs2 == pytest.approx(qd, rel=1e-12)


def test_depletion_charge_c1_continuous():
    import jax
    import jax.numpy as jnp
    cj0 = 1e-12
    cfun = jax.grad(lambda v: depletion_charge(v, cj0))
    # C(0) = CJ0
    assert float(cfun(jnp.asarray(0.0))) == pytest.approx(cj0, rel=1e-9)
    # C continuous across the FC*PB breakpoint
    vb = FC * PB
    assert float(cfun(jnp.asarray(vb - 1e-9))) == pytest.approx(
        float(cfun(jnp.asarray(vb + 1e-9))), rel=1e-5)
    # reverse bias shrinks C, forward (below breakpoint) grows it
    assert float(cfun(jnp.asarray(-2.0))) < cj0 < float(cfun(jnp.asarray(0.3)))


# ---------------------------------------------------------------------
# end-to-end: transient under MOSCAP=CHARGE
# ---------------------------------------------------------------------

AMP_DECK = """* common-source stage, gate driven through Rg
.MODEL mn VT 0.7 MU 350u COX 2.3m CJ0 20f
VDD vdd 0 DC 3
Vin in 0 SIN 1.2 0.8 1e6
Rg in g 10k
M1 d g 0 n 20e-6 1e-6 mn
Rd vdd d 5k
{opt}
.TRAN 2e-9 4e-6
"""


def _run(opt, **okw):
    opts = SolverOptions().replace(**okw) if okw else None
    sim = Simulator.from_text(AMP_DECK.replace("{opt}", opt), opts=opts)
    res = sim.transient()
    return sim, np.asarray(res.xs)


def test_charge_conservation_closed_bias_loop():
    """The gate node's only DC path is Rg, so the Rg current IS the gate
    charge current; over full periods of the drive (a closed bias loop)
    the net charge through Rg must telescope to q_g(end) - q_g(start),
    tiny vs the charge slung per cycle.  This is the property a Meyer-
    style capacitance model famously violates."""
    sim, xs = _run(".OPTIONS MOSCAP=CHARGE")
    g, i = node_eq(sim, "g"), node_eq(sim, "in")
    dt = 2e-9
    # current into the gate, minus the transient map's universal gmin
    # leak (tran_gmin on every node, CLAUDE.md) — the remainder is the
    # charge current dq_g/dt
    ig = (xs[:, i] - xs[:, g]) / 10e3 \
        - xs[:, g] * sim.opts.tran_gmin
    # steps 1..: BE charge delivered = sum i_k dt (x[0] is the DC op)
    per = int(round(1e-6 / dt))                 # steps per drive period
    # integrate over exactly 3 full periods starting after one period
    seg = ig[per + 1: 4 * per + 1]
    q_net = np.sum(seg) * dt
    q_gross = np.sum(np.abs(seg)) * dt
    assert q_gross > 1e-14                      # real charge moved
    assert abs(q_net) < 2e-3 * q_gross          # ... and came back


def test_woodbury_matches_lu():
    _, xs_wb = _run(".OPTIONS MOSCAP=CHARGE", tran_solver="woodbury")
    _, xs_lu = _run(".OPTIONS MOSCAP=CHARGE", tran_solver="lu")
    np.testing.assert_allclose(xs_wb, xs_lu, atol=5e-12)


def test_charge_model_close_to_fixed_small_swing():
    # same stage, both models: identical DC op (caps don't bias), and
    # the waveforms agree to the cap-current scale (different C models,
    # same conduction physics)
    _, xf = _run("")
    _, xc = _run(".OPTIONS MOSCAP=CHARGE")
    np.testing.assert_allclose(xf[0], xc[0], atol=1e-9)
    assert np.max(np.abs(xf - xc)) < 0.15       # same circuit, other caps
    assert np.max(np.abs(xf - xc)) > 1e-6       # but measurably different


def test_ac_runs_and_matches_fixed_at_low_freq():
    deck = AMP_DECK.replace("Vin in 0 SIN 1.2 0.8 1e6",
                            "Vin in 0 DC 1.2 AC 1") \
                   .replace(".TRAN 2e-9 4e-6", ".AC dec 2 1e3 1e9")
    sf = Simulator.from_text(deck.replace("{opt}", ""))
    sc = Simulator.from_text(deck.replace("{opt}", ".OPTIONS MOSCAP=CHARGE"))
    d = node_eq(sf, "d")
    hf = np.asarray(sf.ac().xs)[:, d]
    hc = np.asarray(sc.ac().xs)[:, d]
    # at 1 kHz the caps only contribute the (tiny) imaginary part:
    # identical gain MAGNITUDE
    assert abs(abs(hf[0]) - abs(hc[0])) < 1e-9 * abs(hf[0])
    # near the pole the models measurably differ
    assert np.max(np.abs(hf - hc)) > 1e-3 * np.max(np.abs(hf))


HB_DECK = """* common-source stage at a carrier where the caps matter
.MODEL mn VT 0.7 MU 350u COX 2.3m CJ0 60f
VDD vdd 0 DC 3
Vin in 0 SIN 1.2 0.8 5e7
Rg in g 100
M1 d g 0 n 20e-6 1e-6 mn
Rd vdd d 5k
{opt}
.TRAN 1e-10 8e-7
"""


def test_hb_charge_matches_long_transient():
    """Single-tone HB under MOSCAP=CHARGE (reactive term = spectral
    charge derivative D·q(x)) must converge and reproduce the charge-
    model transient's own periodic steady state — and measurably differ
    from the fixed-lump HB (the caps are active at this carrier).

    The gate drives through 100 ohms: the transient's universal
    tran_gmin (1e-6 S on every node) must stay invisible — through a
    10k gate resistor it biases the comparison by 3.6% regardless of
    cap model."""
    sim = Simulator.from_text(
        HB_DECK.replace("{opt}", ".OPTIONS MOSCAP=CHARGE"))
    H = 5
    res = sim.harmonic_balance(f0=5e7, n_harm=H)
    assert bool(res.converged), float(res.residual)
    xs = np.asarray(sim.transient().xs)
    per = int(round((1.0 / 5e7) / 1e-10))          # 200 steps/period
    c = np.fft.rfft(xs[-per:, :], axis=0) / per
    c1 = 2.0 * c[1]
    eq = node_eq(sim, "d")
    hb1 = np.asarray(res.spectrum[1])[eq]
    # BE at 200 steps/period vs spectral HB: magnitudes to 2%
    assert abs(abs(hb1) - abs(c1[eq])) < 0.02 * abs(hb1) + 1e-7
    assert np.asarray(res.spectrum[0])[eq] == pytest.approx(
        c[0][eq].real, rel=0.02)
    # the fixed-lump HB is measurably different here (charges active)
    sim_f = Simulator.from_text(HB_DECK.replace("{opt}", ""))
    res_f = sim_f.harmonic_balance(f0=5e7, n_harm=H)
    hb1_f = np.asarray(res_f.spectrum[1])[eq]
    assert abs(abs(hb1_f) - abs(hb1)) > 5e-4 * abs(hb1)


MULTITONE_CHARGE_DECK = """* common-source stage, two tones summed at the gate
.MODEL mn VT 0.7 MU 350u COX 2.3m CJ0 60f
VDD vdd 0 DC 3
V1 a 0 SIN 1.2 0.5 1e7
V2 b 0 SIN 0 0.35 2.3e7
Ra a g 1k
Rb b g 1k
M1 d g 0 n 200e-6 5e-6 mn
Rd vdd d 5k
.OPTIONS MOSCAP=CHARGE
.TRAN 2e-10 1.2e-6
"""


def test_multitone_charge_vs_transient():
    """Two-tone MPDE under MOSCAP=CHARGE: the reactive term is the MPDE
    charge derivative T·q(x^) (hbmulti.make_hbmulti_system) — the HB^2
    solution evaluated on the physical diagonal x(t) = x^(t, t) must
    match the settled charge-model transient.  The device is sized so
    coxwl = 2.3 pF vs the 1k gate drive: the gate caps genuinely load
    the two-tone superposition at 10/23 MHz."""
    import jax.numpy as jnp
    from circuitsimulator_tpu.analysis.hbmulti import (
        harmonic_balance_multi, evaluate)
    sim = Simulator.from_text(MULTITONE_CHARGE_DECK)
    tr = sim.transient()
    ts = np.asarray(tr.times)
    xs = np.asarray(tr.xs)
    late = ts > 0.9e-6
    scale = np.abs(xs[late]).max()
    res = harmonic_balance_multi(sim.engine, sim.params,
                                 [(1e7, 6), (2.3e7, 6)], tol=1e-9)
    assert bool(res.converged), float(res.residual)
    xh = np.asarray(evaluate(res, jnp.asarray(ts[late])))
    assert np.abs(xh - xs[late]).max() / scale < 2e-2
    # and the charge model measurably moves the answer vs fixed lumps
    sim_f = Simulator.from_text(
        MULTITONE_CHARGE_DECK.replace(".OPTIONS MOSCAP=CHARGE", ""))
    res_f = harmonic_balance_multi(sim_f.engine, sim_f.params,
                                   [(1e7, 6), (2.3e7, 6)], tol=1e-9)
    xf = np.asarray(evaluate(res_f, jnp.asarray(ts[late])))
    assert np.abs(xf - xh).max() / scale > 1e-3


def test_hbosc_charge_vs_transient():
    """Autonomous HB under MOSCAP=CHARGE: f0 is a Newton unknown and the
    reactive term f0·(D1·q(x)) is traced through it.  The Meissner MOS
    oscillator with a device sized so coxwl = 3 pF (3% of the 100 pF
    tank) must (a) converge, (b) agree with a kicked charge-model
    transient's measured period, and (c) land measurably BELOW the
    fixed-lump f0 (the gate charge adds tank capacitance)."""
    deck = """* meissner mos oscillator, charge caps
.MODEL 1 VT 0.7 MU 5e-2 COX 2e-3 LAMBDA 0.01 KF 1e-15 AF 1
VDD 1 0 3
VG gb 0 1.2
L1 g gb 100u
C1 g 0 100p
Rl g 0 5k
Blim g 0 I=100m*(v(g)-1.2)**3
L2 1 d 10u
K1 L1 L2 0.5
M1 d g 0 n 300e-6 5e-6 1
Ik g 0 PULSE 0 1m 1e-8 1e-9 1e-9 5e-9 1
{opt}
.TRAN 2e-9 4e-5
"""
    sim = Simulator.from_text(
        deck.replace("{opt}", ".OPTIONS MOSCAP=CHARGE"))
    r = sim.oscillator_hb(f0_guess=1.6e6, anchor_node="g", n_harm=9,
                          warmup_periods=60)
    assert bool(r.converged), float(r.residual)
    # oracle: kicked transient of the same charge-model deck, period
    # from the anchor's late upward mean-crossings
    xs = np.asarray(sim.transient().xs)
    g = node_eq(sim, "g")
    ya = xs[:, g]
    half = ya[len(ya) // 2:]
    mean = half.mean()
    up = np.nonzero((half[:-1] < mean) & (half[1:] >= mean))[0]
    assert len(up) >= 4
    T_tr = np.mean(np.diff(up[-4:])) * 2e-9
    assert float(r.f0) == pytest.approx(1.0 / T_tr, rel=3e-3)
    # fixed-lump model (no CJ0 in the .MODEL => no MOS caps at all):
    # the charge model's gate charge loads the tank, lowering f0
    sim_f = Simulator.from_text(deck.replace("{opt}", ""))
    rf = sim_f.oscillator_hb(f0_guess=1.6e6, anchor_node="g", n_harm=9,
                             warmup_periods=60)
    assert bool(rf.converged)
    assert float(r.f0) < float(rf.f0) * (1 - 2e-3)


def test_fused_kernel_eligibility():
    """Charge decks ride the fused kernel since r4 (the charges + their
    jvp Jacobians trace in-kernel as 5 extra Woodbury rows per MOS) —
    but each MOS now costs 6 of the MAX_K rank budget, so a deck whose
    k + 5·nM exceeds the gate falls back to the XLA path."""
    from circuitsimulator_tpu.ops import pallas_step
    deck = AMP_DECK.replace("{opt}", ".OPTIONS MOSCAP=CHARGE")
    sim = Simulator.from_text(deck)
    assert pallas_step.supported(sim.engine, dt=2e-9)
    sim_fixed = Simulator.from_text(AMP_DECK.replace("{opt}", ""))
    assert pallas_step.supported(sim_fixed.engine, dt=2e-9)
    # 6 MOS: k = 6 (fixed) -> eligible; k = 36 > MAX_K (charge) -> not
    many = AMP_DECK.replace("M1 d g 0 n 20e-6 1e-6 mn\n", "".join(
        f"M{i} d g 0 n 20e-6 1e-6 mn\n" for i in range(1, 7)))
    sim_many_f = Simulator.from_text(many.replace("{opt}", ""))
    assert pallas_step.supported(sim_many_f.engine, dt=2e-9)
    sim_many_c = Simulator.from_text(
        many.replace("{opt}", ".OPTIONS MOSCAP=CHARGE"))
    assert not pallas_step.supported(sim_many_c.engine, dt=2e-9)


def test_envelope_charge_constant_carrier_is_t1_invariant():
    """Envelope under MOSCAP=CHARGE: an unmodulated carrier's envelope
    must sit at the HB solution for every t1 (the charge-based d/dt1
    term vanishes on a constant envelope), host and batched paths."""
    import jax
    import jax.numpy as jnp
    from circuitsimulator_tpu.analysis.envelope import (
        envelope_transient, envelope_transient_batched)
    sim = Simulator.from_text(
        HB_DECK.replace("{opt}", ".OPTIONS MOSCAP=CHARGE"))
    f0 = 5e7
    hb = sim.harmonic_balance(f0=f0, n_harm=4)
    assert bool(hb.converged)
    env = envelope_transient(sim.engine, sim.params, f0, t_stop=1e-7,
                             dt_env=2e-8, n_harm=4)
    assert env.converged.all()
    ref = np.asarray(hb.xs)
    for i in range(len(env.t1)):
        np.testing.assert_allclose(env.xs[i], ref, atol=2e-7)
    bp = jax.tree.map(lambda x: jnp.stack([jnp.asarray(x)] * 2),
                      dict(sim.params))
    benv = envelope_transient_batched(sim.engine, bp, f0, t_stop=1e-7,
                                      dt_env=2e-8, n_harm=4, tol=1e-9)
    assert benv.converged.all()
    np.testing.assert_allclose(benv.xs[0], env.xs, atol=1e-8)


def test_pac_charge_lti_reduction():
    """PAC around a vanishing-drive PSS under MOSCAP=CHARGE equals the
    .AC response at the DC operating point — pins the per-sample exact
    trans-capacitances in the LPTV operator (pac.lptv_operator) against
    the independently-implemented AC stamps (analysis/ac.py)."""
    import jax.numpy as jnp
    from circuitsimulator_tpu.analysis.pac import pac
    from circuitsimulator_tpu.analysis.ac import ac_analysis
    deck = HB_DECK.replace("SIN 1.2 0.8 5e7", "SIN 1.2 1e-12 5e7 AC 1") \
                  .replace("{opt}", ".OPTIONS MOSCAP=CHARGE")
    sim = Simulator.from_text(deck)
    f0 = 5e7
    x_op = sim.dc()
    K = 2 * 4 + 1
    xs_pss = jnp.broadcast_to(x_op, (K, sim.engine.N))  # zero-drive PSS
    deltas = [3e6, 1.1e7]
    pres = pac(sim.engine, sim.params, f0, xs_pss, deltas)
    ares = ac_analysis(sim.engine, sim.params, deltas, x_op=x_op)
    eq = node_eq(sim, "d")
    m0 = list(pres.harmonics).index(0)
    np.testing.assert_allclose(
        np.asarray(pres.spectrum[:, m0, eq]), np.asarray(ares.xs)[:, eq],
        rtol=1e-6, atol=1e-12)


def test_psp_batched_charge_matches_host():
    """The batched hot-S lane has its own per-sample Cq branch — pin it
    against the host periodic_s_parameters (which rides the
    independently-extended pac.lptv_operator) under MOSCAP=CHARGE."""
    import jax
    import jax.numpy as jnp
    from circuitsimulator_tpu.analysis.hb import harmonic_balance
    from circuitsimulator_tpu.analysis.psp import (
        periodic_s_parameters, periodic_s_parameters_batched)
    sim = Simulator.from_text(
        HB_DECK.replace("{opt}", ".OPTIONS MOSCAP=CHARGE"))
    f0 = 5e7
    res = harmonic_balance(sim.engine, sim.params, f0, n_harm=4)
    assert bool(res.converged)
    dump = sim.topo.n_unknowns
    ports = [(node_eq(sim, "g"), dump), (node_eq(sim, "d"), dump)]
    deltas = [3e6]
    host = periodic_s_parameters(sim.engine, sim.params, f0, res.xs,
                                 ports, [50.0, 50.0], deltas)
    bp = jax.tree.map(lambda x: jnp.stack([jnp.asarray(x)] * 2),
                      dict(sim.params))
    xs_b = jnp.stack([jnp.asarray(res.xs)] * 2)
    bres = periodic_s_parameters_batched(sim.engine, bp, f0, xs_b,
                                         ports, [50.0, 50.0], deltas)
    for lane in range(2):
        np.testing.assert_allclose(bres.s[lane], host.s,
                                   rtol=1e-7, atol=1e-9)


# ---------------------------------------------------------------------
# shooting PSS / oscillator shooting under MOSCAP=CHARGE
# (analysis/sstate.py: the shooting vector gains the 5*nM trapezoidal
# charge-current slots 'qi'; qm = q(x) is derived, not an unknown)
# ---------------------------------------------------------------------

PSS_DECK = (".MODEL 2 VT 0.4 MU 1e-2 COX 1e-3 LAMBDA 0.05 CJ0 1e-13\n"
            ".OPTIONS MOSCAP=CHARGE\n"
            "VDD 1 0 3\nVin 2 0 SIN 1 0.5 1e8\nRD 1 3 1k\n"
            "M1 3 2 0 n 10e-6 1e-6 2\nC1 3 0 2e-13\n"
            ".TRAN 1e-11 1e-6\n.hb 1e8 5\n")


def test_pss_charge_matches_settled_transient():
    """Charge-model shooting must be a fixed point of exactly the map a
    long settled transient iterates (same discretization: osc_engine =
    trap + lu + tight per-step tol, MOSCAP=CHARGE)."""
    import jax.numpy as jnp
    sim = Simulator.from_text(PSS_DECK)
    r = sim.steady_state(steps_per_period=200, warmup_periods=5)
    assert bool(r.converged)
    assert float(r.residual) < 1e-8

    opts = SolverOptions().replace(
        dtype=jnp.float64, tran_method="trap", tran_solver="lu",
        tran_tol=1e-9)
    sim_t = Simulator.from_text(PSS_DECK, opts=opts)
    res = sim_t.transient(tstep=1e-8 / 200, tstop=100e-8)
    last = np.asarray(res.xs)[-200:]
    mine = np.asarray(r.xs)[1:]
    np.testing.assert_allclose(mine, last, atol=1e-9, rtol=0)


def test_pss_charge_vs_fixed_distinct_but_close():
    # same deck under both cap models: the steady states agree at the
    # conduction scale but are NOT identical (different reactive model
    # actually engaged) — guards against the charge slots silently
    # decoupling from the shooting Newton
    sim_c = Simulator.from_text(PSS_DECK)
    r_c = sim_c.steady_state(steps_per_period=200, warmup_periods=5)
    sim_f = Simulator.from_text(PSS_DECK.replace(
        ".OPTIONS MOSCAP=CHARGE\n", ""))
    r_f = sim_f.steady_state(steps_per_period=200, warmup_periods=5)
    assert bool(r_c.converged) and bool(r_f.converged)
    xc, xf = np.asarray(r_c.xs), np.asarray(r_f.xs)
    assert np.max(np.abs(xc - xf)) < 0.2           # same circuit physics
    assert np.max(np.abs(xc - xf)) > 1e-6          # different cap model


MEISSNER_CHARGE = """* transformer-feedback mos oscillator, charge caps
.MODEL 1 VT 0.7 MU 5e-2 COX 2e-3 LAMBDA 0.01 CJ0 5e-14
.OPTIONS MOSCAP=CHARGE
VDD 1 0 3
VG gb 0 1.2
L1 g gb 100u
C1 g 0 100p
Rl g 0 5k
Blim g 0 I=100m*(v(g)-1.2)**3
L2 1 d 10u
K1 L1 L2 0.5
M1 d g 0 n 60e-6 1e-6 1
.op
"""


def test_oscillator_charge_shooting_vs_hb():
    """Autonomous shooting under MOSCAP=CHARGE cross-checked against the
    independently-built autonomous HB (charge residual D.q(x)): both
    must land on the same f0."""
    sim = Simulator.from_text(MEISSNER_CHARGE)
    sh = sim.oscillator(f0_guess=1.6e6, anchor_node="g",
                        steps_per_period=256, warmup_periods=60)
    assert sh.converged, float(sh.residual)
    r = sim.oscillator_hb(f0_guess=1.6e6, anchor_node="g", n_harm=9,
                          warmup_periods=60)
    assert bool(r.converged), float(r.residual)
    assert r.f0 == pytest.approx(float(sh.f0), rel=2e-4)


def test_charge_model_structured_backends_match_lu():
    """r5 (VERDICT item 7): MOSCAP=CHARGE rides the structured backends.
    A MOS common-source chain (block-banded after RCM; also
    ladder-shaped enough for the banded plan) must produce the dense-LU
    trajectory on blockband AND blockwb to machine epsilon — the 5-row
    charge injection scatter (engine.mq_* patterns) now lands in the
    block plans like the nonlinear conduction does."""
    import numpy as np
    from circuitsimulator_tpu import Simulator, DEFAULT_OPTIONS
    stages = 48
    lines = ["* mos cs chain, charge cap model",
             "VDD vdd 0 DC 3",
             "VIN n0 0 SIN 1.2 0.2 1e8",
             ".MODEL 1 VT 0.7 MU 350e-4 COX 3.45e-4 LAMBDA 0.02 CJ0 2e-14",
             ".OPTIONS MOSCAP=CHARGE"]
    for i in range(stages):
        a, b = f"n{i}", f"n{i + 1}"
        lines.append(f"R{i} vdd {b} 10k")
        lines.append(f"M{i} {b} {a} 0 1 20e-6 1e-6 1")
        lines.append(f"C{i} {b} 0 5f")
    lines.append(".TRAN 1e-11 2e-9")
    net = "\n".join(lines) + "\n"

    def run(solver):
        opts = DEFAULT_OPTIONS.replace(tran_solver=solver, dc_solver="lu",
                                       auto_backend=False)
        sim = Simulator.from_text(net, opts=opts)
        assert sim.engine.mos_charge
        res = sim.transient()
        assert not bool(np.any(np.asarray(res.failed)))
        return np.asarray(res.xs)

    x_lu = run("lu")
    x_bb = run("blockband")
    np.testing.assert_allclose(x_bb, x_lu, atol=1e-12)
    x_wb = run("blockwb")
    np.testing.assert_allclose(x_wb, x_lu, atol=1e-12)
