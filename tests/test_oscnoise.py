"""Oscillator phase noise via the PPV (analysis/oscnoise.py).

NEW WORK — the reference has neither noise nor steady-state analysis
(SURVEY.md §2.13), so validation is against theory and against this
engine's own time-domain TRNOISE Monte-Carlo:

1. the van der Pol LC tank's diffusion constant matches the classic
   impulse-sensitivity closed form c = S/(4 A²C²ω²) (tank-current
   injection has the sine ISF; Hajimiri/Lee form of Demir's c);
2. the PPV invariant v·ds/dt is flat around the cycle and the monodromy
   eigenstructure is sane (λ_phase = 1, |λ₂| < 1);
3. a TRNOISE Monte-Carlo of the same deck reproduces the predicted
   absolute-jitter growth var[t_cross] = c·t.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from circuitsimulator_tpu import Simulator
from circuitsimulator_tpu.analysis.noise import K_BOLTZ, T_NOISE
from circuitsimulator_tpu.analysis.oscnoise import oscillator_phase_noise

# tank: L = 1uH, C = 1nF -> f0 ~ 5.03 MHz; describing-function amplitude
# A = sqrt(4 (a-g)/(3b)) = 2.0 V (see tests/test_oscillator.py)
VDP = """* van der pol lc oscillator
L1 a 0 1u
C1 a 0 1n
Rl a 0 2k
Bneg a 0 I=-2m*v(a) + 0.5m*v(a)**3
.op
"""

C_TANK = 1e-9
R_LOAD = 2e3


@pytest.fixture(scope="module")
def osc():
    sim = Simulator.from_text(VDP)
    res = sim.oscillator(f0_guess=5e6, anchor_node="a",
                         steps_per_period=256, warmup_periods=40)
    assert res.converged
    return sim, res


def _isf_closed_form(res, S):
    """c for white current noise injected across the tank: sine ISF,
    c = S / (4 A² C² ω²) with the MEASURED amplitude and frequency."""
    v = np.asarray(res.xs)[:, 0]
    A = 0.5 * (v.max() - v.min())
    w = 2 * np.pi * res.f0
    return S / (4.0 * A * A * C_TANK * C_TANK * w * w)


def test_vdp_matches_isf_closed_form(osc):
    sim, res = osc
    pn = sim.oscillator_phase_noise(offsets=[1e3, 1e4, 1e5], osc=res)
    S_r = 4.0 * K_BOLTZ * T_NOISE / R_LOAD
    c_exp = _isf_closed_form(res, S_r)
    # weak nonlinearity (eps ~ 0.05): the orbit is near-sinusoidal and the
    # PPV near-sine, so the closed form holds to a few percent
    assert pn.c == pytest.approx(c_exp, rel=0.05)
    assert list(pn.kinds) == ["R"]
    assert pn.by_class == {"R": pytest.approx(pn.c)}
    # far-out spectrum is 1/f²: 20 dB per decade of offset
    assert pn.L_dbc[1] - pn.L_dbc[2] == pytest.approx(20.0, abs=0.1)
    # and L(Δf) ≈ 10 log10(c f0²/Δf²) there
    exp_l = 10 * np.log10(pn.c * res.f0 ** 2 / 1e4 ** 2)
    assert pn.L_dbc[1] == pytest.approx(exp_l, abs=0.05)
    assert pn.period_jitter == pytest.approx(np.sqrt(pn.c / res.f0))


def test_ppv_diagnostics_and_extra_source(osc):
    sim, res = osc
    S_x = 1e-18
    pn = sim.oscillator_phase_noise(
        offsets=[1e4], osc=res,
        extra_sources=[("a", "0", S_x)])
    # PPV invariant v·ds/dt flat around the cycle; Floquet structure sane
    assert pn.invariance < 2e-2
    assert pn.floquet_err < 1e-3
    assert pn.lambda2 < 1.0
    # the extra tank-current generator obeys the same ISF closed form
    c_x = pn.by_class["X"]
    assert c_x == pytest.approx(_isf_closed_form(res, S_x), rel=0.05)
    # contributions add
    assert pn.c == pytest.approx(pn.by_class["R"] + c_x)
    # PPV of the tank node is sinusoidal, 90 deg from the waveform: the
    # ISF peaks at the zero crossings of v(a)
    v = np.asarray(res.xs)[:-1, 0]
    ppv_a = np.asarray(pn.ppv)[:-1, 0]
    corr = np.abs(np.dot(v, ppv_a)) / (np.linalg.norm(v)
                                       * np.linalg.norm(ppv_a))
    assert corr < 0.1


MEISSNER = """* meissner (transformer-feedback) mos oscillator, class A
.MODEL 1 VT 0.7 MU 5e-2 COX 2e-3 LAMBDA 0.01 KF 1e-15 AF 1
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


def test_mos_meissner_flicker_corner():
    """A real-device oscillator: MOS in saturation the whole cycle
    (smooth map — the gate swing 1.14..1.26 V stays above VT and the
    drain above saturation), transformer feedback via K coupling.  MOS
    flicker (KF) gives the 1/f³ close-in skirt; thermal + channel noise
    the 1/f² region.  Also regression-pins the zero-C cap-like shooting
    fix (sstate._dyn_mask): the 4 CJ0=0 MOS junction caps froze the
    augmented Newton entirely before it."""
    sim = Simulator.from_text(MEISSNER)
    res = sim.oscillator(f0_guess=1.6e6, anchor_node="g",
                         steps_per_period=256, warmup_periods=60)
    assert res.converged, float(res.residual)
    assert res.f0 == pytest.approx(1.59e6, rel=0.02)   # 1/(2π√(L1 C1))
    pn = sim.oscillator_phase_noise(offsets=[1e2, 1e3, 1e4, 1e6], osc=res)
    assert pn.c > 0 and pn.c_flicker > 0
    # thermal and MOS channel noise both land, shares add up
    assert set(pn.by_class) == {"R", "M"}
    assert pn.by_class["R"] + pn.by_class["M"] == pytest.approx(pn.c)
    # flicker corner c_fl/c sits in the kHz range for KF=1e-15 here:
    # ~30 dB/decade below it, 20 dB/decade above
    corner = pn.c_flicker / pn.c
    assert 1e3 < corner < 2e4
    assert pn.L_dbc[0] - pn.L_dbc[1] > 27.0
    # (the residual flicker at 1e4 biases the 2-decade average slightly
    # above the pure-white 20 dB/decade)
    assert (pn.L_dbc[2] - pn.L_dbc[3]) / 2 == pytest.approx(20.0, abs=1.0)
    # Floquet/PPV diagnostics stay sane on the multi-device deck
    assert pn.invariance < 1e-2
    assert pn.floquet_err < 1e-2
    assert pn.lambda2 < 0.5


def test_trnoise_monte_carlo_matches_prediction(osc):
    """Self-consistency against the time-domain engine: a TRNOISE current
    source across the tank, lanes launched from one point on the limit
    cycle, var[crossing time] grows as c·t with the PPV-predicted c."""
    from circuitsimulator_tpu.analysis.transient import run_transient
    from circuitsimulator_tpu.analysis.measure import _crossings
    from circuitsimulator_tpu import DEFAULT_OPTIONS

    sim, res = osc
    na, nt = 4.6e-4, 1e-9
    S_x = 2.0 * na * na * nt              # one-sided PSD of the held noise
    pn = sim.oscillator_phase_noise(offsets=[1e4], osc=res,
                                    extra_sources=[("a", "0", S_x)])
    c_pred = pn.by_class["X"]             # TRNOISE source dominates R by 40x
    assert c_pred > 30 * pn.by_class["R"]

    noisy = VDP.replace(".op", f"IN a 0 0 TRNOISE({na} {nt})\n.op")
    opts = DEFAULT_OPTIONS.replace(tran_method="trap", tran_solver="lu")
    sim_n = Simulator.from_text(noisy, opts=opts)
    eng, p = sim_n.engine, sim_n.params

    T = 1.0 / res.f0
    n_per, B = 36, 256
    tstep = nt
    tstop = n_per * T
    x0 = jnp.asarray(np.asarray(res.xs)[0], eng.dtype)
    keys = jax.random.split(jax.random.key(42), B)
    out = jax.vmap(lambda k: run_transient(eng, p, tstep, tstop, x0=x0,
                                           noise_key=k))(keys)
    xs = np.asarray(out.xs)               # (B, T+1, N)
    times = np.arange(xs.shape[1]) * tstep

    per_lane = [_crossings(times, xs[b, :, 0], 0.0, "rise", 2.0 * T)
                for b in range(B)]
    k = min(len(c) for c in per_lane)
    assert k >= n_per - 5
    edges = np.stack([c[:k] for c in per_lane])     # (B, k)
    var = edges.var(axis=0)
    t_mean = edges.mean(axis=0)
    # linear fit var = c_mc * t + b over the diffusion-dominated tail
    sel = t_mean > 5 * T
    c_mc = np.polyfit(t_mean[sel], var[sel], 1)[0]
    # MC variance se ~ sqrt(2/(B-1)) ~ 9%; BE-vs-trap and amplitude-noise
    # leakage add a few more — factor-level agreement is the claim
    assert c_mc == pytest.approx(pn.c, rel=0.35)
