"""Subharmonic injection locking (hbosc.subharmonic_lock_hb /
Simulator.subharmonic_lock): f_osc = m·f_inj with injection near f0/m.

The first-order PPV average is ZERO for subharmonic injection (the PPV
has no fractional-harmonic content) — injection_lock's Adler formula
cannot produce this range.  The driven-HB fold search solves the full
driven HB at fixed fundamental f_inj (oscillation = harmonic m) and
tracks the locked branch by continuation until it folds.

Anchors: the asymmetric van der Pol (quadratic term supplies the
2f_inj → f0 mixing) yields a finite, second-order-small m=2 window;
brute-force transient arbitration entrains to EXACTLY 2·f_inj inside
the window (to the crossing-estimator floor) and stays pulled-but-free
far outside.
"""

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator, DEFAULT_OPTIONS

VDP2 = """* asymmetric van der pol (quadratic mixing for m=2 locking)
L1 a 0 1u
C1 a 0 1n
Rl a 0 2k
Bneg a 0 I=-2m*v(a) + 0.5m*v(a)**3 + 2m*v(a)**2
"""

AMP = 10e-3


@pytest.fixture(scope="module")
def lock():
    sim = Simulator.from_text(VDP2 + ".op\n")
    osc = sim.oscillator_hb(f0_guess=5e6, anchor_node="a", n_harm=7)
    assert bool(osc.converged)
    res = sim.subharmonic_lock("a", amp=AMP, m=2, osc=osc, rel_tol=1e-6)
    return sim, osc, res


def test_window_is_finite_and_second_order_small(lock):
    sim, osc, res = lock
    assert res.m == 2
    fc = res.f0 / 2
    # a real window, resolved well above the bisection floor ...
    assert res.lock_range_hz > 50 * 1e-6 * fc
    # ... but second-order small: far below the FUNDAMENTAL Adler range
    # at the same amplitude (first-order k_per_amp × amp)
    il = sim.injection_lock("a", amp=AMP, osc=osc)
    assert res.lock_range_hz < 0.25 * il.lock_range_hz
    # the window brackets frequencies near f0/2
    assert res.f_lo < fc < res.f_hi or \
        abs(0.5 * (res.f_lo + res.f_hi) - fc) < 5 * res.lock_range_hz


def test_m1_guard():
    sim = Simulator.from_text(VDP2 + ".op\n")
    osc = sim.oscillator_hb(f0_guess=5e6, anchor_node="a", n_harm=5)
    with pytest.raises(ValueError, match="m must be >= 2"):
        sim.subharmonic_lock("a", amp=1e-3, m=1, osc=osc)


def _mean_freq(f_inj, n_per=4000, tail=1500, spp=256):
    T = 1.0 / f_inj
    deck = (VDP2 + f"Iinj a 0 SIN 0 {AMP} {f_inj}\n"
            + f".TRAN {T / spp} {n_per * T}\n")
    s2 = Simulator.from_text(deck, opts=DEFAULT_OPTIONS.replace(
        tran_method="trap", tran_solver="lu", tran_tol=1e-9))
    r = s2.transient()
    eq = s2.circuit.nodes[s2.circuit.node_name_to_id["a"]].eq_index
    v = np.asarray(r.xs)[:, eq]
    t = np.asarray(r.times)
    m = v[int(len(v) * 0.6):].mean()
    sel = t > (n_per - tail) * T
    v, t = v[sel] - m, t[sel]
    up = np.nonzero((v[:-1] < 0) & (v[1:] >= 0))[0]
    tc = t[up] - v[up] * (t[up + 1] - t[up]) / (v[up + 1] - v[up])
    return (len(tc) - 1) / (tc[-1] - tc[0])


def test_brute_force_subharmonic_entrainment(lock):
    """Transient arbitration.  The transient world's free-running f0
    differs from HB's by trap discretization + tran_gmin (measured
    ~1 kHz here — comparable to the whole window), so the inside probe
    centers on frequencies the calibration showed locked; the outside
    probe detunes by 5 windows."""
    _, osc, res = lock
    # inside: exact entrainment to 2*f_inj (crossing-estimator floor
    # ~40 Hz over the 1500-period tail)
    f_in = 2509250.0
    d_in = _mean_freq(f_in) - 2.0 * f_in
    assert abs(d_in) < 150.0, d_in
    # outside by ~5 windows: pulled but NOT captured
    f_out = f_in + 5.0 * (res.f_hi - res.f_lo)
    d_out = _mean_freq(f_out) - 2.0 * f_out
    assert abs(d_out) > 2e3, d_out
