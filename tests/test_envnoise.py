"""Envelope noise (analysis/envnoise.py): unmodulated limit vs pnoise,
LTI limit vs .NOISE, and bias-switched shot/channel noise tracking the
envelope (the reference has no noise or envelope analysis at all —
/root/reference/src/sstateanalysis.cpp is an empty placeholder)."""

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator


def test_unmodulated_matches_pnoise():
    # no slow modulation: every envelope step sits at the PSS, so the
    # time-resolved envelope noise must reproduce pnoise at every t1
    net = """* diode chopper
Vlo lo 0 SIN 0.4 0.3 1e6
Rlo lo a 100
D1 a out IS=1e-12
Rl out 0 1k
C1 out 0 100p
.hb 1e6 6
"""
    sim = Simulator.from_text(net)
    deltas = [1e3, 30e3]
    env = sim.envelope(t_stop=2e-6, dt_env=1e-6, n_harm=6)
    assert bool(env.converged.all())
    en = sim.envelope_noise(deltas, out_node="out", env=env)
    pn = sim.pnoise(deltas, out_node="out", n_harm=6)
    assert en.onoise.shape == (3, 2)
    for a in range(en.onoise.shape[0]):
        np.testing.assert_allclose(en.onoise[a], pn.onoise, rtol=1e-4)
    # kind-resolved parity too
    for k in pn.by_kind:
        np.testing.assert_allclose(en.by_kind[k][0], pn.by_kind[k],
                                   rtol=1e-4)


def test_lti_matches_stationary_noise():
    # linear circuit: the LPTV operator is LTI (no folding) at every
    # envelope time, so envelope noise == the stationary .NOISE PSD
    net = """* divider noise
Vlo lo 0 SIN 0 0 1e6
Rlo lo 0 1k
V1 in 0 DC 1
R1 in out 10k
R2 out 0 10k
C1 out 0 1n
.hb 1e6 4
"""
    sim = Simulator.from_text(net)
    deltas = [1e3, 50e3]
    en = sim.envelope_noise(deltas, out_node="out", t_stop=2e-6,
                            dt_env=1e-6, n_harm=4)
    nres = sim.noise(freqs=np.asarray(deltas), out_node="out")
    for a in range(en.onoise.shape[0]):
        np.testing.assert_allclose(en.onoise[a], np.asarray(nres.onoise),
                                   rtol=1e-6)


def test_switched_bias_tracks_envelope():
    # a diode switched on by a SLOW pulse under a small fast carrier: no
    # reactive memory, so each envelope step IS the frozen-bias PSS and
    # the time-resolved noise must match pnoise of the frozen decks
    # exactly — off before the pulse, shot-noise-dominated after
    net = """* switched diode noise
Vc c 0 SIN 0 0.05 1e6
Rc c a 1k
Vb b 0 PULSE 0 0.75 2.5e-6 1e-6 1e-6 1e-5 1e-4
Rb b a 1k
D1 a 0 IS=1e-12
.hb 1e6 6
"""
    sim = Simulator.from_text(net)
    env = sim.envelope(t_stop=6e-6, dt_env=1e-6, n_harm=6)
    assert bool(env.converged.all())
    en = sim.envelope_noise([10e3], out_node="a", env=env,
                            t1_idx=[0, 1, 2, 4, 5, 6])
    assert en.onoise.shape == (6, 1)
    # frozen-bias references (PULSE value at t1=0/1/2 us is 0 V, fully
    # risen 0.75 V from 3.5 us on)
    for vb, rows in ((0.0, (0, 1, 2)), (0.75, (4, 5))):
        frozen = Simulator.from_text(net.replace(
            "Vb b 0 PULSE 0 0.75 2.5e-6 1e-6 1e-6 1e-5 1e-4",
            f"Vb b 0 DC {vb}"))
        pf = frozen.pnoise([10e3], out_node="a", n_harm=6)
        for r in rows:
            np.testing.assert_allclose(en.onoise[r], pf.onoise,
                                       rtol=1e-5)
    # the diode's shot contribution turns ON with the bias
    assert en.by_kind["D"][4, 0] > 10.0 * en.by_kind["D"][0, 0]
    # t1 bookkeeping follows the selection
    np.testing.assert_allclose(en.t1, [0, 1e-6, 2e-6, 4e-6, 5e-6, 6e-6])


def test_bad_inputs():
    net = """* divider
Vlo lo 0 SIN 0 0 1e6
Rlo lo 0 1k
R1 lo out 1k
R2 out 0 1k
.hb 1e6 4
"""
    sim = Simulator.from_text(net)
    with pytest.raises(ValueError, match="> 0"):
        sim.envelope_noise([0.0], out_node="out", t_stop=1e-6,
                           dt_env=1e-6)
    with pytest.raises(ValueError, match="t_stop"):
        sim.envelope_noise([1e3], out_node="out")
