"""Two-port stability/gain metrics (analysis/sparams.two_port_metrics):
closed forms for passive networks + microwave identities on an active
stage."""

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator
from circuitsimulator_tpu.analysis.sparams import two_port_metrics


def test_series_resistor_attenuator_closed_form():
    # series R = Z0 = 50 between two 50-ohm ports:
    #   S11 = S22 = R/(R+2Z0) = 1/3,  S21 = S12 = 2Z0/(R+2Z0) = 2/3
    # a passive reciprocal lossy 2-port sits exactly on the stability
    # boundary: K = 1, mu = 1, MAG = MSG = 1
    sim = Simulator.from_text("""* series attenuator
R1 p1 p2 50
Rshim1 p1 0 1e12
Rshim2 p2 0 1e12
""")
    m = sim.stability(ports=[("p1", None, 50.0), ("p2", None, 50.0)],
                      freqs=[1e6])
    sres = sim.sparams([("p1", None, 50.0), ("p2", None, 50.0)],
                       freqs=[1e6])
    assert sres.s[0, 0, 0] == pytest.approx(1 / 3, rel=1e-6)
    assert sres.s[0, 1, 0] == pytest.approx(2 / 3, rel=1e-6)
    assert m.k[0] == pytest.approx(1.0, rel=1e-6)
    assert m.mu_load[0] == pytest.approx(1.0, rel=1e-6)
    assert m.mu_src[0] == pytest.approx(1.0, rel=1e-6)
    assert m.msg[0] == pytest.approx(1.0, rel=1e-6)
    # K sits exactly at 1 here, where MAG = MSG(K - sqrt(K^2-1)) has
    # square-root sensitivity to the 1e12-ohm shim perturbation
    assert m.mag[0] == pytest.approx(1.0, abs=5e-3)
    assert m.delta[0] == pytest.approx(1 / 9 - 4 / 9, rel=1e-6)


def test_vccs_stage_identities():
    # gm stage with resistive feedback: genuinely active and reciprocal-
    # breaking; check the textbook identities rather than closed forms
    sim = Simulator.from_text("""* feedback transconductance amp
Rin p1 0 200
G1 p2 0 p1 0 0.05
Ro p2 0 500
Rf p2 p1 2k
Cf p2 p1 2p
""")
    freqs = np.logspace(6, 9, 7)
    m = sim.stability(ports=[("p1", None, 50.0), ("p2", None, 50.0)],
                      freqs=freqs)
    # mu > 1 <=> (K > 1 and |delta| < 1)  (Edwards-Sinsky equivalence)
    for i in range(len(freqs)):
        es = bool(m.mu_load[i] > 1.0)
        rk = bool((m.k[i] > 1.0) and (abs(m.delta[i]) < 1.0))
        assert es == rk
        if np.isfinite(m.mag[i]):
            # MAG = MSG (K - sqrt(K^2-1)) <= MSG
            assert m.mag[i] <= m.msg[i] * (1 + 1e-12)
            assert m.mag[i] == pytest.approx(
                m.msg[i] * (m.k[i] - np.sqrt(m.k[i] ** 2 - 1)), rel=1e-12)
    # the source- and load-side mu agree on the verdict
    assert np.array_equal(m.mu_load > 1, m.mu_src > 1)


def test_mason_u_invariance_under_feedback():
    # Mason's U is invariant under lossless reciprocal embedding; the
    # cheap, strong check: for a unilateralized device (S12 -> 0) U
    # equals the unilateral transducer gain |S21|^2/((1-|S11|^2)(1-|S22|^2))
    s = np.zeros((1, 2, 2), complex)
    s[0] = [[0.3 + 0.1j, 1e-9], [4.0 - 2.0j, 0.4 - 0.2j]]
    m = two_port_metrics(s, freqs=[1e9])
    gu = (abs(s[0, 1, 0]) ** 2
          / ((1 - abs(s[0, 0, 0]) ** 2) * (1 - abs(s[0, 1, 1]) ** 2)))
    assert m.mason_u[0] == pytest.approx(gu, rel=1e-6)
    # raw-array input path works and matches the dataclass path
    assert m.msg[0] == pytest.approx(abs(s[0, 1, 0]) / 1e-9, rel=1e-9)
