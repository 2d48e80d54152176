"""Periodic (hot) S-parameters (analysis/psp.py) and large-signal
S-parameters (Simulator.lssp).

Anchors:
- LTI reduction: around a trivial (zero) PSS the m=0 block of the
  conversion scattering matrix equals the cold s_parameters at delta,
  the m=+1 block equals the cold values at f0+delta, and every
  frequency-translating entry is zero.
- Ideal-multiplier up-converter: B-source I=v(rf)*v(lo) under an LO
  drive A·sin(w0 t) gives |Z_conv| = R1·R2·A/2 and the unilateral
  two-port closed form S_conv = 2·z0·Z_conv/((R1+z0)(R2+z0)).
- LSSP on a linear network equals the cold S-parameters (complex,
  both phasor conventions are e^{+jwt}), power-independent; adding a
  cubic compressor makes |S21| fall with drive power.
"""

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator


F0 = 10e6


def test_psp_lti_reduces_to_cold_sparams():
    net = """* lti two-port
R1 a b 1k
C1 b 0 1n
R2 a 0 500
.op
"""
    sim = Simulator.from_text(net)
    ports = [("a", None, 50.0), ("b", None, 75.0)]
    deltas = [1.2e5, 3.7e5]
    H = 3
    pss = np.zeros((2 * H + 1, sim.engine.N))
    res = sim.hot_sparams(ports, deltas, f0=F0, n_sidebands=1, pss_xs=pss)

    cold0 = sim.sparams(ports, freqs=deltas)
    coldp = sim.sparams(ports, freqs=[F0 + d for d in deltas])
    coldm = sim.sparams(ports, freqs=[F0 - d for d in deltas])
    for i in range(2):
        for j in range(2):
            np.testing.assert_allclose(res.s_at(i, 0, j, 0),
                                       cold0.s[:, i, j], atol=1e-9)
            np.testing.assert_allclose(res.s_at(i, 1, j, 1),
                                       coldp.s[:, i, j], atol=1e-9)
            # m=-1 terminals live at -f0+delta = -(f0-delta): the
            # envelope analysis at a negative frequency returns the
            # conjugate of the positive-frequency S-parameters
            np.testing.assert_allclose(res.s_at(i, -1, j, -1),
                                       coldm.s[:, i, j].conj(), atol=1e-9)
            # no frequency translation in an LTI network
            for mi, mj in ((1, 0), (0, 1), (-1, 0), (1, -1)):
                np.testing.assert_allclose(res.s_at(i, mi, j, mj), 0.0,
                                           atol=1e-9)


def test_psp_multiplier_conversion_closed_form():
    A, R1, R2, Z0 = 0.4, 100.0, 130.0, 50.0
    net = f"""* unilateral up-converter
VLO lo 0 SIN 0 {A} {F0}
RLO lo 0 1k
R1 rf 0 {R1}
R2 if 0 {R2}
B1 0 if I=v(rf)*v(lo)
.hb {F0} 5
"""
    sim = Simulator.from_text(net)
    ports = [("rf", None, Z0), ("if", None, Z0)]
    delta = 2.3e5
    res = sim.hot_sparams(ports, [delta], n_sidebands=1)

    zc = R1 * R2 * A / 2.0
    # conversion impedance: injection at (rf, 0) -> voltage at (if, +/-1)
    i_up = res.index(1, 1)
    i_dn = res.index(1, -1)
    j_in = res.index(0, 0)
    assert abs(res.z[0, i_up, j_in]) == pytest.approx(zc, rel=1e-6)
    assert abs(res.z[0, i_dn, j_in]) == pytest.approx(zc, rel=1e-6)
    # no reverse conversion (the multiplier is unilateral: nothing
    # couples back into rf), diagonal reflections are the flat-R values
    assert abs(res.z[0, j_in, i_up]) < 1e-9
    s_refl_rf = (R1 - Z0) / (R1 + Z0)
    s_refl_if = (R2 - Z0) / (R2 + Z0)
    assert res.s[0, j_in, j_in] == pytest.approx(s_refl_rf, rel=1e-6)
    assert res.s[0, i_up, i_up] == pytest.approx(s_refl_if, rel=1e-6)
    s_conv = 2.0 * Z0 * zc / ((R1 + Z0) * (R2 + Z0))
    assert abs(res.s[0, i_up, j_in]) == pytest.approx(s_conv, rel=1e-6)


INNER = """R3 p1 p2 100
RL p2 0 200
C2 p2 0 1n
"""


def test_lssp_linear_matches_cold_sparams():
    cold = Simulator.from_text("* inner\n" + INNER + ".op\n")
    sref = cold.sparams([("p1", None, 50.0), ("p2", None, 50.0)],
                        freqs=[F0]).s[0]

    hot = Simulator.from_text(f"""* lssp linear
V1 s1 0 SIN 0 1 {F0}
RS1 s1 p1 50
V2 s2 0 SIN 0 1 {F0}
RS2 s2 p2 50
{INNER}.hb {F0} 4
""")
    out = hot.lssp([("V1", "p1", 50.0), ("V2", "p2", 50.0)], power=1e-3)
    np.testing.assert_allclose(out["s"], sref, rtol=1e-6, atol=1e-9)
    # linear network: power-independent
    out2 = hot.lssp([("V1", "p1", 50.0), ("V2", "p2", 50.0)], power=1e-5)
    np.testing.assert_allclose(out2["s"], out["s"], rtol=1e-6, atol=1e-9)


def test_lssp_floating_port_rejected():
    """The a/b wave extraction reads Vs from the source's positive node,
    which is only the source phasor for a grounded Thevenin port — a
    floating port source must be rejected, not silently mis-measured."""
    hot = Simulator.from_text(f"""* floating port source
V1 s1 mid SIN 0 1 {F0}
Rm mid 0 10
RS1 s1 p1 50
Rl p1 0 100
.hb {F0} 4
""")
    with pytest.raises(ValueError, match="floating"):
        hot.lssp([("V1", "p1", 50.0)], power=1e-3)


def test_lssp_compression():
    hot = Simulator.from_text(f"""* lssp compressive
V1 s1 0 SIN 0 1 {F0}
RS1 s1 p1 50
V2 s2 0 SIN 0 1 {F0}
RS2 s2 p2 50
{INNER}B1 p2 0 I=0.5*v(p2)^3
.hb {F0} 6
""")
    ports = [("V1", "p1", 50.0), ("V2", "p2", 50.0)]
    lo = hot.lssp(ports, power=1e-7)
    hi = hot.lssp(ports, power=3e-2)
    # small-signal limit: the cubic is invisible
    cold = Simulator.from_text("* inner\n" + INNER + ".op\n")
    sref = cold.sparams([("p1", None, 50.0), ("p2", None, 50.0)],
                        freqs=[F0]).s[0]
    np.testing.assert_allclose(lo["s"], sref, rtol=1e-4, atol=1e-8)
    # compression: forward gain falls with drive
    assert abs(hi["s"][1, 0]) < 0.9 * abs(lo["s"][1, 0])


def test_cli_hot_and_large_signal(tmp_path):
    from circuitsimulator_tpu.cli import main
    # hot S-params on the multiplier mixer deck
    deck = tmp_path / "mix.sp"
    deck.write_text(f"""* up-converter
VLO lo 0 SIN 0 0.4 {F0}
RLO lo 0 1k
R1 rf 0 100
R2 if 0 130
B1 0 if I=v(rf)*v(lo)
.hb {F0} 5
""")
    out = tmp_path / "hot.csv"
    rc = main([str(deck), "--no-tran", "--run-hot-sparams", "rf,if",
               "--psp-deltas", "2.3e5", "--hot-sparams-out", str(out)])
    assert rc == 0
    lines = out.read_text().strip().split("\n")
    assert lines[0].startswith("delta,")
    hdr = lines[0].split(",")
    vals = [float(v) for v in lines[1].split(",")]
    # the (if@+1, rf@0) conversion magnitude matches the closed form
    col = hdr.index("|S(2@+1;1@+0)|")
    zc = 100.0 * 130.0 * 0.4 / 2.0
    s_conv = 2.0 * 50.0 * zc / (150.0 * 180.0)
    assert vals[col] == pytest.approx(s_conv, rel=1e-6)

    # LSSP on the linear deck: S21 printed magnitude matches cold value
    deck2 = tmp_path / "lin.sp"
    deck2.write_text(f"""* lssp linear
V1 s1 0 SIN 0 1 {F0}
RS1 s1 p1 50
V2 s2 0 SIN 0 1 {F0}
RS2 s2 p2 50
{INNER}.hb {F0} 4
""")
    rc = main([str(deck2), "--no-tran",
               "--run-lssp", "V1:p1@50,V2:p2@50"])
    assert rc == 0
    # missing deltas is a clean failure, not a traceback
    rc = main([str(deck), "--no-tran", "--run-hot-sparams", "rf,if"])
    assert rc == 1
