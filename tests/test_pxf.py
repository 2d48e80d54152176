"""Periodic transfer functions (analysis/pac.py pxf) — the adjoint of
PAC: every source x every input sideband -> one output, validated
against plain .AC (LTI limit), a closed-form multiplier mixer, and the
forward LPTV solve the adjoint must agree with."""

import numpy as np
import pytest

from circuitsimulator_tpu import Simulator


def node_eq(sim, name):
    return sim.circuit.nodes[sim.circuit.node_name_to_id[name]].eq_index


def test_linear_circuit_pxf_matches_ac():
    # no large-signal drive: the m=0 transfer from V1 must equal plain
    # .AC, and every other input sideband carries nothing (LTI)
    sim = Simulator.from_text("""* rc lowpass
V1 in 0 DC 0 AC 1
Vlo lo 0 SIN 0 0 1e6
Rlo lo 0 1k
R1 in out 1k
C1 out 0 1n
.hb 1e6 4
.AC lin 1 30k 30k
""")
    res = sim.pxf(deltas=[30e3], out_node="out")
    assert res.v_names[0].lower() == "v1"
    m0 = list(res.harmonics).index(0)
    j_v1 = res.v_names.index("V1") if "V1" in res.v_names else 0
    got = res.xf_v[0, m0, j_v1]
    out = node_eq(sim, "out")
    expect = np.asarray(sim.ac().xs)[0, out]
    assert got == pytest.approx(expect, rel=1e-6)
    for j, m in enumerate(res.harmonics):
        if m != 0:
            assert abs(res.xf_v[0, j, j_v1]) < 1e-12


def test_pxf_isource_matches_ac():
    # I-source column: unit AC current into out through the RC tank ->
    # transfer = Z(out) = R || 1/(j w C); check sign convention too
    sim = Simulator.from_text("""* current-driven tank
I1 0 out DC 0 AC 1
Vlo lo 0 SIN 0 0 1e6
Rlo lo 0 1k
R1 out 0 1k
C1 out 0 1n
.hb 1e6 4
""")
    d = 30e3
    res = sim.pxf(deltas=[d], out_node="out")
    m0 = list(res.harmonics).index(0)
    got = res.xf_i[0, m0, 0]
    zc = 1.0 / (2j * np.pi * d * 1e-9)
    expect = 1e3 * zc / (1e3 + zc)
    assert got == pytest.approx(expect, rel=1e-6)


def test_multiplier_mixer_pxf_gain():
    # ideal multiplier out = v(lo)*v(rf), LO = sin(w0 t): an RF tone
    # injected at m*f0 + delta lands at the output offset delta with
    # coefficient -j/2 for m=-1 and +j/2 for m=+1 (mirror of the PAC
    # closed form: here the INPUT sideband is swept, not the output)
    sim = Simulator.from_text("""* b-source mixer
Vlo lo 0 SIN 0 1 1e6
Rlo lo 0 1k
Vrf rf 0 DC 0 AC 1
Rrf rf 0 1k
Bmix out 0 V=v(lo)*v(rf)
Rout out 0 1k
.hb 1e6 6
""")
    res = sim.pxf(deltas=[10e3], out_node="out")
    j_rf = res.v_names.index("Vrf")
    j_lo = res.v_names.index("Vlo")
    up = list(res.harmonics).index(1)
    dn = list(res.harmonics).index(-1)
    m0 = list(res.harmonics).index(0)
    assert res.xf_v[0, dn, j_rf] == pytest.approx(-0.5j, rel=1e-6)
    assert res.xf_v[0, up, j_rf] == pytest.approx(+0.5j, rel=1e-6)
    assert abs(res.xf_v[0, m0, j_rf]) < 1e-9
    # the LO port sees nothing: d out/d v(lo) = v(rf)* = 0 at the PSS
    assert np.max(np.abs(res.xf_v[0, :, j_lo])) < 1e-9


def test_pxf_agrees_with_forward_lptv_solve():
    # adjoint-vs-forward consistency on a genuinely nonlinear PSS: for
    # each input sideband m, forward-solve J(d) Y = samples of
    # u e^{j m w0 t} and read the output envelope-0 coefficient; the
    # one adjoint solve must reproduce every one of them
    from circuitsimulator_tpu.analysis.pac import (lptv_operator,
                                                   _lptv_at, pxf)
    sim = Simulator.from_text("""* driven diode rectifier
Vin in 0 SIN 0 0.8 1e6
Rs in a 100
D1 a out DMOD
Cl out 0 10n
Rl out 0 10k
.model DMOD D IS=1e-14
.hb 1e6 8
""")
    f0 = 1e6
    pss = sim._pss_samples(sim.params, f0, None)
    eng = sim.engine
    out = node_eq(sim, "out")
    res = pxf(eng, sim.params, f0, pss, [25e3], out_eq=out,
              n_sidebands=2)
    J0, CI, K, tl = lptv_operator(eng, sim.params, f0, pss)
    J = _lptv_at(J0, CI, tl, 25e3)
    N = eng.N
    u = np.zeros(N, complex)
    u[int(eng.topo.vs_k[0])] = 1.0          # Vin's branch row
    tt = np.arange(K)
    for j, m in enumerate(res.harmonics):
        rhs = (u[None, :] * np.exp(2j * np.pi * m * tt / K)[:, None])
        Y = np.linalg.solve(J, rhs.reshape(-1)).reshape(K, N)
        fwd = Y[:, out].mean()              # envelope-0 coefficient
        assert res.xf_v[0, j, 0] == pytest.approx(fwd, rel=1e-9, abs=1e-15)
