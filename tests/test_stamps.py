"""Single-device stamp tests against hand-computed MNA blocks
(reference: src/element.cpp)."""

import numpy as np
import jax.numpy as jnp
import pytest

from circuitsimulator_tpu.api import Simulator
from circuitsimulator_tpu.models.mosfet import mos_linearize
from circuitsimulator_tpu.utils.options import DEFAULT_OPTIONS


def build(text):
    sim = Simulator.from_text(text)
    return sim


def dense_dc(sim, x=None, scale=1.0, gmin=0.0):
    eng = sim.engine
    N = eng.N
    if x is None:
        x = jnp.zeros(N, dtype=eng.dtype)
    Gs, Is = eng.dc_static(sim.params, jnp.asarray(scale, eng.dtype))
    G, I = eng.assemble_dc_iter(Gs, Is, sim.params, x, jnp.asarray(gmin, eng.dtype))
    return np.asarray(G[:N, :N]), np.asarray(I[:N])


def test_resistor_stamp():
    sim = build("R1 1 2 10\nR2 2 0 5\n.op\n")
    G, I = dense_dc(sim)
    g1, g2 = 0.1, 0.2
    np.testing.assert_allclose(G, [[g1, -g1], [-g1, g1 + g2]])
    np.testing.assert_allclose(I, [0.0, 0.0])


def test_zero_resistor_skipped():
    sim = build("R1 1 0 0\nR2 1 0 2\n.op\n")
    G, I = dense_dc(sim)
    np.testing.assert_allclose(G, [[0.5]])


def test_current_source_stamp():
    # I from p->m: I(p) -= val, I(m) += val (element.cpp:60-65)
    sim = build("I1 1 2 1m\nR1 1 0 1\nR2 2 0 1\n.op\n")
    G, I = dense_dc(sim)
    np.testing.assert_allclose(I, [-1e-3, 1e-3])


def test_voltage_source_stamp():
    sim = build("V1 1 0 5\nR1 1 2 10\nR2 2 0 10\n.op\n")
    G, I = dense_dc(sim)
    # unknowns: V(1)=0, V(2)=1, I(V1)=2
    expect_G = np.array([
        [0.1, -0.1, 1.0],
        [-0.1, 0.2, 0.0],
        [1.0, 0.0, 0.0],
    ])
    np.testing.assert_allclose(G, expect_G)
    np.testing.assert_allclose(I, [0.0, 0.0, 5.0])


def test_capacitor_open_in_dc():
    sim = build("C1 1 0 1u\nR1 1 0 1\n.op\n")
    G, I = dense_dc(sim)
    np.testing.assert_allclose(G, [[1.0]])


def test_inductor_short_in_dc():
    sim = build("L1 1 2 1n\nR1 1 0 1\nR2 2 0 1\n.op\n")
    G, I = dense_dc(sim)
    # unknowns: V(1)=0, V(2)=1, I(L1)=2; inductor = 0V source
    expect_G = np.array([
        [1.0, 0.0, 1.0],
        [0.0, 1.0, -1.0],
        [1.0, -1.0, 0.0],
    ])
    np.testing.assert_allclose(G, expect_G)
    np.testing.assert_allclose(I, [0.0, 0.0, 0.0])


MODEL = ".MODEL 2 VT 0.5 MU 1e-2 COX 1e-3 LAMBDA 0.1 CJ0 1e-14\n"
PMODEL = ".MODEL 1 VT -0.5 MU 1e-2 COX 1e-3 LAMBDA 0.1 CJ0 1e-14\n"


def ref_mos(vth, k, lam, p, vd, vg, vs, off_gds=1e-12):
    """Literal scalar transcription of element.cpp:181-307 used as oracle."""
    vgs_eff = p * (vg - vs)
    vds_eff = p * (vd - vs)
    on = vgs_eff > vth and vds_eff >= 0
    if on:
        vov = vgs_eff - vth
        if vds_eff < vov:
            ids0 = k * (vov * vds_eff - 0.5 * vds_eff ** 2)
            gds0 = k * (vov - vds_eff)
            gm0 = k * vds_eff
        else:
            ids0 = 0.5 * k * vov * vov
            gds0 = 0.0
            gm0 = k * vov
    else:
        ids0, gm0, gds0 = 0.0, 0.0, off_gds
    factor = max(1.0 + lam * vds_eff, 0.0)
    ids = p * ids0 * factor
    gd = gds0 * factor + ids0 * lam
    gg = gm0 * factor
    gs = -(gd + gg)
    cst = ids - gd * vd - gg * vg - gs * vs
    return gd, gg, gs, cst


@pytest.mark.parametrize("p", [1.0, -1.0])
@pytest.mark.parametrize("vd,vg,vs", [
    (0.0, 0.0, 0.0),       # off
    (2.0, 1.5, 0.0),       # NMOS saturation / PMOS off
    (0.3, 1.5, 0.0),       # NMOS triode
    (-0.5, 1.5, 0.0),      # Vds < 0: off (no D/S swap in the reference)
    (0.0, -1.5, 2.0),      # PMOS regions
    (1.7, -1.5, 2.0),
    (2.0, 0.51, 0.0),      # barely on
])
def test_mos_linearize_matches_reference_math(p, vd, vg, vs):
    vth, k, lam = 0.5, 2e-3, 0.1
    out = mos_linearize(*[jnp.asarray([v]) for v in (vth, k, lam, p)],
                        jnp.asarray([vd]), jnp.asarray([vg]), jnp.asarray([vs]))
    ref = ref_mos(vth, k, lam, p, vd, vg, vs)
    for a, b in zip(out, ref):
        assert float(a[0]) == pytest.approx(b, rel=1e-14, abs=1e-300)


def test_mos_full_stamp_into_matrix():
    sim = build(MODEL + "M1 1 2 0 n 10e-6 1e-6 2\nR1 1 0 1k\nR2 2 0 1k\n.op\n")
    x = jnp.asarray([2.0, 1.5])  # V(d)=2, V(g)=1.5, s grounded
    G, I = dense_dc(sim, x=x)
    k = 1e-2 * 1e-3 * 10.0
    gd, gg, gs, cst = ref_mos(0.5, k, 0.0, 1.0, 2.0, 1.5, 0.0)
    # with LAMBDA 0.1:
    gd, gg, gs, cst = ref_mos(0.5, k, 0.1, 1.0, 2.0, 1.5, 0.0)
    expect_G = np.array([
        [1e-3 + gd, gg],
        [0.0, 1e-3],   # gate row gets no conductance (Ig=0)
    ])
    np.testing.assert_allclose(G, expect_G, rtol=1e-12)
    np.testing.assert_allclose(I, [-cst, 0.0], rtol=1e-12)


def test_mos_source_row_and_ground_dump():
    # source at node 3 (not ground): S row gets -gd,-gg,-gs and +cst
    sim = build(MODEL + "M1 1 2 3 n 10e-6 1e-6 2\n"
                "R1 1 0 1\nR2 2 0 1\nR3 3 0 1\n.op\n")
    x = jnp.asarray([2.0, 1.6, 0.1])
    G, I = dense_dc(sim, x=x)
    k = 1e-2 * 1e-3 * 10.0
    gd, gg, gs, cst = ref_mos(0.5, k, 0.1, 1.0, 2.0, 1.6, 0.1)
    expect_G = np.array([
        [1 + gd, gg, gs],
        [0, 1, 0],
        [-gd, -gg, 1 - gs],
    ])
    np.testing.assert_allclose(G, expect_G, rtol=1e-12)
    np.testing.assert_allclose(I, [-cst, 0, cst], rtol=1e-12)


def test_gmin_stamped_on_node_rows_only():
    sim = build("V1 1 0 1\nR1 1 2 1\nR2 2 0 1\n.op\n")
    G0, _ = dense_dc(sim, gmin=0.0)
    G1, _ = dense_dc(sim, gmin=1e-3)
    D = G1 - G0
    np.testing.assert_allclose(np.diag(D), [1e-3, 1e-3, 0.0])
    assert np.count_nonzero(D) == 2  # branch row diagonal untouched


def test_mos_reverse_region_symmetry():
    """With mos_reverse_region the Level-1 device is symmetric: swapping the
    physical D/S terminals negates Ids; in reference mode reverse bias leaks
    gds=1e-12 (element.cpp:223 has no swap handling)."""
    import jax.numpy as jnp
    from circuitsimulator_tpu.models.mosfet import mos_linearize
    vth = jnp.array([0.7]); k = jnp.array([1e-3])
    lam = jnp.array([0.0]); p = jnp.array([1.0])
    vd, vg, vs = jnp.array([0.2]), jnp.array([2.0]), jnp.array([1.0])
    # reverse-biased (vds_eff = -0.8): reference mode -> off leak only
    gd, gg, gs, cst = mos_linearize(vth, k, lam, p, vd, vg, vs)
    ids_ref = float((gd * vd + gg * vg + gs * vs + cst)[0])
    assert abs(ids_ref) < 1e-18          # off: zero current at the point...
    assert abs(float(gd[0]) - 1e-12) < 1e-20   # ...with the gmin leak slope
    # symmetric mode: equals minus the mirrored forward device's current
    gd, gg, gs, cst = mos_linearize(vth, k, lam, p, vd, vg, vs,
                                    reverse_region=True)
    ids_sym = float((gd * vd + gg * vg + gs * vs + cst)[0])
    gdf, ggf, gsf, cstf = mos_linearize(vth, k, lam, p, vs, vg, vd)
    ids_fwd = float((gdf * vs + ggf * vg + gsf * vd + cstf)[0])
    assert abs(ids_sym + ids_fwd) < 1e-15
    assert ids_fwd > 1e-5  # the mirrored device really conducts


def test_mos_reverse_region_pass_transistor_dc():
    """NMOS pass transistor discharging: gate high, 'source' node above
    'drain' node.  Reference mode leaves the output floating near its gmin
    level; symmetric mode conducts and pulls the divider to the real value."""
    import jax.numpy as jnp
    from circuitsimulator_tpu.utils.options import DEFAULT_OPTIONS
    net = """\
VG g 0 5
VIN in 0 2
M1 out g in n 10u 1u 1
RL out 0 10k
.MODEL 1 VT 0.7 MU 5e-2 COX 2e-3 LAMBDA 0.0
.OP
"""
    o = DEFAULT_OPTIONS.replace(dtype=jnp.float64)
    # M1: drain=out (low), source=in (high) -> vds_eff < 0 at the solution
    sim_ref = Simulator.from_text(net, opts=o)
    sim_sym = Simulator.from_text(net, opts=o.replace(
        mos_reverse_region=True, strict_reference_mode=False))
    out_eq = sim_ref.circuit.nodes[sim_ref.circuit.node_name_to_id["out"]].eq_index
    v_ref = float(np.asarray(sim_ref.dc())[out_eq])
    v_sym = float(np.asarray(sim_sym.dc())[out_eq])
    assert v_ref < 1e-3          # reference: device "off", out ~ 0
    assert 1.5 < v_sym <= 2.0    # symmetric: conducts, out pulls near VIN
