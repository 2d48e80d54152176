"""Ebers-Moll BJT model (extension; the reference has no BJT)."""

import numpy as np
import jax.numpy as jnp
import pytest

from circuitsimulator_tpu.api import Simulator
from circuitsimulator_tpu.models.bjt import bjt_linearize
from circuitsimulator_tpu.models.diode import VT_THERMAL
from circuitsimulator_tpu.utils.options import DEFAULT_OPTIONS

CE_AMP = (".MODEL qn NPN IS=1e-15 BF=120 BR=2\n"
          "VCC 1 0 5\nVin 2 0 DC 0.65\nRB 2 3 10k\nRC 1 4 2k\n"
          "Q1 4 3 0 qn\n.op\n")


def a(x):
    return np.asarray(x)


def test_bjt_linearize_gradients_match_fd():
    # finite-difference check of the analytic Jacobian
    import itertools
    i_sat, bf, br = jnp.asarray([1e-15]), jnp.asarray([100.0]), jnp.asarray([1.5])
    for p in (1.0, -1.0):
        pj = jnp.asarray([p])
        base = (0.3 * p, 0.72 * p, 0.0)

        def currents(vc, vb, ve):
            (gc_c, gc_b, gc_e, cc), (gb_c, gb_b, gb_e, cb) = bjt_linearize(
                i_sat, bf, br, pj, jnp.asarray([vc]), jnp.asarray([vb]),
                jnp.asarray([ve]))
            ic = gc_c * vc + gc_b * vb + gc_e * ve + cc
            ib = gb_c * vc + gb_b * vb + gb_e * ve + cb
            return float(ic[0]), float(ib[0])

        (gc_c, gc_b, gc_e, _), (gb_c, gb_b, gb_e, _) = bjt_linearize(
            i_sat, bf, br, pj, *[jnp.asarray([v]) for v in base])
        grads = {"c": (float(gc_c[0]), float(gb_c[0])),
                 "b": (float(gc_b[0]), float(gb_b[0])),
                 "e": (float(gc_e[0]), float(gb_e[0]))}
        h = 1e-6
        for i, term in enumerate("cbe"):
            hi = list(base)
            lo = list(base)
            hi[i] += h
            lo[i] -= h
            ic_hi, ib_hi = currents(*hi)
            ic_lo, ib_lo = currents(*lo)
            assert grads[term][0] == pytest.approx((ic_hi - ic_lo) / (2 * h),
                                                   rel=1e-3), (p, term)
            assert grads[term][1] == pytest.approx((ib_hi - ib_lo) / (2 * h),
                                                   rel=1e-3), (p, term)


def test_bjt_common_emitter_dc():
    sim = Simulator.from_text(CE_AMP)
    x = a(sim.dc())
    # nodes: 1=VCC(5V), 2=0.65, 3=base, 4=collector
    v1, v2, v3, v4 = x[0], x[1], x[2], x[3]
    assert v1 == pytest.approx(5.0, abs=1e-6)
    assert v2 == pytest.approx(0.65, abs=1e-9)
    # base-emitter junction forward biased around 0.55-0.65 V
    assert 0.5 < v3 < 0.66
    # collector pulled down but above saturation
    assert 0.2 < v4 < 4.9
    # current gain at the solved operating point is exactly BF in
    # forward-active (reconstruct the device currents from the model;
    # the resistor-current ratio is ~87 because the DC gmin leak at the
    # high-impedance base node absorbs ~30% of the tiny base current)
    rc, rb = bjt_linearize(
        jnp.asarray([1e-15]), jnp.asarray([120.0]), jnp.asarray([2.0]),
        jnp.asarray([1.0]), jnp.asarray([v4]), jnp.asarray([v3]),
        jnp.asarray([0.0]))
    ic_dev = float(rc[0][0] * v4 + rc[1][0] * v3 + rc[3][0])
    ib_dev = float(rb[0][0] * v4 + rb[1][0] * v3 + rb[3][0])
    assert ic_dev / ib_dev == pytest.approx(120.0, rel=1e-6)
    # and KCL at the collector: RC current equals device Ic plus gmin leak
    assert (v1 - v4) / 2e3 == pytest.approx(ic_dev + v4 * 3.35e-7, rel=1e-3)


def test_bjt_ebers_moll_balance():
    # with Vbe = Vbc (both junctions equally biased) Ic is small while
    # Ib carries both recombination terms
    i_sat, bf, br = (jnp.asarray([1e-15]), jnp.asarray([50.0]),
                     jnp.asarray([1.0]))
    v = 0.6
    (gc_c, gc_b, gc_e, cc), (gb_c, gb_b, gb_e, cb) = bjt_linearize(
        i_sat, bf, br, jnp.asarray([1.0]),
        jnp.asarray([0.0]), jnp.asarray([v]), jnp.asarray([0.0]))
    ic = float(cc[0] + gc_b[0] * v)
    ib = float(cb[0] + gb_b[0] * v)
    ifwd = 1e-15 * (np.exp(v / VT_THERMAL) - 1)
    assert ic == pytest.approx(-ifwd / 1.0, rel=1e-9)  # Ic = -Ir/br - 0
    assert ib == pytest.approx(ifwd / 50 + ifwd / 1.0, rel=1e-9)


def test_bjt_transient_woodbury_equals_lu():
    text = (".MODEL qn NPN IS=1e-15 BF=120 BR=2\n"
            "VCC 1 0 5\nVin 2 0 SIN 0.7 0.02 1e7\nRB 2 3 10k\n"
            "RC 1 4 2k\nQ1 4 3 0 qn\nCL 4 0 1e-12\n.TRAN 1e-9 3e-7\n")
    o_lu = DEFAULT_OPTIONS.replace(dtype=jnp.float64, tran_solver="lu")
    o_wb = DEFAULT_OPTIONS.replace(dtype=jnp.float64, tran_solver="woodbury")
    r_lu = Simulator.from_text(text, opts=o_lu).transient()
    r_wb = Simulator.from_text(text, opts=o_wb).transient()
    assert not bool(r_lu.failed)
    np.testing.assert_allclose(a(r_wb.xs), a(r_lu.xs), rtol=0, atol=1e-9)
    # it amplifies: output swing > input swing
    v4 = a(r_lu.xs)[:, 3]
    assert (v4.max() - v4.min()) > 0.1


def test_bjt_pnp():
    text = (".MODEL qp PNP IS=1e-15 BF=80\n"
            "VEE 1 0 5\nVin 2 0 DC 4.35\nRB 2 3 10k\nRC 4 0 2k\n"
            "Q1 4 3 1 qp\n.op\n")
    sim = Simulator.from_text(text)
    x = a(sim.dc())
    v3, v4 = x[2], x[3]
    # emitter at 5 V: base sits ~0.6 V below it, collector pulled up from 0
    assert 4.3 < v3 < 4.5
    assert 0.05 < v4 < 4.0


def test_bjt_native_frontend_parity():
    from circuitsimulator_tpu import native
    if not native.available():
        pytest.skip("native frontend not built")
    from circuitsimulator_tpu.netlist.parser import parse_netlist_text
    import dataclasses
    ckt_py, _ = parse_netlist_text(CE_AMP)
    ckt_nat, _ = native.parse_netlist_text_native(CE_AMP)
    ckt_py.assign_equation_indices()
    ckt_nat.assign_equation_indices()
    assert [dataclasses.asdict(e) for e in ckt_nat.elements] == \
        [dataclasses.asdict(e) for e in ckt_py.elements]
