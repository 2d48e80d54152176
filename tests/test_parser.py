"""Parser tests against the reference's accepted grammar and quirks
(src/parser.cpp; SURVEY.md §2 parser feature matrix)."""

import pytest

from circuitsimulator_tpu.netlist.parser import parse_netlist_text
from circuitsimulator_tpu.netlist.circuit import (
    WAVE_SIN, WAVE_NONE, KIND_R, KIND_V, KIND_M,
)


def test_devices_and_nodes_creation_order():
    ckt, sim = parse_netlist_text(
        "VDD 103 0 DC 3\nVin 101 0 SIN 1.5 2 10e6 0\nRin 101 102 10\n")
    assert [n.name for n in ckt.nodes] == ["103", "0", "101", "102"]
    ckt.assign_equation_indices()
    eq = {n.name: n.eq_index for n in ckt.nodes}
    assert eq == {"103": 0, "0": -1, "101": 1, "102": 2}
    assert ckt.elements[0].branch_eq == 3
    assert ckt.elements[1].branch_eq == 4


def test_vsource_forms():
    ckt, _ = parse_netlist_text(
        "V1 1 0 5\nV2 2 0 DC 3.3\nV3 3 0 SIN 1 0.5 1e6\n"
        "V4 4 0 DC 1 SIN 0 1 2e6 1n 0.5\n")
    v1, v2, v3, v4 = ckt.elements
    assert v1.spec.dc == 5.0 and v1.spec.wave.kind == WAVE_NONE
    assert v2.spec.dc == 3.3
    assert v3.spec.dc == 0.0 and v3.spec.wave.kind == WAVE_SIN
    assert v3.spec.wave.v0 == 1.0 and v3.spec.wave.va == 0.5
    assert v4.spec.dc == 1.0 and v4.spec.wave.kind == WAVE_SIN
    assert v4.spec.wave.std == 1e-9 and v4.spec.wave.phi == 0.5


def test_sin_fifth_arg_is_delay_not_phase():
    # dbmixer.sp:30 writes "SIN 1 0.6 900e6 180" meaning 180 deg, but the
    # reference parses arg 4 as a *delay in seconds* (parser.cpp:330) — the
    # source is therefore constant at v0 for any practical sim time.
    ckt, _ = parse_netlist_text("Vlo- 164 0 SIN 1 0.6 900e6 180\n")
    w = ckt.elements[0].spec.wave
    assert w.std == 180.0 and w.phi == 0.0


def test_sin_too_few_params_keeps_dc_only():
    ckt, _ = parse_netlist_text("V1 1 0 SIN 1 2\n")
    e = ckt.elements[0]
    assert e.spec.wave.kind == WAVE_NONE and e.spec.dc == 0.0


def test_isource_no_waveform():
    ckt, _ = parse_netlist_text("I1 1 0 1m\nI2 2 0 DC 2m\n")
    assert ckt.elements[0].spec.dc == pytest.approx(1e-3)
    assert ckt.elements[1].spec.dc == pytest.approx(2e-3)


def test_mosfet_7_and_8_token_forms():
    text = (".MODEL 1 VT -0.75 MU 5e-2 COX 0.3e-4 LAMBDA 0.05 CJ0 4.0e-14\n"
            ".MODEL 2 VT 0.83 MU 1.5e-1 COX 0.3e-4\n"
            "M1 107 102 103 p 30e-6 0.35e-6 1\n"   # 8-token: p/n ignored
            "M2 104 105 106 2 10e-6 0.35e-6\n")    # 7-token: model at [4]
    ckt, _ = parse_netlist_text(text)
    m1, m2 = ckt.elements
    assert m1.is_p is True
    assert m1.vth == pytest.approx(0.75)
    assert m1.k == pytest.approx(5e-2 * 0.3e-4 * (30e-6 / 0.35e-6))
    assert m2.is_p is False and m2.vth == pytest.approx(0.83)
    # bulk forced to node "0"
    assert ckt.nodes[m1.node_ids[3]].name == "0"


def test_mosfet_model_prescan():
    # model defined AFTER the device (pass-1 prescan, parser.cpp:141-148)
    ckt, _ = parse_netlist_text(
        "M1 1 2 3 n 1e-6 1e-6 9\n.MODEL 9 VT 0.5 MU 1e-2 COX 1e-3\n")
    assert len(ckt.elements) == 1
    assert ckt.elements[0].kind == KIND_M


def test_mosfet_unknown_model_skipped():
    ckt, _ = parse_netlist_text("M1 1 2 3 n 1e-6 1e-6 9\n")
    assert len(ckt.elements) == 0
    assert len(ckt.nodes) == 0  # model check happens before node creation


def test_mosfet_wrong_token_count_skipped():
    ckt, _ = parse_netlist_text(
        ".MODEL 1 VT 0.5\nM1 1 2 3 1\nM2 1 2 3 4 5 6 7 8 9\n")
    assert len(ckt.elements) == 0


def test_model_card_negative_vt_means_pmos():
    ckt, _ = parse_netlist_text(".MODEL 1 VT -0.58281 MU 1e-2 COX 6e-3\n")
    m = ckt.mos_models["1"]
    assert m.is_p is True and m.vt == pytest.approx(0.58281)


def test_model_card_cjo_alias_and_defaults():
    ckt, _ = parse_netlist_text(".MODEL 5 CJO 1e-13\n")
    m = ckt.mos_models["5"]
    assert m.cj0 == pytest.approx(1e-13)
    assert m.vt == 0.7 and m.mu == 1e-3 and m.cox == 1e-3 and m.lam == 0.0


def test_title_line_ignored():
    ckt, _ = parse_netlist_text("* title comment\nhello world\nR1 1 0 1\n")
    assert len(ckt.elements) == 1
    assert ckt.elements[0].kind == KIND_R


def test_dot_cards():
    _, sim = parse_netlist_text(
        "R1 1 0 1\n.TRAN 1e-9 300e-9\n.hb 1e-2 3\n"
        ".AC dec 10 1 1e6\n.DC V1 0 5 0.1\n.PLOTNV 101 118\n"
        ".print tran V(1) V(1,2) I(R1)\n.end\n")
    assert sim.tran.enabled and sim.tran.tstep == 1e-9 and sim.tran.tstop == 300e-9
    assert sim.hb.enabled and sim.hb.f0 == 1e-2 and sim.hb.n_harm == 3
    assert sim.ac.enabled and sim.ac.sweep_type == "dec" and sim.ac.n_points == 10
    assert sim.dc_sweeps[0].source_name == "V1" and sim.dc_sweeps[0].stop == 5
    nv = sim.print_commands[0]
    assert [p.node1 for p in nv.probes] == ["101", "118"]
    pr = sim.print_commands[1]
    assert pr.analysis == "tran"
    assert pr.probes[0].kind == "nv" and pr.probes[0].node1 == "1"
    assert pr.probes[1].kind == "dv" and pr.probes[1].node2 == "2"
    assert pr.probes[2].kind == "br" and pr.probes[2].ele_name == "R1"
    assert sim.do_op is False


def test_default_op_when_no_analysis():
    _, sim = parse_netlist_text("R1 1 0 1\n")
    assert sim.do_op is True


def test_tran_optional_tstart():
    _, sim = parse_netlist_text("R1 1 0 1\n.TRAN 1n 10n 2n\n")
    assert sim.tran.tstart == pytest.approx(2e-9)


def test_bundled_netlists_counts():
    ckt, sim = parse_netlist_text(open("tests/netlists/buffer.sp").read())
    ckt.assign_equation_indices()
    assert len(ckt.nodes) == 10
    assert len(ckt.elements) == 14
    assert ckt.num_unknowns() == 13
    assert ckt.num_node_equations() == 9

    ckt2, sim2 = parse_netlist_text(open("tests/netlists/dbmixer.sp").read())
    ckt2.assign_equation_indices()
    assert len(ckt2.nodes) == 22
    assert len(ckt2.elements) == 26
    assert ckt2.num_unknowns() == 31


def test_mosfet_standard_kv_form():
    """`M d g s b model W=.. L=..` (extension) next to the reference's
    positional forms; the bulk token is accepted and ignored (the
    reference ties bulk to ground, circuit.cpp:142)."""
    from circuitsimulator_tpu.netlist.parser import parse_netlist_text
    text = (".MODEL nm vt 0.7 mu 350u cox 2.3m\n"
            "M1 d g 0 0 nm W=10u L=1u\n"
            "M2 d g 0 nm 10u 1u\n"
            "Vd d 0 1\nVg g 0 1\n.op\n")
    ckt, _ = parse_netlist_text(text)
    mos = [e for e in ckt.elements if e.kind == "M"]
    assert len(mos) == 2
    assert mos[0].k == mos[1].k         # same W/L -> same K
    assert mos[0].node_ids == mos[1].node_ids


def test_mosfet_kv_form_native_parity():
    from circuitsimulator_tpu import native
    if not native.available():
        import pytest
        pytest.skip("native frontend not built")
    import dataclasses
    from circuitsimulator_tpu.netlist.parser import parse_netlist_text
    text = (".MODEL nm vt 0.7 mu 350u cox 2.3m\n"
            "M1 d g s vdd nm W=2.5u L=0.18u\n"
            "Rs s 0 1k\nVd d 0 1\nVg g 0 1\nVdd vdd 0 1\n.op\n")
    ckt_py, _ = parse_netlist_text(text)
    ckt_nat, _ = native.parse_netlist_text_native(text)
    ckt_py.assign_equation_indices()
    ckt_nat.assign_equation_indices()
    assert ([n.name for n in ckt_nat.nodes]
            == [n.name for n in ckt_py.nodes])
    for a, b in zip(ckt_nat.elements, ckt_py.elements):
        assert dataclasses.asdict(a) == dataclasses.asdict(b), (a, b)
