"""Frontend-parity fuzzing: random netlists over the FULL grammar (all
device classes, controlled sources, subcircuits, every dot card) must lower
identically through the Python and native C++ frontends, down to exact DC
equality."""

import dataclasses
import random

import numpy as np
import pytest

from circuitsimulator_tpu.api import Simulator


def gen_netlist(rng: random.Random) -> str:
    nodes = [str(i) for i in range(1, rng.randint(4, 7) + 1)]
    pick = lambda: rng.choice(nodes + ["0"])
    lines = ["* fuzz netlist"]
    lines.append(".SUBCKT blk p q PARAMS: rr=1k sc=1")
    lines.append(".PARAM rleak={rr*100}")
    lines.append(f"Rb1 p m {{rr*sc}}")
    lines.append(f"Rb2 m q {rng.randint(100, 9999)}")
    lines.append(f"Cb m 0 {rng.choice(['1p', '0.5p'])}")
    lines.append("Rbl m 0 {rleak}")
    lines.append(".ENDS")
    tn = rng.choice(["", " TRNOISE(1m 0)", " TRNOISE(2m 1n 1.5 0.5m)"])
    lines.append(f"V1 1 0 SIN {round(rng.uniform(0.5, 2), 3)} "
                 f"{round(rng.uniform(0.05, 0.3), 3)} 5e6 AC 1 30" + tn)
    itn = rng.choice(["", " TRNOISE(1u)", " TRNOISE(2u 2n 0.8 1u)"])
    lines.append(f"I1 {pick()} 0 DC {round(rng.uniform(-1e-3, 1e-3), 6)}"
                 + itn)
    lines.append(".MODEL 2 VT 0.6 MU 2e-2 COX 1e-3 LAMBDA 0.03 CJ0 1e-14 "
                 "KF 1e-24 AF 1.2")
    lines.append(".MODEL qq NPN IS=2e-15 BF=80 BR=2")
    lines.append(".MODEL jj NJF VTO=-1.5 BETA=2e-4 LAMBDA=0.01")
    lines.append(".MODEL ss SW RON=2 ROFF=1e8 VT=0.5 VH=0.2")
    lines.append(".MODEL cs CSW RON=3 ROFF=1e8 IT=1m IH=0.1m")
    lines.append(f".PARAM rbase={rng.randint(100, 999)} "
                 f"rtop={{2*rbase + min(rbase, 500)}}")
    eid = 0
    for _ in range(rng.randint(3, 8)):
        eid += 1
        a, b = rng.sample(nodes, 2)
        r = rng.random()
        if r < 0.25:
            tail = rng.choice(["", " M=2", " DEV=5% LOT=2%", " M=3 DEV=0.1"])
            lines.append(f"R{eid} {a} {b} {round(10 ** rng.uniform(2, 4))}"
                         + tail)
        elif r < 0.35:
            tail = rng.choice(["", " IC=0.2", " M=2 IC = 0.1", " DEV=3%"])
            lines.append(f"C{eid} {a} {b} 1p" + tail)
        elif r < 0.42:
            tail = rng.choice(["", " IC=1m", " M=4"])
            lines.append(f"L{eid} {a} {b} 10n" + tail)
        elif r < 0.5:
            if rng.random() < 0.5:
                lines.append(f"M{eid} {a} {pick()} {b} n 5e-6 1e-6 2")
            else:
                tail = rng.choice(["", " DEV=4%", " M=2", " M=2 DEV=0.05"])
                lines.append(f"M{eid} {a} {pick()} {b} bulk 2 "
                             f"W=5e-6 L=1e-6" + tail)
        elif r < 0.56:
            tail = rng.choice(["", " DEV=0.1", " M=3", " LOT=5%"])
            lines.append(f"D{eid} {a} {b} IS=1e-14 N=1.1" + tail)
        elif r < 0.62:
            tail = rng.choice(["", " DEV=8%", " M=2"])
            lines.append(f"Q{eid} {a} {pick()} {b} qq" + tail)
        elif r < 0.7:
            lines.append(f"E{eid} {a} {b} {pick()} {pick()} "
                         f"{round(rng.uniform(0.5, 5), 2)}")
        elif r < 0.78:
            lines.append(f"G{eid} {a} {b} {pick()} {pick()} 1e-3")
        elif r < 0.86:
            lines.append(f"F{eid} {a} {b} V1 {round(rng.uniform(0.5, 2), 2)}")
        elif r < 0.9:
            lines.append(f"H{eid} {a} {b} V1 {rng.randint(10, 999)}")
        elif r < 0.94:
            lines.append(f"J{eid} {a} {pick()} {b} jj")
        elif r < 0.97:
            lines.append(f"S{eid} {a} {b} {pick()} 0 ss"
                         + (" ON" if rng.random() < 0.3 else ""))
        else:
            tail = rng.choice(["", " rr=2k", " PARAMS: rr={rbase} sc=2",
                               " sc = 3"])
            lines.append(f"X{eid} {a} {b} blk" + tail)
    # fixed instances of the remaining classes (well-posed by construction)
    lines.append("La 1 0 10n")
    lines.append("Lb 2 0 40n")
    lines.append(f"Kxf La Lb {round(rng.uniform(0.1, 0.95), 3)}")
    lines.append("Wsw 3 0 V1 cs")
    lines.append(f"Ttl 1 0 4 0 Z0={rng.randint(25, 99)} TD=2n")
    lines.append("Rpar 5 0 {rtop}")
    lines.append("Bbv 6 0 V=0.5*v(1) + 0.1*tanh(v(2))")
    lines.append("Bbi 5 0 I=1u*v(5) + 2u*i(V1)")
    # every leaf node gets a leak so the DC system stays well-posed
    for n in nodes:
        lines.append(f"Rleak{n} {n} 0 1meg")
    lines.append(".TRAN 1e-9 1e-7 0 UIC" if rng.random() < 0.3
                 else ".TRAN 1e-9 1e-7")
    lines.append(".AC dec 3 1e3 1e6")
    lines.append(".hb 5e6 4 7e6 2")
    lines.append(f".NOISE V({rng.choice(nodes)}) V1 dec 2 1e2 1e4")
    lines.append(f".FOUR 5e6 V({rng.choice(nodes)})")
    lines.append(f".IC V({rng.choice(nodes)})=0.25")
    lines.append(".TEMP 85")
    lines.append(f".DC V1 0 1 0.5")
    lines.append(f".PRINT TRAN V({rng.choice(nodes)}) I(V1)")
    lines.append(f".PLOTNV {rng.choice(nodes)}")
    lines.append(f".TF V({rng.choice(nodes)}) V1")
    lines.append(f".MEASURE TRAN mrms RMS V({rng.choice(nodes)}) "
                 f"FROM=0 TO=5e-8")
    lines.append(f".MEASURE TRAN mw WHEN V({rng.choice(nodes)})=0.3 RISE=1")
    lines.append(".STEP PARAM rbase LIST 100 200")
    return "\n".join(lines) + "\n"


def canon_elements(ckt):
    out = []
    for e in ckt.elements:
        out.append((e.kind, e.name,
                    tuple(ckt.nodes[i].name for i in e.node_ids),
                    e.value, e.is_p, e.vth, e.k, e.lam, e.cj0, e.kf, e.af,
                    e.i_sat, e.n_ideal, e.bf, e.br, e.ctrl_name,
                    e.branch_eq,
                    e.ctrl2_name, e.ron, e.roff, e.s_vt, e.s_vh,
                    e.z0, e.td, e.branch_eq2, e.b_expr, e.b_is_v,
                    None if e.spec is None else
                    (e.spec.dc, e.spec.ac_mag, e.spec.ac_phase_deg,
                     e.spec.wave.kind, e.spec.tn_na, e.spec.tn_nt,
                     e.spec.tn_alpha, e.spec.tn_namp)))
    return out


@pytest.mark.parametrize("seed", range(8))
def test_frontends_identical(seed):
    text = gen_netlist(random.Random(31000 + seed))
    sims = {fe: Simulator.from_text(text, frontend=fe)
            for fe in ("python", "native")}
    py, nat = sims["python"], sims["native"]

    # node tables
    assert ([n.name for n in py.circuit.nodes]
            == [n.name for n in nat.circuit.nodes])
    assert ([n.eq_index for n in py.circuit.nodes]
            == [n.eq_index for n in nat.circuit.nodes])
    # elements, bit-for-bit parameters
    assert canon_elements(py.circuit) == canon_elements(nat.circuit)
    # simulation config
    for field in ("do_op", "ics", "temp_c"):
        assert getattr(py.config, field) == getattr(nat.config, field), field
    assert dataclasses.asdict(py.config.tran) == dataclasses.asdict(nat.config.tran)
    assert dataclasses.asdict(py.config.ac) == dataclasses.asdict(nat.config.ac)
    assert dataclasses.asdict(py.config.four)["f0"] == \
        dataclasses.asdict(nat.config.four)["f0"]
    assert py.config.hb.tones == nat.config.hb.tones
    assert (py.config.noise.out_node, py.config.noise.input_source) == \
        (nat.config.noise.out_node, nat.config.noise.input_source)
    assert len(py.config.dc_sweeps) == len(nat.config.dc_sweeps) == 1
    assert py.config.param_values == nat.config.param_values
    assert dataclasses.asdict(py.config.tf) == dataclasses.asdict(nat.config.tf)
    assert ([dataclasses.asdict(s) for s in py.config.steps]
            == [dataclasses.asdict(s) for s in nat.config.steps])
    def canon_measure(m):
        d = dataclasses.asdict(m)
        for p in (d["probe"], d["ev1"]["probe"], d["ev2"]["probe"]):
            p.pop("expr")    # the native frontend carries no raw text
        return d

    assert ([canon_measure(m) for m in py.config.measures]
            == [canon_measure(m) for m in nat.config.measures])
    # identical lowering -> identical DC trajectory, bit for bit
    np.testing.assert_array_equal(np.asarray(py.dc()), np.asarray(nat.dc()))
