"""Lowering: host-side Circuit -> flat device-parameter arrays + index maps.

This replaces the reference's polymorphic per-element stamp dispatch
(src/element.cpp, src/circuit.cpp) with a TPU-friendly struct-of-arrays IR:
all devices of a class are evaluated as one vectorized op, and MNA assembly
is a precomputed scatter-add (see ops/assemble.py).

Conventions:
- Equation indices follow the reference ordering (src/circuit.cpp:42-61):
  non-ground nodes in creation order get 0..n_node_eq-1, then V-source and
  inductor branch currents in element order.  This makes CSV column order and
  DC tables match byte-for-byte.
- Ground (eq_index -1) is mapped to the "dump slot" N: the MNA system is
  assembled into an (N+1)x(N+1) matrix / (N+1) RHS whose last row/column is
  discarded, which implements the reference's "skip stamps touching ground"
  rule (element.cpp:26-31 et al.) without branches.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import numpy as np
import jax.numpy as jnp

from ..netlist.circuit import (
    Circuit, KIND_R, KIND_C, KIND_L, KIND_V, KIND_I, KIND_M, KIND_D, KIND_Q,
    KIND_E, KIND_G, KIND_F, KIND_H, KIND_K, KIND_S, KIND_W, KIND_J, KIND_T,
    KIND_B,
)
from ..utils.numbers import is_ground_name


@dataclasses.dataclass(frozen=True)
class Topology:
    """Static (hashable-by-id) circuit structure; numpy arrays only."""
    n_unknowns: int
    n_node_eq: int
    n_nodes: int
    n_elements: int
    has_nonlinear: bool
    # eq-index arrays per device class; ground mapped to dump slot N
    node_eqs: np.ndarray          # (n_node_eq,) node equations (for gmin)
    res_e1: np.ndarray
    res_e2: np.ndarray
    cap_e1: np.ndarray
    cap_e2: np.ndarray
    ind_ep: np.ndarray
    ind_em: np.ndarray
    ind_k: np.ndarray             # branch eq (always a real eq, never dump)
    vs_ep: np.ndarray
    vs_em: np.ndarray
    vs_k: np.ndarray
    is_ep: np.ndarray
    is_em: np.ndarray
    mos_ed: np.ndarray
    mos_eg: np.ndarray
    mos_es: np.ndarray
    mos_eb: np.ndarray
    dio_ep: np.ndarray
    dio_em: np.ndarray
    bjt_ec: np.ndarray
    bjt_eb: np.ndarray
    bjt_ee: np.ndarray
    # linear controlled sources (extensions; stamps in ops/assemble.py)
    vcvs_ep: np.ndarray
    vcvs_em: np.ndarray
    vcvs_ecp: np.ndarray
    vcvs_ecm: np.ndarray
    vcvs_k: np.ndarray
    vccs_ep: np.ndarray
    vccs_em: np.ndarray
    vccs_ecp: np.ndarray
    vccs_ecm: np.ndarray
    cccs_ep: np.ndarray
    cccs_em: np.ndarray
    cccs_kc: np.ndarray           # controlling V source branch eq
    ccvs_ep: np.ndarray
    ccvs_em: np.ndarray
    ccvs_kc: np.ndarray
    ccvs_k: np.ndarray
    # mutual inductance (K card, extension): indices into the inductor class
    mut_a: np.ndarray
    mut_b: np.ndarray
    # switches (S/W, extension): W maps (ecp, ecm) to (ctrl branch eq, dump)
    sw_ep: np.ndarray
    sw_em: np.ndarray
    sw_ecp: np.ndarray
    sw_ecm: np.ndarray
    # JFETs (J, extension): same 3x3 square-law stamp shape as the MOSFET
    jf_ed: np.ndarray
    jf_eg: np.ndarray
    jf_es: np.ndarray
    # transmission lines (T, extension): two branch unknowns per line
    tl_ep1: np.ndarray
    tl_em1: np.ndarray
    tl_ep2: np.ndarray
    tl_em2: np.ndarray
    tl_k1: np.ndarray
    tl_k2: np.ndarray
    # static copies of the line delays: the transient ring-buffer length is
    # a compile-time constant (params["tl_td"] stays batchable for AC)
    tl_td_s: Tuple[float, ...]
    # output metadata
    volt_col_eqs: np.ndarray      # (n_node_eq,) eq of each V(...) CSV column
    volt_col_names: Tuple[str, ...]
    branch_col_eqs: np.ndarray    # eq of each I(...) CSV column
    branch_col_names: Tuple[str, ...]
    # DC table rows: (name, eq) for every node in creation order
    node_table: Tuple[Tuple[str, int], ...]
    # branch table rows: (kind, name, node_p_name, node_m_name, eq)
    branch_table: Tuple[Tuple[str, str, str, str, int], ...]

    @property
    def counts(self):
        return dict(
            R=len(self.res_e1), C=len(self.cap_e1), L=len(self.ind_ep),
            V=len(self.vs_ep), I=len(self.is_ep), M=len(self.mos_ed),
            D=len(self.dio_ep), Q=len(self.bjt_ec),
            E=len(self.vcvs_ep), G=len(self.vccs_ep),
            F=len(self.cccs_ep), H=len(self.ccvs_ep),
            K=len(self.mut_a), S=len(self.sw_ep), J=len(self.jf_ed),
            T=len(self.tl_k1),
        )


@dataclasses.dataclass
class BSourceInfo:
    """One lowered behavioral source (extension).

    fn(vals, t) is the compiled jnp expression over the probe values
    vals[j] = x_ext[pairs[j,0]] - x_ext[pairs[j,1]]; the Newton stamp is
    jax.value_and_grad(fn).  is_v selects the V=expr (branch row `k`)
    vs I=expr (KCL rows p/m) form."""
    name: str
    fn: Any
    pairs: np.ndarray             # (m, 2) eq-index pairs per probe
    is_v: bool
    ep: int
    em: int
    k: int                        # branch eq (V form), -1 otherwise
    uses_time: bool
    # slice of params["b_consts"] carrying this device's referenced
    # .PARAM values (dynamic — .STEP/Monte-Carlo re-bind without recompile)
    const_off: int = 0
    n_consts: int = 0


@dataclasses.dataclass
class LoweredCircuit:
    topo: Topology
    params: Dict[str, Any]        # jnp arrays; the batchable pytree
    circuit: Circuit
    b_sources: List[BSourceInfo] = dataclasses.field(default_factory=list)
    # netlist DEV=/LOT= Monte-Carlo tolerances: params key -> (dev, lot)
    # per-element relative-sigma numpy arrays; empty when the deck has none
    mc_tols: Dict[str, Any] = dataclasses.field(default_factory=dict)


def _np_i32(xs) -> np.ndarray:
    return np.asarray(xs, dtype=np.int32)


def _eq_of(ckt: Circuit, node_id: int, dump: int) -> int:
    eq = ckt.nodes[node_id].eq_index
    return eq if eq >= 0 else dump


def _pack_sources(specs, dtype):
    n = len(specs)
    dc = np.zeros(n)
    kind = np.zeros(n, dtype=np.int32)
    pulse = np.zeros((n, 7))
    sin = np.zeros((n, 5))
    pmax = max([len(s.wave.pwl_t) for s in specs], default=0)
    pmax = max(pmax, 1) if n else 0
    pwl_t = np.zeros((n, pmax))
    pwl_v = np.zeros((n, pmax))
    pwl_n = np.zeros(n, dtype=np.int32)
    ac_mag = np.zeros(n)
    ac_phase = np.zeros(n)
    tn = np.zeros((n, 4))
    for i, s in enumerate(specs):
        w = s.wave
        dc[i] = s.dc
        kind[i] = w.kind
        pulse[i] = [w.v1, w.v2, w.ptd, w.tr, w.tf, w.ton, w.per]
        sin[i] = [w.v0, w.va, w.freq, w.std, w.phi]
        ac_mag[i] = s.ac_mag
        ac_phase[i] = s.ac_phase_deg
        tn[i] = [s.tn_na, s.tn_nt, s.tn_alpha, s.tn_namp]
        m = len(w.pwl_t)
        pwl_n[i] = m
        if m:
            pwl_t[i, :m] = w.pwl_t
            pwl_v[i, :m] = w.pwl_v
    return {
        "dc": jnp.asarray(dc, dtype), "kind": jnp.asarray(kind),
        "pulse": jnp.asarray(pulse, dtype), "sin": jnp.asarray(sin, dtype),
        "pwl_t": jnp.asarray(pwl_t, dtype), "pwl_v": jnp.asarray(pwl_v, dtype),
        "pwl_n": jnp.asarray(pwl_n),
        "ac_mag": jnp.asarray(ac_mag, dtype),
        "ac_phase": jnp.asarray(ac_phase, dtype),
        "tn": jnp.asarray(tn, dtype),
    }


def lower(ckt: Circuit, dtype=jnp.float64) -> LoweredCircuit:
    """Lower a parsed Circuit (with equation indices assigned) to flat arrays."""
    if any(n.eq_index == -1 and not is_ground_name(n.name) for n in ckt.nodes):
        ckt.assign_equation_indices()
    N = ckt.num_unknowns()
    dump = N

    res = [e for e in ckt.elements if e.kind == KIND_R]
    cap = [e for e in ckt.elements if e.kind == KIND_C]
    ind = [e for e in ckt.elements if e.kind == KIND_L]
    vs = [e for e in ckt.elements if e.kind == KIND_V]
    isrc = [e for e in ckt.elements if e.kind == KIND_I]
    mos = [e for e in ckt.elements if e.kind == KIND_M]
    dio = [e for e in ckt.elements if e.kind == KIND_D]
    bjt = [e for e in ckt.elements if e.kind == KIND_Q]
    mut = [e for e in ckt.elements if e.kind == KIND_K]
    sw = [e for e in ckt.elements if e.kind in (KIND_S, KIND_W)]
    jf = [e for e in ckt.elements if e.kind == KIND_J]
    tl = [e for e in ckt.elements if e.kind == KIND_T]
    bsrc = [e for e in ckt.elements if e.kind == KIND_B]
    vcvs = [e for e in ckt.elements if e.kind == KIND_E]
    vccs = [e for e in ckt.elements if e.kind == KIND_G]
    cccs = [e for e in ckt.elements if e.kind == KIND_F]
    ccvs = [e for e in ckt.elements if e.kind == KIND_H]

    def ctrl_branch(e):
        """Branch eq of an F/H source's controlling V source (by name)."""
        for exact in (True, False):
            for el in ckt.elements:
                if el.kind != KIND_V:
                    continue
                if (el.name == e.ctrl_name) if exact \
                        else (el.name.lower() == e.ctrl_name.lower()):
                    return el.branch_eq
        raise ValueError(f"{e.name}: controlling source {e.ctrl_name!r} "
                         "is not a voltage source in this circuit")

    eq = lambda nid: _eq_of(ckt, nid, dump)

    def ind_index(kel, lname):
        """Index of an inductor within the L class by element name."""
        for exact in (True, False):
            for j, el in enumerate(ind):
                if (el.name == lname) if exact \
                        else (el.name.lower() == lname.lower()):
                    return j
        raise ValueError(f"{kel.name}: coupled inductor {lname!r} "
                         "is not an inductor in this circuit")

    mut_ok = []
    for e in mut:
        try:
            mut_ok.append((ind_index(e, e.ctrl_name),
                           ind_index(e, e.ctrl2_name), e.value))
        except ValueError as err:
            import sys
            print(f"warning: {err}; K element skipped", file=sys.stderr)

    node_eqs = _np_i32([n.eq_index for n in ckt.nodes if n.eq_index >= 0])

    volt_cols = [(n.name, n.eq_index) for n in ckt.nodes if n.eq_index >= 0]
    branch_cols = []
    branch_table = []
    for e in ckt.elements:
        if (e.kind in (KIND_V, KIND_L, KIND_E, KIND_H)
                or (e.kind == KIND_B and e.b_is_v)):
            branch_cols.append((e.name, e.branch_eq))
            branch_table.append(
                (e.kind, e.name, ckt.nodes[e.node_ids[0]].name,
                 ckt.nodes[e.node_ids[1]].name, e.branch_eq))
        elif e.kind == KIND_T:
            # one branch-current column per port
            branch_cols.append((f"{e.name}.1", e.branch_eq))
            branch_cols.append((f"{e.name}.2", e.branch_eq2))
            branch_table.append(
                (e.kind, f"{e.name}.1", ckt.nodes[e.node_ids[0]].name,
                 ckt.nodes[e.node_ids[1]].name, e.branch_eq))
            branch_table.append(
                (e.kind, f"{e.name}.2", ckt.nodes[e.node_ids[2]].name,
                 ckt.nodes[e.node_ids[3]].name, e.branch_eq2))
    node_table = tuple((n.name, n.eq_index) for n in ckt.nodes)
    branch_table = tuple(branch_table)

    topo = Topology(
        n_unknowns=N,
        n_node_eq=ckt.num_node_equations(),
        n_nodes=len(ckt.nodes),
        n_elements=len(ckt.elements),
        has_nonlinear=bool(mos or dio or bjt or sw or jf or bsrc),
        node_eqs=node_eqs,
        res_e1=_np_i32([eq(e.node_ids[0]) for e in res]),
        res_e2=_np_i32([eq(e.node_ids[1]) for e in res]),
        cap_e1=_np_i32([eq(e.node_ids[0]) for e in cap]),
        cap_e2=_np_i32([eq(e.node_ids[1]) for e in cap]),
        ind_ep=_np_i32([eq(e.node_ids[0]) for e in ind]),
        ind_em=_np_i32([eq(e.node_ids[1]) for e in ind]),
        ind_k=_np_i32([e.branch_eq for e in ind]),
        vs_ep=_np_i32([eq(e.node_ids[0]) for e in vs]),
        vs_em=_np_i32([eq(e.node_ids[1]) for e in vs]),
        vs_k=_np_i32([e.branch_eq for e in vs]),
        is_ep=_np_i32([eq(e.node_ids[0]) for e in isrc]),
        is_em=_np_i32([eq(e.node_ids[1]) for e in isrc]),
        mos_ed=_np_i32([eq(e.node_ids[0]) for e in mos]),
        mos_eg=_np_i32([eq(e.node_ids[1]) for e in mos]),
        mos_es=_np_i32([eq(e.node_ids[2]) for e in mos]),
        mos_eb=_np_i32([eq(e.node_ids[3]) for e in mos]),
        dio_ep=_np_i32([eq(e.node_ids[0]) for e in dio]),
        dio_em=_np_i32([eq(e.node_ids[1]) for e in dio]),
        bjt_ec=_np_i32([eq(e.node_ids[0]) for e in bjt]),
        bjt_eb=_np_i32([eq(e.node_ids[1]) for e in bjt]),
        bjt_ee=_np_i32([eq(e.node_ids[2]) for e in bjt]),
        vcvs_ep=_np_i32([eq(e.node_ids[0]) for e in vcvs]),
        vcvs_em=_np_i32([eq(e.node_ids[1]) for e in vcvs]),
        vcvs_ecp=_np_i32([eq(e.node_ids[2]) for e in vcvs]),
        vcvs_ecm=_np_i32([eq(e.node_ids[3]) for e in vcvs]),
        vcvs_k=_np_i32([e.branch_eq for e in vcvs]),
        vccs_ep=_np_i32([eq(e.node_ids[0]) for e in vccs]),
        vccs_em=_np_i32([eq(e.node_ids[1]) for e in vccs]),
        vccs_ecp=_np_i32([eq(e.node_ids[2]) for e in vccs]),
        vccs_ecm=_np_i32([eq(e.node_ids[3]) for e in vccs]),
        cccs_ep=_np_i32([eq(e.node_ids[0]) for e in cccs]),
        cccs_em=_np_i32([eq(e.node_ids[1]) for e in cccs]),
        cccs_kc=_np_i32([ctrl_branch(e) for e in cccs]),
        ccvs_ep=_np_i32([eq(e.node_ids[0]) for e in ccvs]),
        ccvs_em=_np_i32([eq(e.node_ids[1]) for e in ccvs]),
        ccvs_kc=_np_i32([ctrl_branch(e) for e in ccvs]),
        ccvs_k=_np_i32([e.branch_eq for e in ccvs]),
        mut_a=_np_i32([m[0] for m in mut_ok]),
        mut_b=_np_i32([m[1] for m in mut_ok]),
        sw_ep=_np_i32([eq(e.node_ids[0]) for e in sw]),
        sw_em=_np_i32([eq(e.node_ids[1]) for e in sw]),
        sw_ecp=_np_i32([eq(e.node_ids[2]) if e.kind == KIND_S
                        else ctrl_branch(e) for e in sw]),
        sw_ecm=_np_i32([eq(e.node_ids[3]) if e.kind == KIND_S
                        else dump for e in sw]),
        jf_ed=_np_i32([eq(e.node_ids[0]) for e in jf]),
        jf_eg=_np_i32([eq(e.node_ids[1]) for e in jf]),
        jf_es=_np_i32([eq(e.node_ids[2]) for e in jf]),
        tl_ep1=_np_i32([eq(e.node_ids[0]) for e in tl]),
        tl_em1=_np_i32([eq(e.node_ids[1]) for e in tl]),
        tl_ep2=_np_i32([eq(e.node_ids[2]) for e in tl]),
        tl_em2=_np_i32([eq(e.node_ids[3]) for e in tl]),
        tl_k1=_np_i32([e.branch_eq for e in tl]),
        tl_k2=_np_i32([e.branch_eq2 for e in tl]),
        tl_td_s=tuple(float(e.td) for e in tl),
        volt_col_eqs=_np_i32([c[1] for c in volt_cols]),
        volt_col_names=tuple(c[0] for c in volt_cols),
        branch_col_eqs=_np_i32([c[1] for c in branch_cols]),
        branch_col_names=tuple(c[0] for c in branch_cols),
        node_table=node_table,
        branch_table=branch_table,
    )

    # ---- behavioral sources: compile expressions, resolve probes ----
    from ..utils.expr import (parse_expr, probe_refs, free_names,
                              compile_jax, ExprError)
    b_infos = []
    b_consts: List[float] = []
    for e in bsrc:
        try:
            ast = parse_expr(e.b_expr, probes=True)
            refs = probe_refs(ast)
            uses_time = ("time",) in refs
            prefs = [r for r in refs if r[0] != "time"]
            pairs = []
            for r in prefs:
                if r[0] == "v":
                    nid = ckt.node_name_to_id.get(r[1])
                    if nid is None:
                        raise ExprError(f"unknown node {r[1]!r} in v()")
                    a = eq(nid)
                    bq = dump
                    if r[2] is not None:
                        nid2 = ckt.node_name_to_id.get(r[2])
                        if nid2 is None:
                            raise ExprError(f"unknown node {r[2]!r} in v()")
                        bq = eq(nid2)
                    pairs.append((a, bq))
                else:
                    keq = -1
                    for exact in (True, False):
                        for el in ckt.elements:
                            if getattr(el, "branch_eq", -1) < 0:
                                continue
                            if (el.name == r[1]) if exact \
                                    else (el.name.lower() == r[1].lower()):
                                keq = el.branch_eq
                                break
                        if keq >= 0:
                            break
                    if keq < 0:
                        raise ExprError(
                            f"i({r[1]}): no branch-current unknown (only "
                            "V/L/E/H/B-V elements carry one)")
                    pairs.append((keq, dump))
            ref_index = {r: j for j, r in enumerate(prefs)}
            names = free_names(ast)
            pv = {k2.lower(): v for k2, v in ckt.param_values.items()}
            const_off = len(b_consts)
            for nm in names:
                if nm not in pv:
                    raise ExprError(f"undefined parameter {nm!r}")
                b_consts.append(float(pv[nm]))
            const_index = {nm: j for j, nm in enumerate(names)}
            fn = compile_jax(ast, ref_index, const_index)
            b_infos.append(BSourceInfo(
                name=e.name, fn=fn,
                pairs=np.asarray(pairs, np.int32).reshape(-1, 2),
                is_v=e.b_is_v, ep=eq(e.node_ids[0]), em=eq(e.node_ids[1]),
                k=e.branch_eq, uses_time=uses_time,
                const_off=const_off, n_consts=len(names)))
        except ExprError as err:
            # a V-form B already owns a branch equation; silently skipping
            # would leave a singular row, so unresolved references are loud
            raise ValueError(f"behavioral source {e.name}: {err}")

    vsp = _pack_sources([e.spec for e in vs], dtype)
    isp = _pack_sources([e.spec for e in isrc], dtype)
    params = {
        "res_r": jnp.asarray([e.value for e in res], dtype),
        # resistor temperature coefficients (extension; engine.res_tc gates
        # the scaling structurally so TC-free circuits compile identically)
        "res_tc1": jnp.asarray([e.tc1 for e in res], dtype),
        "res_tc2": jnp.asarray([e.tc2 for e in res], dtype),
        # T - 27 C (scalar; set by .TEMP / .STEP TEMP alongside vt_thermal)
        "temp_delta_c": jnp.asarray(0.0, dtype),
        "cap_c": jnp.asarray([e.value for e in cap], dtype),
        "ind_l": jnp.asarray([e.value for e in ind], dtype),
        "mos_vth": jnp.asarray([e.vth for e in mos], dtype),
        "mos_k": jnp.asarray([e.k for e in mos], dtype),
        "mos_lam": jnp.asarray([e.lam for e in mos], dtype),
        "mos_cj0": jnp.asarray([e.cj0 for e in mos], dtype),
        "mos_coxwl": jnp.asarray([e.coxwl for e in mos], dtype),
        "mos_kf": jnp.asarray([e.kf for e in mos], dtype),
        "mos_gamma": jnp.asarray([e.gamma for e in mos], dtype),
        "mos_phi": jnp.asarray([e.phi for e in mos], dtype),
        "mos_af": jnp.asarray([e.af for e in mos], dtype),
        "mos_p": jnp.asarray([-1.0 if e.is_p else 1.0 for e in mos], dtype),
        "dio_is": jnp.asarray([e.i_sat for e in dio], dtype),
        "dio_cjo": jnp.asarray([e.cj0 for e in dio], dtype),
        # reverse breakdown (extension; engine.dio_bv gates structurally)
        "dio_bv": jnp.asarray([e.d_bv for e in dio], dtype),
        "dio_ibv": jnp.asarray([e.d_ibv for e in dio], dtype),
        # IS(T) scaling exponents (extension; applied by utils/temp.py)
        "dio_eg": jnp.asarray([e.eg for e in dio], dtype),
        "dio_xti": jnp.asarray([e.xti for e in dio], dtype),
        "bjt_eg": jnp.asarray([e.eg for e in bjt], dtype),
        "bjt_xti": jnp.asarray([e.xti for e in bjt], dtype),
        # BJT junction capacitances (extension; cap-like class members)
        "bjt_cje": jnp.asarray([e.cje for e in bjt], dtype),
        "bjt_cjc": jnp.asarray([e.cjc for e in bjt], dtype),
        "dio_n": jnp.asarray([e.n_ideal for e in dio], dtype),
        "bjt_is": jnp.asarray([e.i_sat for e in bjt], dtype),
        "bjt_bf": jnp.asarray([e.bf for e in bjt], dtype),
        "bjt_br": jnp.asarray([e.br for e in bjt], dtype),
        "bjt_vaf": jnp.asarray([e.vaf for e in bjt], dtype),
        "mut_k": jnp.asarray([m[2] for m in mut_ok], dtype),
        # referenced .PARAM values of behavioral expressions, flattened
        # in (device, first-appearance) order; see BSourceInfo.const_off
        "b_consts": jnp.asarray(b_consts, dtype),
        "tl_z0": jnp.asarray([e.z0 for e in tl], dtype),
        "tl_td": jnp.asarray([e.td for e in tl], dtype),
        "jf_vto": jnp.asarray([e.vth for e in jf], dtype),
        "jf_beta": jnp.asarray([e.k for e in jf], dtype),
        "jf_lam": jnp.asarray([e.lam for e in jf], dtype),
        "jf_p": jnp.asarray([-1.0 if e.is_p else 1.0 for e in jf], dtype),
        "sw_ron": jnp.asarray([e.ron for e in sw], dtype),
        "sw_roff": jnp.asarray([e.roff for e in sw], dtype),
        "sw_vt": jnp.asarray([e.s_vt for e in sw], dtype),
        "sw_vh": jnp.asarray([e.s_vh for e in sw], dtype),
        "vcvs_gain": jnp.asarray([e.value for e in vcvs], dtype),
        "vccs_g": jnp.asarray([e.value for e in vccs], dtype),
        "cccs_gain": jnp.asarray([e.value for e in cccs], dtype),
        "ccvs_r": jnp.asarray([e.value for e in ccvs], dtype),
        # thermal voltage kT/q (scalar; .TEMP card rescales it — batchable
        # for Monte-Carlo temperature sweeps).  Default matches the diode
        # model's VT_THERMAL constant exactly.
        "vt_thermal": jnp.asarray(0.025852, dtype),
        "bjt_p": jnp.asarray([-1.0 if e.is_p else 1.0 for e in bjt], dtype),
    }
    for key, pack in (("vs", vsp), ("is", isp)):
        for f, arr in pack.items():
            params[f"{key}_{f}"] = arr

    mc_tols = {}
    # DEV=/LOT= tolerance -> the param leaf it perturbs: R/C/L values,
    # plus the dominant per-device mismatch knobs (MOS/JFET threshold,
    # diode saturation current, BJT forward beta) — extension; the
    # perturbation itself is parallel/montecarlo.perturb_params_netlist
    for key, els in (("res_r", res), ("cap_c", cap), ("ind_l", ind),
                     ("mos_vth", mos), ("jf_vto", jf),
                     ("dio_is", dio), ("bjt_bf", bjt)):
        if any(e.dev_tol or e.lot_tol for e in els):
            mc_tols[key] = (np.asarray([e.dev_tol for e in els]),
                            np.asarray([e.lot_tol for e in els]))

    return LoweredCircuit(topo=topo, params=params, circuit=ckt,
                          b_sources=b_infos, mc_tols=mc_tols)
