"""Native (C++) netlist frontend binding.

The reference's frontend/graph-builder tier is native C++ (src/parser.cpp,
src/circuit.cpp); this package's equivalent lives in csim_frontend.cpp and
performs the full lex -> parse -> circuit-build -> equation-numbering
pipeline natively, returning flat record arrays over a string pool that map
directly onto the Python Circuit / SimulationConfig.  Loaded via ctypes (no
pybind11 in the build environment); compiled on demand with g++ and cached
next to the source.

Use `parse_netlist_native(path)` / `parse_netlist_text_native(text)`, or
`Simulator.from_file(..., frontend="native")`.  `available()` reports
whether the shared library could be built/loaded.
"""

from __future__ import annotations

import ctypes as ct
import os
import subprocess
import sys
import tempfile
from typing import Optional, Tuple

from ..netlist.circuit import (
    Circuit, ElementRec, Node, SourceSpec, Waveform,
    KIND_R, KIND_C, KIND_L, KIND_V, KIND_I, KIND_M, KIND_D, KIND_Q,
    KIND_E, KIND_G, KIND_F, KIND_H, KIND_K, KIND_S, KIND_W, KIND_J, KIND_T,
    KIND_B,
)
from ..netlist.parser import (
    SimulationConfig, TranConfig, AcConfig, HbConfig, DCSweepConfig,
    NoiseConfig, FourConfig, SensConfig, PzConfig, TfConfig,
    MeasureSpec, EventSpec, StepConfig,
    PrintCommand, ProbeSpec, AN_NONE, AN_OP, AN_DC, AN_AC, AN_TRAN, AN_HB,
)

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "csim_frontend.cpp")
_LIB_NAME = "libcsim_frontend.so"
_ABI_VERSION = 16  # bump on ANY packed-struct change (CLAUDE.md)

_lib = None
_lib_error: Optional[str] = None


class _CElement(ct.Structure):
    _pack_ = 1
    _fields_ = [
        ("kind", ct.c_int32), ("name_off", ct.c_int32),
        ("nodes", ct.c_int32 * 4), ("branch_eq", ct.c_int32),
        ("value", ct.c_double),
        ("is_p", ct.c_int32),
        ("vth", ct.c_double), ("k", ct.c_double), ("lam", ct.c_double),
        ("cj0", ct.c_double), ("kf", ct.c_double), ("af", ct.c_double),
        ("i_sat", ct.c_double), ("n_ideal", ct.c_double),
        ("bf", ct.c_double), ("br", ct.c_double),
        ("ctrl_off", ct.c_int32),
        ("dc", ct.c_double), ("ac_mag", ct.c_double), ("ac_phase", ct.c_double),
        ("wave_kind", ct.c_int32),
        ("pulse", ct.c_double * 7), ("sin5", ct.c_double * 5),
        ("pwl_off", ct.c_int32), ("pwl_n", ct.c_int32),
        ("ctrl2_off", ct.c_int32),
        ("ron", ct.c_double), ("roff", ct.c_double),
        ("s_vt", ct.c_double), ("s_vh", ct.c_double),
        ("z0", ct.c_double), ("td", ct.c_double),
        ("branch_eq2", ct.c_int32),
        ("bexpr_off", ct.c_int32), ("b_is_v", ct.c_int32),
        ("gamma", ct.c_double), ("phi", ct.c_double),
        ("vaf", ct.c_double),
        # resistor temperature coefficients (ABI v8)
        ("tc1", ct.c_double), ("tc2", ct.c_double),
        # BJT junction capacitances (ABI v9)
        ("cje", ct.c_double), ("cjc", ct.c_double),
        # R/C/L Monte-Carlo tolerances (ABI v10)
        ("dev_tol", ct.c_double), ("lot_tol", ct.c_double),
        # diode reverse breakdown (ABI v11)
        ("d_bv", ct.c_double), ("d_ibv", ct.c_double),
        # IS(T) scaling, diode + BJT (ABI v12)
        ("eg", ct.c_double), ("xti", ct.c_double),
        # C/L IC= initial conditions (ABI v13)
        ("ic", ct.c_double), ("has_ic", ct.c_int32),
        # TRNOISE(na nt) transient noise on V/I sources (ABI v14)
        ("tn_na", ct.c_double), ("tn_nt", ct.c_double),
        # 1/f^alpha flicker component (ABI v15)
        ("tn_alpha", ct.c_double), ("tn_namp", ct.c_double),
        # MOS total gate-oxide capacitance COX*W*L (ABI v16; the
        # charge-based cap model needs it — K only fixes COX*W/L)
        ("coxwl", ct.c_double),
    ]


class _CNode(ct.Structure):
    _pack_ = 1
    _fields_ = [("name_off", ct.c_int32), ("eq_index", ct.c_int32)]


class _CProbe(ct.Structure):
    _pack_ = 1
    _fields_ = [("analysis", ct.c_int32), ("kind", ct.c_int32),
                ("node1_off", ct.c_int32), ("node2_off", ct.c_int32),
                ("ele_off", ct.c_int32), ("port_off", ct.c_int32),
                ("mod", ct.c_int32)]


_PROBE_MOD = {0: "", 1: "db", 2: "ph", 3: "re", 4: "im"}


class _CMeasure(ct.Structure):
    _pack_ = 1
    _fields_ = [("analysis", ct.c_int32), ("name_off", ct.c_int32),
                ("kind", ct.c_int32), ("stat_off", ct.c_int32),
                ("p1", _CProbe), ("p2", _CProbe), ("p3", _CProbe),
                ("val1", ct.c_double), ("val2", ct.c_double),
                ("edge1", ct.c_int32), ("edge2", ct.c_int32),
                ("n1", ct.c_int32), ("n2", ct.c_int32),
                ("td1", ct.c_double), ("td2", ct.c_double),
                ("t_from", ct.c_double), ("t_to", ct.c_double),
                ("at", ct.c_double), ("expr_off", ct.c_int32)]


class _CParam(ct.Structure):
    _pack_ = 1
    _fields_ = [("name_off", ct.c_int32), ("value", ct.c_double)]


class _CStep(ct.Structure):
    _pack_ = 1
    _fields_ = [("kind", ct.c_int32), ("name_off", ct.c_int32),
                ("val_off", ct.c_int32), ("n_vals", ct.c_int32)]


class _CSweep(ct.Structure):
    _pack_ = 1
    _fields_ = [("source_off", ct.c_int32), ("start", ct.c_double),
                ("stop", ct.c_double), ("step", ct.c_double),
                # nested outer sweep (ABI v7); source2_off < 0 when absent
                ("source2_off", ct.c_int32), ("start2", ct.c_double),
                ("stop2", ct.c_double), ("step2", ct.c_double)]


class _CIc(ct.Structure):
    _pack_ = 1
    _fields_ = [("node_off", ct.c_int32), ("value", ct.c_double)]


class _COpt(ct.Structure):
    _pack_ = 1
    _fields_ = [("name_off", ct.c_int32), ("value_off", ct.c_int32)]


class _CConfig(ct.Structure):
    _pack_ = 1
    _fields_ = [
        ("do_op", ct.c_int32),
        ("tran_enabled", ct.c_int32),
        ("tstep", ct.c_double), ("tstop", ct.c_double), ("tstart", ct.c_double),
        ("ac_enabled", ct.c_int32), ("ac_sweep", ct.c_int32),
        ("ac_npoints", ct.c_int32),
        ("fstart", ct.c_double), ("fstop", ct.c_double),
        ("hb_enabled", ct.c_int32), ("hb_f0", ct.c_double),
        ("hb_nharm", ct.c_int32),
        ("hb_extra_ntones", ct.c_int32),
        ("hb_extra_f", ct.c_double * 4), ("hb_extra_n", ct.c_int32 * 4),
        ("noise_enabled", ct.c_int32),
        ("noise_out_off", ct.c_int32), ("noise_ref_off", ct.c_int32),
        ("noise_src_off", ct.c_int32),
        ("noise_sweep", ct.c_int32), ("noise_npoints", ct.c_int32),
        ("noise_fstart", ct.c_double), ("noise_fstop", ct.c_double),
        ("four_enabled", ct.c_int32), ("four_f0", ct.c_double),
        ("tran_uic", ct.c_int32),
        ("temp_set", ct.c_int32), ("temp_c", ct.c_double),
        ("sens_out_off", ct.c_int32), ("sens_ref_off", ct.c_int32),
        ("pz_out_off", ct.c_int32), ("pz_ref_off", ct.c_int32),
        ("pz_src_off", ct.c_int32),
        ("tf_enabled", ct.c_int32), ("tf_out_kind", ct.c_int32),
        ("tf_out_off", ct.c_int32), ("tf_ref_off", ct.c_int32),
        ("tf_elem_off", ct.c_int32), ("tf_src_off", ct.c_int32),
    ]


def _build_lib(lib_path: str) -> None:
    cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC,
           "-o", lib_path]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def _load() -> Optional[ct.CDLL]:
    global _lib, _lib_error
    if _lib is not None or _lib_error is not None:
        return _lib
    lib_dir = os.path.dirname(_SRC)
    lib_path = os.path.join(lib_dir, _LIB_NAME)
    tmp_path = os.path.join(tempfile.gettempdir(),
                            f"csim_frontend_{os.getuid()}.so")
    try:
        if (not os.path.exists(lib_path)
                or os.path.getmtime(lib_path) < os.path.getmtime(_SRC)):
            try:
                _build_lib(lib_path)
            except (OSError, subprocess.CalledProcessError):
                # source dir may be read-only: build into a temp dir
                lib_path = tmp_path
                _build_lib(lib_path)
        lib = ct.CDLL(lib_path)
    except (OSError, subprocess.CalledProcessError) as e:
        _lib_error = str(e)
        return None
    try:
        lib = _register(lib)
    except AttributeError:           # old library missing new symbols
        _lib_error = "ABI mismatch (missing symbols)"
        lib = None
    if lib is None and lib_path != tmp_path:
        # stale prebuilt library whose mtime postdates the source (the
        # rebuild check above cannot catch it): try an existing good temp
        # build first (instant for every process after the first), then
        # rebuild into the temp path before declaring the tier unavailable
        for attempt in ("load", "build"):
            try:
                if attempt == "build":
                    _build_lib(tmp_path)
                elif not os.path.exists(tmp_path):
                    continue
                lib = _register(ct.CDLL(tmp_path))
            except (OSError, subprocess.CalledProcessError, AttributeError):
                lib = None
            if lib is not None:
                break
    _lib = lib
    return _lib


def _register(lib) -> Optional[ct.CDLL]:
    """Set ctypes signatures; None (with _lib_error) on ABI mismatch."""
    global _lib_error
    lib.csim_parse.restype = ct.c_void_p
    lib.csim_parse.argtypes = [ct.c_char_p]
    lib.csim_free.argtypes = [ct.c_void_p]
    for name in ("csim_n_elements", "csim_n_nodes", "csim_n_probes",
                 "csim_n_sweeps", "csim_n_ics", "csim_n_nodesets",
                 "csim_n_options", "csim_n_measures", "csim_n_params",
                 "csim_n_step_cards", "csim_step_pool_size", "csim_n_pwl",
                 "csim_strpool_size",
                 "csim_abi_version"):
        getattr(lib, name).restype = ct.c_int32
        if name != "csim_abi_version":
            getattr(lib, name).argtypes = [ct.c_void_p]
    for name in ("csim_elements", "csim_nodes", "csim_probes", "csim_sweeps",
                 "csim_ics", "csim_nodesets", "csim_options",
                 "csim_measures", "csim_params", "csim_step_cards",
                 "csim_config"):
        getattr(lib, name).restype = ct.c_void_p
        getattr(lib, name).argtypes = [ct.c_void_p]
    lib.csim_pwl.restype = ct.POINTER(ct.c_double)
    lib.csim_pwl.argtypes = [ct.c_void_p]
    lib.csim_step_pool.restype = ct.POINTER(ct.c_double)
    lib.csim_step_pool.argtypes = [ct.c_void_p]
    lib.csim_strpool.restype = ct.c_void_p
    lib.csim_strpool.argtypes = [ct.c_void_p]
    lib.csim_diagnostics.restype = ct.c_char_p
    lib.csim_diagnostics.argtypes = [ct.c_void_p]
    try:
        got = lib.csim_abi_version()
    except AttributeError:
        got = -1
    if got != _ABI_VERSION:
        _lib_error = f"ABI version mismatch (lib {got}, want {_ABI_VERSION})"
        return None
    _lib_error = None
    return lib


def available() -> bool:
    return _load() is not None


_KIND_MAP = {0: KIND_R, 1: KIND_C, 2: KIND_L, 3: KIND_V, 4: KIND_I,
             5: KIND_M, 6: KIND_D, 7: KIND_Q,
             8: KIND_E, 9: KIND_G, 10: KIND_F, 11: KIND_H, 12: KIND_K,
             13: KIND_S, 14: KIND_W, 15: KIND_J, 16: KIND_T, 17: KIND_B}
_AN_MAP = {0: AN_NONE, 1: AN_OP, 2: AN_DC, 3: AN_AC, 4: AN_TRAN, 5: AN_HB}
_PROBE_KIND = {0: "nv", 1: "dv", 2: "br"}


def parse_netlist_text_native(text: str) -> Tuple[Circuit, SimulationConfig]:
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native frontend unavailable: {_lib_error}")
    h = lib.csim_parse(text.encode())
    try:
        pool_size = lib.csim_strpool_size(h)
        pool = ct.string_at(lib.csim_strpool(h), pool_size)

        def s(off: int) -> str:
            if off < 0:
                return ""
            end = pool.index(b"\0", off)
            return pool[off:end].decode()

        diags = lib.csim_diagnostics(h).decode()
        if diags:
            sys.stderr.write(diags)

        npwl = lib.csim_n_pwl(h)
        pwl = [lib.csim_pwl(h)[i] for i in range(npwl)] if npwl else []

        ckt = Circuit()
        n_nodes = lib.csim_n_nodes(h)
        cn = ct.cast(lib.csim_nodes(h), ct.POINTER(_CNode))
        for i in range(n_nodes):
            name = s(cn[i].name_off)
            ckt.nodes.append(Node(id=i, name=name, eq_index=cn[i].eq_index))
            ckt.node_name_to_id[name] = i

        ne = lib.csim_n_elements(h)
        cels = ct.cast(lib.csim_elements(h), ct.POINTER(_CElement))
        for i in range(ne):
            e = cels[i]
            kind = _KIND_MAP[e.kind]
            node_ids = [e.nodes[j] for j in range(4) if e.nodes[j] >= 0]
            rec = ElementRec(kind=kind, name=s(e.name_off), node_ids=node_ids,
                             value=e.value, branch_eq=e.branch_eq)
            if kind == KIND_R:
                rec.tc1, rec.tc2 = e.tc1, e.tc2
            if kind in (KIND_R, KIND_C, KIND_L, KIND_M, KIND_D, KIND_Q,
                        KIND_J):
                # Monte-Carlo DEV=/LOT= tolerances (M/J: VT mismatch,
                # D: IS, Q: BF — mirror of mc_tols in ir/lower.py)
                rec.dev_tol, rec.lot_tol = e.dev_tol, e.lot_tol
            if kind in (KIND_C, KIND_L):
                rec.ic, rec.has_ic = e.ic, bool(e.has_ic)
            if kind in (KIND_V, KIND_I):
                w = Waveform(kind=e.wave_kind)
                if e.wave_kind == 1:
                    (w.v1, w.v2, w.ptd, w.tr, w.tf, w.ton, w.per) = list(e.pulse)
                elif e.wave_kind == 2:
                    (w.v0, w.va, w.freq, w.std, w.phi) = list(e.sin5)
                elif e.wave_kind == 3:
                    pts = pwl[e.pwl_off:e.pwl_off + 2 * e.pwl_n]
                    w.pwl_t = pts[0::2]
                    w.pwl_v = pts[1::2]
                elif e.wave_kind == 4:     # EXP packed in the PULSE block
                    (w.v1, w.v2, w.ptd, w.tr, w.tf, w.ton) = list(e.pulse)[:6]
                elif e.wave_kind == 5:     # SFFM packed in the SIN block
                    (w.v0, w.va, w.freq, w.std, w.phi) = list(e.sin5)
                rec.spec = SourceSpec(dc=e.dc, ac_mag=e.ac_mag,
                                      ac_phase_deg=e.ac_phase, wave=w,
                                      tn_na=e.tn_na, tn_nt=e.tn_nt,
                                      tn_alpha=e.tn_alpha,
                                      tn_namp=e.tn_namp)
            elif kind == KIND_M:
                rec.is_p = bool(e.is_p)
                rec.vth, rec.k, rec.lam, rec.cj0 = e.vth, e.k, e.lam, e.cj0
                rec.kf, rec.af = e.kf, e.af
                rec.gamma, rec.phi = e.gamma, e.phi
                rec.coxwl = e.coxwl
            elif kind == KIND_D:
                rec.i_sat, rec.n_ideal = e.i_sat, e.n_ideal
                rec.cj0 = e.cj0
                rec.d_bv, rec.d_ibv = e.d_bv, e.d_ibv
                rec.eg, rec.xti = e.eg, e.xti
            elif kind == KIND_Q:
                rec.is_p = bool(e.is_p)
                rec.i_sat, rec.bf, rec.br = e.i_sat, e.bf, e.br
                rec.vaf = e.vaf
                rec.cje, rec.cjc = e.cje, e.cjc
                rec.eg, rec.xti = e.eg, e.xti
            elif kind in (KIND_F, KIND_H):
                rec.ctrl_name = s(e.ctrl_off)
            elif kind == KIND_K:
                rec.ctrl_name = s(e.ctrl_off)
                rec.ctrl2_name = s(e.ctrl2_off)
            elif kind == KIND_J:
                rec.is_p = bool(e.is_p)
                rec.vth, rec.k, rec.lam = e.vth, e.k, e.lam
            elif kind == KIND_T:
                rec.z0, rec.td = e.z0, e.td
                rec.branch_eq2 = e.branch_eq2
            elif kind == KIND_B:
                rec.b_expr = s(e.bexpr_off)
                rec.b_is_v = bool(e.b_is_v)
            elif kind in (KIND_S, KIND_W):
                rec.ron, rec.roff = e.ron, e.roff
                rec.s_vt, rec.s_vh = e.s_vt, e.s_vh
                if kind == KIND_W:
                    rec.ctrl_name = s(e.ctrl_off)
            ckt.elements.append(rec)

        cfg = ct.cast(lib.csim_config(h), ct.POINTER(_CConfig))[0]
        sim = SimulationConfig()
        sim.do_op = bool(cfg.do_op)
        sim.tran = TranConfig(enabled=bool(cfg.tran_enabled), tstep=cfg.tstep,
                              tstop=cfg.tstop, tstart=cfg.tstart,
                              uic=bool(cfg.tran_uic))
        if cfg.temp_set:
            sim.temp_c = cfg.temp_c
        if cfg.pz_out_off >= 0:
            sim.pz = PzConfig(
                enabled=True, out_node=s(cfg.pz_out_off),
                ref_node=s(cfg.pz_ref_off) if cfg.pz_ref_off >= 0 else "",
                input_source=s(cfg.pz_src_off) if cfg.pz_src_off >= 0 else "")
        if cfg.sens_out_off >= 0:
            sim.sens = SensConfig(
                enabled=True, out_node=s(cfg.sens_out_off),
                ref_node=s(cfg.sens_ref_off) if cfg.sens_ref_off >= 0 else "")
        if cfg.tf_enabled:
            sim.tf = TfConfig(
                enabled=True,
                out_kind="i" if cfg.tf_out_kind == 1 else "v",
                out_node=s(cfg.tf_out_off) if cfg.tf_out_off >= 0 else "",
                ref_node=s(cfg.tf_ref_off) if cfg.tf_ref_off >= 0 else "",
                out_element=(s(cfg.tf_elem_off)
                             if cfg.tf_elem_off >= 0 else ""),
                input_source=s(cfg.tf_src_off) if cfg.tf_src_off >= 0 else "")
        nic = lib.csim_n_ics(h)
        cic = ct.cast(lib.csim_ics(h), ct.POINTER(_CIc))
        for i in range(nic):
            sim.ics.append((s(cic[i].node_off), cic[i].value))
        nns = lib.csim_n_nodesets(h)
        cns = ct.cast(lib.csim_nodesets(h), ct.POINTER(_CIc))
        for i in range(nns):
            sim.nodesets.append((s(cns[i].node_off), cns[i].value))
        nop = lib.csim_n_options(h)
        cop = ct.cast(lib.csim_options(h), ct.POINTER(_COpt))
        for i in range(nop):
            sim.options[s(cop[i].name_off)] = s(cop[i].value_off)

        npa = lib.csim_n_params(h)
        cpa = ct.cast(lib.csim_params(h), ct.POINTER(_CParam))
        for i in range(npa):
            sim.param_values[s(cpa[i].name_off)] = cpa[i].value
        nst = lib.csim_n_step_cards(h)
        cst2 = ct.cast(lib.csim_step_cards(h), ct.POINTER(_CStep))
        spool = lib.csim_step_pool(h)
        for i in range(nst):
            r = cst2[i]
            sim.steps.append(StepConfig(
                kind={0: "param", 1: "source", 2: "temp"}[r.kind],
                name=s(r.name_off),
                values=[spool[r.val_off + j] for j in range(r.n_vals)]))

        def probe(p):
            return ProbeSpec(kind=_PROBE_KIND[p.kind],
                             node1=s(p.node1_off), node2=s(p.node2_off),
                             ele_name=s(p.ele_off), ele_port=s(p.port_off),
                             mod=_PROBE_MOD[p.mod])

        _EDGE = {0: "cross", 1: "rise", 2: "fall"}
        _MKIND = {0: "stat", 1: "trig_targ", 2: "when", 3: "find_when",
                  4: "find_at", 5: "param"}
        nme = lib.csim_n_measures(h)
        cme = ct.cast(lib.csim_measures(h), ct.POINTER(_CMeasure))
        for i in range(nme):
            cm = cme[i]
            sim.measures.append(MeasureSpec(
                analysis=_AN_MAP[cm.analysis], name=s(cm.name_off),
                kind=_MKIND[cm.kind],
                stat=s(cm.stat_off) if cm.stat_off >= 0 else "",
                probe=probe(cm.p1),
                ev1=EventSpec(probe=probe(cm.p2), val=cm.val1,
                              edge=_EDGE[cm.edge1], n=cm.n1, td=cm.td1),
                ev2=EventSpec(probe=probe(cm.p3), val=cm.val2,
                              edge=_EDGE[cm.edge2], n=cm.n2, td=cm.td2),
                t_from=cm.t_from, t_to=cm.t_to, at=cm.at,
                expr=s(cm.expr_off) if cm.expr_off >= 0 else ""))
        sim.ac = AcConfig(enabled=bool(cfg.ac_enabled),
                          sweep_type=["lin", "dec", "oct"][cfg.ac_sweep],
                          n_points=cfg.ac_npoints, fstart=cfg.fstart,
                          fstop=cfg.fstop)
        sim.hb = HbConfig(enabled=bool(cfg.hb_enabled), f0=cfg.hb_f0,
                          n_harm=cfg.hb_nharm,
                          extra_tones=[(cfg.hb_extra_f[i], cfg.hb_extra_n[i])
                                       for i in range(cfg.hb_extra_ntones)])
        if cfg.noise_enabled:
            sim.noise = NoiseConfig(
                enabled=True,
                out_node=s(cfg.noise_out_off),
                ref_node=s(cfg.noise_ref_off) if cfg.noise_ref_off >= 0 else "",
                input_source=(s(cfg.noise_src_off)
                              if cfg.noise_src_off >= 0 else ""),
                sweep_type=(["lin", "dec", "oct"][cfg.noise_sweep]
                            if cfg.noise_sweep >= 0 else ""),
                n_points=cfg.noise_npoints, fstart=cfg.noise_fstart,
                fstop=cfg.noise_fstop)
        nsw = lib.csim_n_sweeps(h)
        csw = ct.cast(lib.csim_sweeps(h), ct.POINTER(_CSweep))
        for i in range(nsw):
            sim.dc_sweeps.append(DCSweepConfig(
                source_name=s(csw[i].source_off), start=csw[i].start,
                stop=csw[i].stop, step=csw[i].step,
                source2=(s(csw[i].source2_off)
                         if csw[i].source2_off >= 0 else ""),
                start2=csw[i].start2 if csw[i].source2_off >= 0 else 0.0,
                stop2=csw[i].stop2 if csw[i].source2_off >= 0 else 0.0,
                step2=csw[i].step2 if csw[i].source2_off >= 0 else 0.0))
        npr = lib.csim_n_probes(h)
        cpr = ct.cast(lib.csim_probes(h), ct.POINTER(_CProbe))
        # group consecutive probes with the same analysis into PrintCommands
        # (one per probe keeps semantics; the reference only aggregates for
        # display purposes)
        four_probes = []
        for i in range(npr):
            p = cpr[i]
            probe = ProbeSpec(kind=_PROBE_KIND[p.kind],
                              node1=s(p.node1_off), node2=s(p.node2_off),
                              ele_name=s(p.ele_off), ele_port=s(p.port_off),
                              mod=_PROBE_MOD[p.mod])
            if p.analysis == 6:       # .FOUR probe (extension tag)
                four_probes.append(probe)
                continue
            pc = PrintCommand(analysis=_AN_MAP[p.analysis], probes=[probe])
            sim.print_commands.append(pc)
        if cfg.four_enabled:
            sim.four = FourConfig(enabled=bool(four_probes),
                                  f0=cfg.four_f0, probes=four_probes)
        ckt.param_values = dict(sim.param_values)
        return ckt, sim
    finally:
        lib.csim_free(h)


def parse_netlist_native(path: str) -> Tuple[Circuit, SimulationConfig]:
    with open(path, "r", errors="replace") as f:
        return parse_netlist_text_native(f.read())


# ----------------------------------------------------------------------
# Native solver binary (csim_solver.cpp -> csim_native): the
# reference-scope standalone executable.  Build on demand, mirroring the
# frontend library's fallback-to-tempdir behavior.
# ----------------------------------------------------------------------
_SOLVER_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "csim_solver.cpp")
_BIN_NAME = "csim_native"
_bin_path: Optional[str] = None
_bin_error: Optional[str] = None


def solver_binary() -> Optional[str]:
    """Path to the built csim_native executable (building it if needed);
    None when the toolchain or build is unavailable."""
    global _bin_path, _bin_error
    if _bin_path is not None or _bin_error is not None:
        return _bin_path
    out = os.path.join(os.path.dirname(_SOLVER_SRC), _BIN_NAME)
    tmp_out = os.path.join(tempfile.gettempdir(),
                           f"csim_native_{os.getuid()}")
    newest_src = max(os.path.getmtime(_SOLVER_SRC), os.path.getmtime(_SRC))
    cmd = ["g++", "-O2", "-std=c++17", _SOLVER_SRC, "-o"]
    try:
        if not os.path.exists(out) or os.path.getmtime(out) < newest_src:
            try:
                subprocess.run(cmd + [out], check=True,
                               capture_output=True, text=True)
            except (OSError, subprocess.CalledProcessError):
                out = tmp_out
                subprocess.run(cmd + [out], check=True,
                               capture_output=True, text=True)
    except (OSError, subprocess.CalledProcessError) as e:
        _bin_error = str(e)
        return None
    _bin_path = out
    return _bin_path
