"""High-level simulator API: netlist -> analyses.

    sim = Simulator.from_file("tests/buffer.sp")
    x = sim.dc()                      # DC operating point, (N,)
    res = sim.transient()             # Backward-Euler transient
    sim.write_transient_csv("out.csv", res)

The heavy lifting is jit-compiled per circuit; repeated calls reuse the
compiled executables.
"""

from __future__ import annotations

import functools
import math
import os
import sys
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .analysis.dc import dc_operating_point
from .analysis.transient import run_transient, TransientResult
from .io.csvout import write_transient_csv
from .io.table import circuit_summary, dc_table
from .ir.lower import lower, LoweredCircuit
from .netlist.parser import parse_netlist, parse_netlist_text, SimulationConfig
from .ops.assemble import Engine
from .utils.options import SolverOptions, DEFAULT_OPTIONS


def _default_dtype():
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


class Simulator:
    def __init__(self, circuit, sim_config: SimulationConfig,
                 opts: Optional[SolverOptions] = None):
        if opts is None:
            opts = DEFAULT_OPTIONS.replace(dtype=_default_dtype())
        self.opts = opts
        self.circuit = circuit
        self.config = sim_config
        self.netlist_text: Optional[str] = None   # set by from_file/from_text
        circuit.assign_equation_indices()
        self.lowered: LoweredCircuit = lower(circuit, dtype=opts.dtype)
        self.topo = self.lowered.topo
        self.params = self.lowered.params
        opts = self._apply_netlist_options(opts, sim_config)
        self.opts = opts
        if getattr(sim_config, "temp_c", None) is not None:
            # .TEMP (extension): rescale the thermal voltage kT/q used by
            # the diode/BJT models and the noise analysis
            k_b, q_e = 1.380649e-23, 1.602176634e-19
            self.params = dict(self.params)
            self.params["vt_thermal"] = jnp.asarray(
                k_b * (273.15 + float(sim_config.temp_c)) / q_e, opts.dtype)
            self.params["temp_delta_c"] = jnp.asarray(
                float(sim_config.temp_c) - 27.0, opts.dtype)
            from .utils.temp import has_is_temp, apply_is_temp
            if has_is_temp(self.params):
                # EG/XTI given: scale diode/BJT saturation currents too
                self.params = apply_is_temp(self.params)
        self.engine = Engine(self.lowered, opts)
        # large circuits: dense O(N^2) assembly and O(N^3) LU are unusable —
        # switch to a structure-exploiting backend when the topology allows:
        # bordered-tridiagonal cyclic reduction for strict ladders, else
        # RCM-reordered bordered block-tridiagonal (ops/blockband.py) for
        # general banded-after-reordering topologies (grids, trees, meshes)
        if opts.auto_backend and self.topo.n_node_eq > 128:
            from .ops.banded import is_ladder
            if is_ladder(self.engine):
                self.opts = opts = opts.replace(tran_solver="tridiag",
                                                dc_solver="tridiag")
                self.engine = Engine(self.lowered, opts)
            else:
                from .ops.blockband import try_layout
                layout = try_layout(self.engine)
                if layout is not None:
                    # pre-factored block-CR + Woodbury (blockwb) when the
                    # total nonlinear rank is small vs the network: the
                    # per-iteration cost trades blockband's O(nb k^3)
                    # re-elimination for O(nb k^2) applies + one
                    # k_wb^2-sized solve.  Measured crossover on a
                    # 10k-unknown grid (125x80, v5e): rank 270 -> 2.9x
                    # faster, rank 555 -> 1.3x, rank 1000 -> 0.6x; N/16
                    # (= 625 there) splits the bracket.  Meshed runs
                    # (SPIKE) fall back to blockband inside
                    # transient_step_fn.
                    from .ops.woodbury import WoodburyPlan
                    k_wb = WoodburyPlan(self.engine).k
                    tran = ("blockwb"
                            if k_wb <= self.topo.n_unknowns // 16
                            else "blockband")
                    self.opts = opts = opts.replace(tran_solver=tran,
                                                    dc_solver="blockband")
                    self.engine = Engine(self.lowered, opts)
                    self.engine._blockband_layout = layout

    @staticmethod
    def _apply_netlist_options(opts: SolverOptions, sim_config):
        """.OPTIONS card -> SolverOptions mapping (extension).  Supported:
        METHOD=BE|TRAP, GMIN, VNTOL/ABSTOL (transient Newton tol), RELTOL
        (adaptive LTE rtol), ITL1 (DC Newton cap), ITL4 (transient Newton
        cap), TEMP (like .TEMP).  Unknown keys warn and are ignored."""
        raw = getattr(sim_config, "options", None)
        if not raw:
            return opts
        import sys
        from .utils.numbers import parse_spice_number as _num
        kw = {}
        for k, v in raw.items():
            try:
                if k == "method":
                    m = v.lower()
                    if m in ("be", "trap"):
                        kw["tran_method"] = m
                    else:
                        print(f".OPTIONS: unsupported METHOD={v}; "
                              "keeping be", file=sys.stderr)
                elif k == "gmin":
                    kw["tran_gmin"] = _num(v)
                elif k in ("vntol", "abstol"):
                    kw["tran_tol"] = _num(v)
                elif k == "reltol":
                    kw["tran_lte_rtol"] = _num(v)
                elif k == "itl1":
                    kw["dc_max_newton_iters"] = int(_num(v))
                elif k == "itl4":
                    kw["tran_max_newton_iters"] = int(_num(v))
                elif k == "temp":
                    sim_config.temp_c = _num(v)
                elif k == "mossym":
                    # symmetric MOS/JFET: drain/source roles swap for
                    # Vds_eff < 0 (transmission gates, pass switches) —
                    # the reference deliberately treats reverse bias as
                    # "off" (element.cpp:223), so this is opt-in
                    kw["mos_reverse_region"] = bool(int(_num(v)))
                elif k == "moscap":
                    m = str(v).lower()
                    if m in ("fixed", "charge"):
                        kw["mos_cap_model"] = m
                    else:
                        print(f".OPTIONS: unsupported MOSCAP={v}; "
                              "keeping fixed", file=sys.stderr)
                else:
                    print(f".OPTIONS: unknown option {k.upper()}; ignored",
                          file=sys.stderr)
            except ValueError as e:
                print(f".OPTIONS: cannot parse {k}={v}: {e}",
                      file=sys.stderr)
        return opts.replace(**kw) if kw else opts

    # ---- constructors ----
    @staticmethod
    def _parse(text: Optional[str], path: Optional[str], frontend: str):
        """frontend: "python", "native" (C++ via ctypes), or "auto"."""
        if frontend not in ("python", "native", "auto"):
            raise ValueError(f"unknown frontend {frontend!r}")
        if frontend in ("native", "auto"):
            from . import native
            if native.available():
                if path is not None:
                    return native.parse_netlist_native(path)
                return native.parse_netlist_text_native(text)
            if frontend == "native":
                raise RuntimeError("native frontend unavailable")
        if path is not None:
            return parse_netlist(path)
        return parse_netlist_text(text)

    @classmethod
    def from_file(cls, path: str, opts: Optional[SolverOptions] = None,
                  frontend: str = "python"):
        # read once (the path may be a pipe, e.g. /dev/stdin) and parse the
        # text; kept on the instance for .STEP re-binding
        try:
            with open(path, "r", errors="replace") as f:
                text = f.read()
        except OSError:
            print(f"cannot open netlist file {path}", file=sys.stderr)
            raise FileNotFoundError(path)
        from .netlist.include import expand_includes
        from .netlist.funcs import expand_funcs
        from .netlist.urc import expand_urc
        from .netlist.laplace import expand_laplace
        text = expand_laplace(expand_urc(expand_funcs(
            expand_includes(text, os.path.dirname(os.path.abspath(path))))))
        ckt, sim = cls._parse(text, None, frontend)
        inst = cls(ckt, sim, opts)
        inst.netlist_text = text
        return inst

    @classmethod
    def from_text(cls, text: str, opts: Optional[SolverOptions] = None,
                  frontend: str = "python"):
        from .netlist.include import expand_includes
        from .netlist.funcs import expand_funcs
        from .netlist.urc import expand_urc
        from .netlist.laplace import expand_laplace
        text = expand_laplace(expand_urc(expand_funcs(
            expand_includes(text))))
        ckt, sim = cls._parse(text, None, frontend)
        inst = cls(ckt, sim, opts)
        inst.netlist_text = text
        return inst

    # ---- analyses ----
    @functools.cached_property
    def _dc_jit(self):
        return {}

    def _nodeset(self):
        """Resolve the .NODESET card to (eqs, vals) arrays, or None."""
        if not getattr(self.config, "nodesets", None):
            return None
        import numpy as np
        eqs, vals = [], []
        for node, val in self.config.nodesets:
            nid = self.circuit.node_name_to_id.get(node)
            if nid is None or self.circuit.nodes[nid].eq_index < 0:
                import sys
                print(f".NODESET: unknown or ground node {node!r}; ignored",
                      file=sys.stderr)
                continue
            eqs.append(self.circuit.nodes[nid].eq_index)
            vals.append(val)
        if not eqs:
            return None
        return (np.asarray(eqs, np.int32),
                jnp.asarray(vals, self.opts.dtype))

    def dc(self, params: Optional[Any] = None,
           linear_solver: Optional[str] = None,
           polish: bool = False):
        """DC operating point -> (N,) solution vector.

        linear_solver: "lu" (reference dcSolve/dcSolveLU), "gs"
        (= dcSolveGaussSeidel), or "tridiag" (ladder circuits).  Defaults to
        the engine's configured dc_solver.  A .NODESET card steers Newton
        toward the wanted solution branch (hold-then-release).

        polish=True follows the reference-parity ramped solve with a few
        undamped Newton refinements at gmin = 0 (the same step .SENS/.TF
        use), removing the ~1e-3-relative "gmin leak" the reference's
        solution carries — use for accuracy, skip for strict parity."""
        key = (linear_solver or self.opts.dc_solver, bool(polish))
        if key not in self._dc_jit:
            ns = self._nodeset()
            solver = key[0]

            def run(p, _solver=solver, _ns=ns, _polish=polish):
                x = dc_operating_point(self.engine, p,
                                       linear_solver=_solver, nodeset=_ns)
                if _polish:
                    from .analysis.sensitivity import _polish as pol
                    x = pol(self.engine, p, x)
                return x

            self._dc_jit[key] = jax.jit(run)
        return self._dc_jit[key](
            params if params is not None else self.params)

    @functools.cached_property
    def _tran_jit(self):
        return {}

    def _initial_conditions_x0(self, uic: bool):
        """x0 for the transient honoring .IC/.TRAN-UIC (extension):
        UIC -> zeros with the .IC values set (no DC solve); otherwise the
        DC solution with .IC-constrained nodes overridden.  Returns None
        when the default DC-op start applies (no .IC, no UIC)."""
        ics = self.config.ics
        elem_ics = [e for e in self.circuit.elements if e.has_ic]
        if not ics and not uic:
            return None
        import numpy as np
        if uic:
            x0 = jnp.zeros((self.topo.n_unknowns,), self.opts.dtype)
            # element `IC=` values (C/L cards, extension): set the cap's
            # terminal-difference / the inductor's branch unknown so
            # Engine.init_state derives vc/il = IC.  Applied before the
            # .IC cards, which override node voltages.
            from .netlist.circuit import KIND_C, KIND_L
            for e in elem_ics:
                if e.kind == KIND_L and e.branch_eq >= 0:
                    x0 = x0.at[e.branch_eq].set(e.ic)
                elif e.kind == KIND_C:
                    eqs = [self.circuit.nodes[nid].eq_index
                           for nid in e.node_ids[:2]]
                    if eqs[0] >= 0:
                        base = x0[eqs[1]] if eqs[1] >= 0 else 0.0
                        x0 = x0.at[eqs[0]].set(base + e.ic)
                    elif eqs[1] >= 0:   # n+ grounded: v(n-) = -IC
                        x0 = x0.at[eqs[1]].set(-e.ic)
        else:
            x0 = self.dc()
        for node, val in ics:
            nid = self.circuit.node_name_to_id.get(node)
            if nid is None or self.circuit.nodes[nid].eq_index < 0:
                import sys
                print(f".IC: unknown or ground node {node!r}; ignored",
                      file=sys.stderr)
                continue
            x0 = x0.at[self.circuit.nodes[nid].eq_index].set(val)
        return x0

    def transient(self, params: Optional[Any] = None,
                  tstep: Optional[float] = None,
                  tstop: Optional[float] = None,
                  save_xs: bool = True,
                  adaptive: bool = False,
                  uic: Optional[bool] = None,
                  noise_seed: Optional[int] = 0) -> TransientResult:
        """Backward-Euler/trapezoidal transient; defaults to the netlist's
        .TRAN card.  Compiled executables are cached per (tstep, tstop,
        save_xs) so repeated calls (parameter sweeps) do not re-trace.

        adaptive=True uses the LTE-controlled dyadic-refinement integrator
        (analysis/adaptive.py): output rows stay on the .TRAN grid but the
        internal dt refines down to tstep/2**opts.tran_max_refine_levels
        where the local truncation error demands it.

        Decks with TRNOISE sources run with transient noise on, seeded
        by noise_seed (default 0 — reproducible; change it for a fresh
        realization); noise_seed=None disables the noise.  No effect on
        noise-free decks.  The adaptive integrator runs noise-free (the
        noise draw grid is dt-dependent); a stderr note is printed when
        a TRNOISE deck takes that path."""
        cfg = self.config.tran
        tstep = cfg.tstep if tstep is None else tstep
        tstop = cfg.tstop if tstop is None else tstop
        if tstep is None or tstep <= 0 or tstop is None or tstop <= 0:
            raise ValueError(".TRAN card missing or invalid "
                             "(tstep and tstop must be > 0)")
        p = params if params is not None else self.params
        uic = self.config.tran.uic if uic is None else uic
        x0 = self._initial_conditions_x0(uic)
        noisy = (noise_seed is not None and not adaptive
                 and self.engine.has_trnoise)
        if (adaptive and noise_seed is not None
                and self.engine.has_trnoise
                and not getattr(self, "_warned_adaptive_noise", False)):
            print("note: the adaptive integrator runs TRNOISE decks "
                  "noise-free (dt-dependent draw grid); use the "
                  "fixed-step transient for noise", file=sys.stderr)
            self._warned_adaptive_noise = True
        key = (float(tstep), float(tstop), bool(save_xs), bool(adaptive),
               x0 is not None, noisy)
        if key not in self._tran_jit:
            # bounded: a timestep-sweep study would otherwise retain one
            # compiled executable per distinct (tstep, tstop)
            if len(self._tran_jit) >= 8:
                self._tran_jit.pop(next(iter(self._tran_jit)))
            if adaptive:
                from .analysis.adaptive import run_transient_adaptive
                run = run_transient_adaptive
            else:
                run = run_transient
            self._tran_jit[key] = jax.jit(functools.partial(
                run, self.engine,
                tstep=tstep, tstop=tstop, save_xs=save_xs))
        kw = {}
        if noisy:
            kw["noise_key"] = jax.random.key(noise_seed)
        if x0 is not None:
            return self._tran_jit[key](p, x0=x0, **kw)
        return self._tran_jit[key](p, **kw)

    def steady_state(self, params: Optional[Any] = None,
                     f0: Optional[float] = None,
                     n_harm: Optional[int] = None,
                     **kw):
        """Periodic steady state (.hb card) via Newton shooting
        (analysis/sstate.py).  Defaults to the netlist's .hb card."""
        from .analysis.sstate import steady_state
        hb = self.config.hb
        f0 = f0 if f0 is not None else (hb.f0 if hb.enabled else None)
        if not f0 or f0 <= 0:
            raise ValueError(".hb card missing or invalid (f0 must be > 0)")
        n_harm = n_harm if n_harm is not None else (hb.n_harm or 8)
        p = params if params is not None else self.params
        return steady_state(self.engine, p, f0, n_harm=n_harm, **kw)

    def harmonic_balance(self, params: Optional[Any] = None,
                         f0: Optional[float] = None,
                         n_harm: Optional[int] = None,
                         tones=None, **kw):
        """Frequency-domain periodic steady state (analysis/hb.py).
        Defaults to the netlist's .hb card; the shooting alternative is
        steady_state().  With multiple tones — `tones=[(f, H), ...]` or a
        multi-tone `.hb f0 n0 f1 n1 ...` card — dispatches to the
        quasi-periodic MPDE formulation (analysis/hbmulti.py)."""
        from .analysis.hb import harmonic_balance
        hb = self.config.hb
        p = params if params is not None else self.params
        if tones is None and f0 is None and hb.enabled and hb.extra_tones:
            tones = hb.tones
        if tones is not None:
            from .analysis.hbmulti import harmonic_balance_multi
            return harmonic_balance_multi(self.engine, p, tones, **kw)
        f0 = f0 if f0 is not None else (hb.f0 if hb.enabled else None)
        if not f0 or f0 <= 0:
            raise ValueError(".hb card missing or invalid (f0 must be > 0)")
        n_harm = n_harm if n_harm is not None else (hb.n_harm or 8)
        return harmonic_balance(self.engine, p, f0, n_harm=n_harm, **kw)

    def monte_carlo_hb(self, n: int, seed: int = 0,
                       sampler: str = "mc",
                       params: Optional[Any] = None,
                       f0: Optional[float] = None,
                       n_harm: Optional[int] = None, **kw):
        """RF Monte Carlo: n perturbed lanes (netlist DEV=/LOT=
        tolerances, like monte_carlo) of the .hb periodic steady state
        solved as ONE batched program (analysis/hb.py
        harmonic_balance_batched — warm-up scans, HB Newton systems and
        the dense solves all vmapped over lanes).  Returns
        (bparams, HBBatchResult); per-lane RF metrics come from
        result.spectrum[lane]."""
        from .analysis.hb import harmonic_balance_batched
        from .parallel.montecarlo import perturb_params_netlist
        if not self.lowered.mc_tols:
            raise ValueError("no DEV=/LOT= tolerances in the netlist")
        hb = self.config.hb
        f0 = f0 if f0 is not None else (hb.f0 if hb.enabled else None)
        if not f0 or f0 <= 0:
            raise ValueError(".hb card missing or invalid (f0 must be > 0)")
        n_harm = n_harm if n_harm is not None else (hb.n_harm or 8)
        p = params if params is not None else self.params
        bp = perturb_params_netlist(p, jax.random.key(seed), n,
                                    self.lowered.mc_tols, sampler=sampler)
        return bp, harmonic_balance_batched(self.engine, bp, f0,
                                            n_harm=n_harm, **kw)

    def ac(self, params: Optional[Any] = None, freqs=None,
           x_op: Optional[Any] = None):
        """Small-signal AC sweep (analysis/ac.py).  Defaults to the
        netlist's .AC card; `freqs` overrides with an explicit array."""
        from .analysis.ac import ac_analysis, sweep_frequencies
        if freqs is None:
            cfg = self.config.ac
            if not cfg.enabled:
                raise ValueError(".AC card missing")
            freqs = sweep_frequencies(cfg.sweep_type, cfg.n_points,
                                      cfg.fstart, cfg.fstop)
        p = params if params is not None else self.params
        return ac_analysis(self.engine, p, freqs, x_op=x_op)

    def group_delay(self, probe: str, params: Optional[Any] = None,
                    freqs=None, x_op: Optional[Any] = None):
        """Exact group delay τ_g(f) = −dφ/dω of V(probe): the phase
        derivative comes from `jax.grad` through the small-signal solve
        (no finite-difference grid error).  Defaults to the .AC card's
        sweep; returns (freqs, tau_g) arrays."""
        import numpy as _np
        from .analysis.ac import ac_system_real, solve_ac_real
        if freqs is None:
            freqs = self._ac_freqs()
        nid = self.circuit.node_name_to_id.get(probe)
        if nid is None:
            raise KeyError(f"unknown node {probe!r}")
        eqi = self.circuit.nodes[nid].eq_index
        p = params if params is not None else self.params
        if x_op is None:
            x_op = self.dc(params=params)
        engine = self.engine

        def phase(f):
            G, B, br, bi = ac_system_real(engine, p, x_op,
                                          2.0 * jnp.pi * f)
            xr, xi = solve_ac_real(engine, G, B, br, bi)
            return jnp.arctan2(xi[eqi], xr[eqi])

        dphi_df = jax.jit(jax.vmap(jax.grad(phase)))(
            jnp.asarray(freqs, self.engine.dtype))
        tau = -_np.asarray(dphi_df) / (2.0 * _np.pi)
        return _np.asarray(freqs), tau

    def two_tone_ip3(self, probe: str, input_amplitude: float,
                     params: Optional[Any] = None, tones=None, **kw):
        """Two-tone intermodulation analysis on the multi-tone harmonic
        balance (analysis/hbmulti.py): solves the quasi-periodic steady
        state, reads the fundamental (1,0) and lower IM3 (2,−1)
        coefficients of V(probe), and extrapolates the third-order
        intercept.  `input_amplitude` is the per-tone drive amplitude A
        the intercept is referred to: IIP3_amplitude = A·√(fund/im3)
        (both tones equal).  Defaults to the deck's multi-tone `.hb f1
        n1 f2 n2` card.  Returns a dict: fund, im3 (voltage magnitudes),
        im3_dbc, iip3_amplitude, oip3_amplitude, result (HBMultiResult).
        """
        import numpy as _np
        from .analysis.hbmulti import coeff
        hb = self.config.hb
        if tones is None:
            if not (hb.enabled and hb.extra_tones):
                raise ValueError("two_tone_ip3 needs a multi-tone .hb "
                                 "card or tones=[(f1,H1),(f2,H2)]")
            tones = hb.tones
        if len(tones) != 2:
            raise ValueError("two_tone_ip3 needs exactly two tones")
        if tones[0][1] < 2 or tones[1][1] < 1:
            raise ValueError("IM3 (2,-1) needs H1 >= 2 and H2 >= 1")
        res = self.harmonic_balance(params=params, tones=tones, **kw)
        nid = self.circuit.node_name_to_id.get(probe)
        if nid is None:
            raise KeyError(f"unknown node {probe!r}")
        eqi = self.circuit.nodes[nid].eq_index
        # one-sided amplitudes: 2·|complex coefficient|
        fund = 2.0 * float(_np.abs(coeff(res, (1, 0))[eqi]))
        im3 = 2.0 * float(_np.abs(coeff(res, (2, -1))[eqi]))
        a = float(input_amplitude)
        ratio = fund / max(im3, 1e-300)
        return {
            "fund": fund, "im3": im3,
            "im3_dbc": 20.0 * _np.log10(max(im3, 1e-300) / fund),
            "iip3_amplitude": a * _np.sqrt(ratio),
            "oip3_amplitude": fund * _np.sqrt(ratio),
            "result": res,
        }

    def monte_carlo_ip3(self, n: int, probe: str, input_amplitude: float,
                        seed: int = 0, sampler: str = "mc",
                        params: Optional[Any] = None, tones=None, **kw):
        """Monte-Carlo two-tone IP3: n perturbed lanes of the multi-tone
        quasi-periodic steady state as batched programs (analysis/
        hbmulti.harmonic_balance_multi_batched — batched single-tone
        warm-up, then the vmapped MPDE Newton), each lane's fundamental
        (1,0) and lower IM3 (2,-1) read per lane.  Returns (bparams,
        dict) with per-lane (n,) arrays fund, im3, im3_dbc,
        iip3_amplitude, oip3_amplitude, converged + the
        HBMultiBatchResult under 'result' — IP3 yield in two
        dispatches."""
        import numpy as _np
        from .analysis.hbmulti import (harmonic_balance_multi_batched,
                                       coeff_batched)
        from .parallel.montecarlo import perturb_params_netlist
        if not self.lowered.mc_tols:
            raise ValueError("no DEV=/LOT= tolerances in the netlist")
        hb = self.config.hb
        if tones is None:
            if not (hb.enabled and hb.extra_tones):
                raise ValueError("monte_carlo_ip3 needs a multi-tone "
                                 ".hb card or tones=[(f1,H1),(f2,H2)]")
            tones = hb.tones
        if len(tones) != 2:
            raise ValueError("monte_carlo_ip3 needs exactly two tones")
        if tones[0][1] < 2 or tones[1][1] < 1:
            raise ValueError("IM3 (2,-1) needs H1 >= 2 and H2 >= 1")
        nid = self.circuit.node_name_to_id.get(probe)
        if nid is None:
            raise KeyError(f"unknown node {probe!r}")
        eqi = self.circuit.nodes[nid].eq_index
        p = params if params is not None else self.params
        bp = perturb_params_netlist(p, jax.random.key(seed), n,
                                    self.lowered.mc_tols, sampler=sampler)
        res = harmonic_balance_multi_batched(self.engine, bp, tones, **kw)
        fund = 2.0 * _np.abs(coeff_batched(res, (1, 0))[:, eqi])
        im3 = 2.0 * _np.abs(coeff_batched(res, (2, -1))[:, eqi])
        a = float(input_amplitude)
        ratio = fund / _np.maximum(im3, 1e-300)
        return bp, {
            "fund": fund, "im3": im3,
            "im3_dbc": 20.0 * _np.log10(_np.maximum(im3, 1e-300) / fund),
            "iip3_amplitude": a * _np.sqrt(ratio),
            "oip3_amplitude": fund * _np.sqrt(ratio),
            "converged": _np.asarray(res.converged),
            "result": res,
        }

    def p1db(self, probe: str, source: str,
             params: Optional[Any] = None,
             f0: Optional[float] = None, n_harm: int = 7,
             a_max_scale: float = 100.0, iters: int = 20, **kw):
        """1 dB compression point: bisect the named SIN source's
        amplitude until the fundamental gain of V(probe) (single-tone
        harmonic balance) drops 1 dB below its small-signal value.
        Returns a dict: a_1db (input amplitude), gain_ss (small-signal
        fundamental gain), gain_1db, n_solves."""
        import numpy as _np
        from .analysis.hb import harmonic_balance
        from .analysis.sweep import find_source
        from .netlist.circuit import KIND_V
        hb = self.config.hb
        f0 = f0 if f0 is not None else (hb.f0 if hb.enabled else None)
        if not f0 or f0 <= 0:
            raise ValueError("p1db needs f0 (or a .hb card)")
        kind, sidx = find_source(self.circuit, source)
        if kind != KIND_V:
            raise ValueError("p1db sweeps a V source's SIN amplitude")
        p0 = dict(params if params is not None else self.params)
        a0 = float(p0["vs_sin"][sidx, 1])
        if a0 <= 0:
            raise ValueError(f"{source!r} has no SIN amplitude")
        nid = self.circuit.node_name_to_id.get(probe)
        if nid is None:
            raise KeyError(f"unknown node {probe!r}")
        eqi = self.circuit.nodes[nid].eq_index
        n_solves = 0

        def gain_at(a):
            nonlocal n_solves
            p = dict(p0)
            p["vs_sin"] = p0["vs_sin"].at[sidx, 1].set(a)
            res = harmonic_balance(self.engine, p, f0, n_harm=n_harm,
                                   **kw)
            n_solves += 1
            # hb.py's (H+1, N) spectrum is one-sided: |c_1| IS the
            # cosine amplitude (the multi-tone grid is two-sided)
            fund = float(_np.abs(res.spectrum[1][eqi]))
            return fund / a

        g_ss = gain_at(a0 / a_max_scale)      # deep small-signal
        target = g_ss * 10.0 ** (-1.0 / 20.0)
        # walk UP in half-octave steps to the FIRST sub-target gain
        # (|gain| is non-monotone past a strong-compression null), then
        # bisect that bracket
        lo = a0 / a_max_scale
        hi = None
        a = lo * math.sqrt(2.0)
        while a <= a0 * a_max_scale:
            if gain_at(a) <= target:
                hi = a
                break
            lo = a
            a *= math.sqrt(2.0)
        if hi is None:
            raise ValueError("no 1 dB compression within the sweep "
                             "range; widen a_max_scale")
        for _ in range(iters):
            mid = math.sqrt(lo * hi)
            if gain_at(mid) > target:
                lo = mid
            else:
                hi = mid
        a_1db = math.sqrt(lo * hi)
        return {"a_1db": a_1db, "gain_ss": g_ss,
                "gain_1db": gain_at(a_1db), "n_solves": n_solves}

    def loop_gain(self, source: str, params: Optional[Any] = None,
                  freqs=None, x_op: Optional[Any] = None):
        """Loop-gain / stability analysis (analysis/loopgain.py):
        Bode's return ratio of the named E (VCVS) source — the loop is
        never broken; the source is nulled and its branch driven with a
        unit test voltage, one modified AC solve per frequency.
        Returns a dict: freqs, T (complex), f_unity,
        phase_margin_deg, f_180, gain_margin_db."""
        from .analysis.loopgain import loop_gain, margins
        from .netlist.circuit import KIND_E
        idx = None
        j = 0
        for e in self.circuit.elements:
            if e.kind == KIND_E:
                if e.name.upper() == source.upper():
                    idx = j
                    break
                j += 1
        if idx is None:
            raise KeyError(f"no VCVS named {source!r}")
        if freqs is None:
            freqs = self._ac_freqs()
        p = params if params is not None else self.params
        if x_op is None:
            x_op = self.dc(params=params)
        T = loop_gain(self.engine, p, idx, freqs, x_op)
        out = {"freqs": freqs, "T": T}
        out.update(margins(freqs, T))
        return out

    def fourier(self, result: TransientResult,
                f0: Optional[float] = None, probes=None, n_harm: int = 9):
        """.FOUR Fourier analysis of a finished transient (analysis/
        fourier.py).  Defaults to the netlist's .FOUR card."""
        from .analysis.fourier import fourier_analysis
        from .io.csvout import probe_selection
        from .netlist.parser import PrintCommand
        cfg = self.config.four
        if f0 is None:
            if not cfg.enabled:
                raise ValueError(".FOUR card missing")
            f0 = cfg.f0
        if probes is None:
            if not cfg.enabled:
                raise ValueError("explicit f0 requires `probes`")
            probes = cfg.probes
        sel = probe_selection(self.topo,
                              [PrintCommand(analysis="none", probes=probes)])
        if not sel:
            raise ValueError(".FOUR: no resolvable output probes")
        if result.xs is None:
            raise ValueError(".FOUR needs a transient run with save_xs=True")
        import numpy as np
        return fourier_analysis(np.asarray(result.times),
                                np.asarray(result.xs), f0, sel,
                                n_harm=n_harm)

    def pole_zero(self, params: Optional[Any] = None,
                  out_node: Optional[str] = None,
                  ref_node: Optional[str] = None,
                  input_source: Optional[str] = None,
                  x_op: Optional[Any] = None):
        """.PZ pole-zero analysis (analysis/pz.py) of the circuit
        linearized at the DC operating point; zeros require an input
        source."""
        from .analysis.pz import pole_zero
        from .analysis.sweep import find_source
        from .netlist.circuit import KIND_V
        cfg = self.config.pz
        if out_node is None:
            if not cfg.enabled:
                raise ValueError(".PZ card missing")
            out_node = cfg.out_node
            ref_node = ref_node or (cfg.ref_node or None)
            input_source = input_source or (cfg.input_source or None)

        def node_eq(name):
            nid = self.circuit.node_name_to_id.get(name)
            if nid is None:
                raise KeyError(f"unknown node {name!r}")
            return self.circuit.nodes[nid].eq_index

        out_eq = node_eq(out_node)
        if out_eq < 0:
            raise ValueError(f".PZ output node {out_node!r} is ground")
        ref_eq = node_eq(ref_node) if ref_node else -1
        input_ref = None
        if input_source:
            kind, idx = find_source(self.circuit, input_source)
            if kind == KIND_V:
                input_ref = ("v", int(self.topo.vs_k[idx]))
            else:
                input_ref = ("i", int(self.topo.is_ep[idx]),
                             int(self.topo.is_em[idx]))
        p = params if params is not None else self.params
        return pole_zero(self.engine, p, out_eq, ref_eq, input_ref,
                         x_op=x_op)

    def sensitivity(self, params: Optional[Any] = None,
                    out_node: Optional[str] = None,
                    ref_node: Optional[str] = None,
                    x_op: Optional[Any] = None):
        """.SENS DC sensitivity (analysis/sensitivity.py): gradient of
        V(out[,ref]) with respect to every circuit parameter via implicit
        differentiation at the operating point.  Returns (grads, rows)
        where grads matches the params pytree and rows is the sorted
        per-element report [(label, dV/dp, p*dV/dp)]."""
        from .analysis.sensitivity import dc_sensitivity, sensitivity_report
        cfg = self.config.sens
        if out_node is None:
            if not cfg.enabled:
                raise ValueError(".SENS card missing")
            out_node = cfg.out_node
            ref_node = ref_node or (cfg.ref_node or None)

        def node_eq(name):
            nid = self.circuit.node_name_to_id.get(name)
            if nid is None:
                raise KeyError(f"unknown node {name!r}")
            return self.circuit.nodes[nid].eq_index

        out_eq = node_eq(out_node)
        if out_eq < 0:
            raise ValueError(f".SENS output node {out_node!r} is ground")
        ref_eq = node_eq(ref_node) if ref_node else -1
        p = params if params is not None else self.params
        grads, _, _ = dc_sensitivity(self.engine, p, out_eq, ref_eq, x=x_op)
        rows = sensitivity_report(self.circuit, grads, normalize_params=p)
        return grads, rows

    def step(self, step_index: Optional[int] = None, save_xs: bool = True):
        """.STEP sweep (analysis/step.py): the step values run as ONE
        vmapped batch through the compiled engine — transient if a .TRAN
        card is present (with per-step .MEASURE evaluation), else the DC
        operating point.  Multiple .STEP cards form a cartesian grid
        (flattened into the same single batch); step_index selects one
        card only.  Returns a StepResult."""
        from .analysis.step import run_step
        if not self.config.steps:
            raise ValueError(".STEP card missing")
        cfgs = (self.config.steps if step_index is None
                else self.config.steps[step_index])
        return run_step(self, cfgs, save_xs=save_xs)

    def pac(self, deltas, f0: Optional[float] = None,
            n_harm: Optional[int] = None,
            n_sidebands: Optional[int] = None,
            pss_xs=None, params: Optional[Any] = None, **hb_kw):
        """Periodic AC analysis (analysis/pac.py): small-signal transfer
        functions of the circuit linearized around its periodic steady
        state — conversion gains from the sources' AC specs to every
        sideband m*f0 + delta.  The PSS defaults to the frequency-domain
        harmonic balance on the .hb card; pass pss_xs (K, N uniform
        samples, K odd) to reuse one."""
        from .analysis.pac import pac
        hb = self.config.hb
        f0 = f0 if f0 is not None else (hb.f0 if hb.enabled else None)
        if not f0 or f0 <= 0:
            raise ValueError("pac needs f0 (or a .hb card)")
        p = params if params is not None else self.params
        if pss_xs is None:
            pss_xs = self._pss_samples(p, f0, n_harm, **hb_kw)
        return pac(self.engine, p, f0, pss_xs, deltas,
                   n_sidebands=n_sidebands)

    def pxf(self, deltas, out_node: str, ref_node: Optional[str] = None,
            f0: Optional[float] = None, n_harm: Optional[int] = None,
            n_sidebands: Optional[int] = None,
            pss_xs=None, params: Optional[Any] = None, **hb_kw):
        """Periodic transfer functions (analysis/pac.py pxf) — the
        adjoint of PAC: ONE adjoint LPTV solve per offset gives the
        transfer from EVERY independent V/I source, injected at every
        sideband m*f0+delta, to V(out[,ref]) read at delta.  Use pac for
        "one input -> all output sidebands", pxf for "all inputs -> one
        output" (supply pushback, LO feedthrough, spur budgets)."""
        from .analysis.pac import pxf
        from .netlist.circuit import KIND_V, KIND_I
        hb = self.config.hb
        f0 = f0 if f0 is not None else (hb.f0 if hb.enabled else None)
        if not f0 or f0 <= 0:
            raise ValueError("pxf needs f0 (or a .hb card)")
        p = params if params is not None else self.params

        def node_eq(name):
            nid = self.circuit.node_name_to_id.get(name)
            if nid is None:
                raise KeyError(f"unknown node {name!r}")
            return self.circuit.nodes[nid].eq_index

        out_eq = node_eq(out_node)
        if out_eq < 0:
            raise ValueError(f"output node {out_node!r} is ground")
        ref_eq = node_eq(ref_node) if ref_node else -1
        if pss_xs is None:
            pss_xs = self._pss_samples(p, f0, n_harm, **hb_kw)
        res = pxf(self.engine, p, f0, pss_xs, deltas, out_eq, ref_eq,
                  n_sidebands=n_sidebands)
        res.v_names = tuple(e.name for e in self.circuit.elements
                            if e.kind == KIND_V)
        res.i_names = tuple(e.name for e in self.circuit.elements
                            if e.kind == KIND_I)
        return res

    def envelope(self, t_stop: float, dt_env: float,
                 f0: Optional[float] = None, n_harm: int = 7,
                 params: Optional[Any] = None, **kw):
        """Envelope-following transient (analysis/envelope.py): the
        circuit's harmonic envelopes at the carrier f0 time-stepped
        backward-Euler on the slow axis — modulated-carrier runs whose
        brute-force transient would need ~1/(f0*dt_env) more steps.
        SIN sources at >= f0/2 ride the fast axis, everything else
        (PULSE/PWL/EXP/baseband SIN, all DC terms) modulates the
        envelope.  Returns an EnvelopeResult (t1, per-harmonic complex
        envelope trajectories)."""
        from .analysis.envelope import envelope_transient
        hb = self.config.hb
        f0 = f0 if f0 is not None else (hb.f0 if hb.enabled else None)
        if not f0 or f0 <= 0:
            raise ValueError("envelope needs f0 (or a .hb card)")
        p = params if params is not None else self.params
        return envelope_transient(self.engine, p, f0, t_stop, dt_env,
                                  n_harm=n_harm, **kw)

    def monte_carlo_envelope(self, n: int, t_stop: float, dt_env: float,
                             seed: int = 0, sampler: str = "mc",
                             f0: Optional[float] = None,
                             n_harm: int = 7, **kw):
        """Monte-Carlo envelope transient: n perturbed lanes (netlist
        DEV=/LOT= tolerances) of the whole two-timescale run as ONE
        batched program (analysis/envelope.envelope_transient_batched —
        warm-up, t1=0 PSS, and every envelope step's (KN)² Newton solve
        vmapped over lanes).  Returns (bparams, EnvelopeBatchResult)."""
        from .analysis.envelope import envelope_transient_batched
        from .parallel.montecarlo import perturb_params_netlist
        if not self.lowered.mc_tols:
            raise ValueError("no DEV=/LOT= tolerances in the netlist")
        hb = self.config.hb
        f0 = f0 if f0 is not None else (hb.f0 if hb.enabled else None)
        if not f0 or f0 <= 0:
            raise ValueError("monte_carlo_envelope needs f0 (or a .hb "
                             "card)")
        bp = perturb_params_netlist(self.params, jax.random.key(seed), n,
                                    self.lowered.mc_tols, sampler=sampler)
        return bp, envelope_transient_batched(self.engine, bp, f0,
                                              t_stop, dt_env,
                                              n_harm=n_harm, **kw)

    def _pss_samples(self, p, f0, n_harm, **hb_kw):
        """Converged single-tone HB samples for the LPTV analyses; a
        non-converged PSS would silently produce plausible-looking garbage
        gains/noise, so it is an error here."""
        if self.config.hb.extra_tones:
            print("warning: multi-tone .hb card — PAC/PNOISE linearize "
                  "around the single-tone PSS at f0 only", file=sys.stderr)
        hbres = self.harmonic_balance(params=p, f0=f0, n_harm=n_harm,
                                      **hb_kw)
        if not bool(hbres.converged):
            raise RuntimeError(
                "periodic steady state did not converge (residual "
                f"{float(hbres.residual):.3e}); pass pss_xs= from a solver "
                "run you trust, or raise n_harm/warmup_periods")
        return hbres.xs

    def oscillator(self, f0_guess: float, anchor_node: str,
                   params: Optional[Any] = None, **kw):
        """Autonomous-oscillator periodic steady state
        (analysis/sstate.py oscillator_steady_state): shooting with the
        period as a Newton unknown and a phase anchor on `anchor_node`.
        Returns an OscillatorResult with the solved f0."""
        from .analysis.sstate import oscillator_steady_state
        nid = self.circuit.node_name_to_id.get(anchor_node)
        if nid is None:
            raise KeyError(f"unknown node {anchor_node!r}")
        eq = self.circuit.nodes[nid].eq_index
        if eq < 0:
            raise ValueError("anchor node is ground")
        p = params if params is not None else self.params
        return oscillator_steady_state(self.engine, p, f0_guess, eq, **kw)

    def oscillator_hb(self, f0_guess: float, anchor_node: str,
                      params: Optional[Any] = None, **kw):
        """Autonomous harmonic balance (analysis/hbosc.py oscillator_hb):
        the frequency-domain twin of `oscillator`, with f0 as a Newton
        unknown and a spectral phase anchor on `anchor_node`.  The only
        oscillator path that supports transmission lines (the delay is
        exact in the harmonic space).  Returns an HBOscResult."""
        from .analysis.hbosc import oscillator_hb
        nid = self.circuit.node_name_to_id.get(anchor_node)
        if nid is None:
            raise KeyError(f"unknown node {anchor_node!r}")
        eq = self.circuit.nodes[nid].eq_index
        if eq < 0:
            raise ValueError("anchor node is ground")
        p = params if params is not None else self.params
        return oscillator_hb(self.engine, p, f0_guess, eq, **kw)

    def oscillator_phase_noise_hb(self, offsets, f0_guess: Optional[float]
                                  = None, anchor_node: Optional[str] = None,
                                  osc=None, params: Optional[Any] = None,
                                  extra_pairs=None, extra_psd=None,
                                  **osc_kw):
        """Phase noise via the HB PPV (analysis/hbosc.py
        oscillator_phase_noise_hb): the left null vector of the autonomous
        HB Jacobian, normalized against the cycle tangent.  The phase-noise
        path for transmission-line (delay-line) oscillators; pass a
        converged `osc` (HBOscResult) or f0_guess + anchor_node."""
        from .analysis.hbosc import oscillator_phase_noise_hb
        p = params if params is not None else self.params
        if osc is None:
            if f0_guess is None or anchor_node is None:
                raise ValueError("give osc= or f0_guess + anchor_node")
            osc = self.oscillator_hb(f0_guess, anchor_node, params=p,
                                     **osc_kw)
            if not osc.converged:
                raise RuntimeError("autonomous HB did not converge "
                                   f"(residual {float(osc.residual):.3e})")
        return oscillator_phase_noise_hb(self.engine, p, osc, offsets,
                                         extra_pairs=extra_pairs,
                                         extra_psd=extra_psd)

    def oscillator_phase_noise(self, offsets, f0_guess: Optional[float]
                               = None, anchor_node: Optional[str] = None,
                               osc=None, params: Optional[Any] = None,
                               extra_sources=None, **osc_kw):
        """Phase noise of a free-running oscillator via the perturbation
        projection vector (analysis/oscnoise.py): Demir's phase-diffusion
        constant c from the Floquet adjoint of the shooting limit cycle,
        with the .NOISE device PSD catalog evaluated along the cycle.
        Returns an OscPhaseNoiseResult (L(Δf) in dBc/Hz, per-source
        contributions, predicted period jitter).

        Pass a converged `osc` result, or f0_guess + anchor_node to run
        the shooting here.  extra_sources: list of (node_p, node_m, psd)
        with node names ('0' = ground) and one-sided PSDs in A²/Hz."""
        from .analysis.oscnoise import oscillator_phase_noise
        p = params if params is not None else self.params
        if osc is None:
            if f0_guess is None or anchor_node is None:
                raise ValueError("give osc= or f0_guess + anchor_node")
            osc = self.oscillator(f0_guess, anchor_node, params=p, **osc_kw)
            if not osc.converged:
                raise RuntimeError("oscillator shooting did not converge "
                                   f"(residual {float(osc.residual):.3e})")
        extra_pairs = extra_psd = None
        if extra_sources:
            def node_eq(name):
                from .utils.numbers import is_ground_name
                if is_ground_name(name):
                    return -1
                nid = self.circuit.node_name_to_id.get(name)
                if nid is None:
                    raise KeyError(f"unknown node {name!r}")
                return self.circuit.nodes[nid].eq_index
            extra_pairs = [(node_eq(a), node_eq(b))
                           for a, b, _ in extra_sources]
            extra_psd = [s for _, _, s in extra_sources]
        return oscillator_phase_noise(self.engine, p, osc, offsets,
                                      extra_pairs=extra_pairs,
                                      extra_psd=extra_psd)

    def monte_carlo_oscillator_phase_noise(self, n: int, offsets,
                                           f0_guess: float,
                                           anchor_node: str,
                                           seed: int = 0,
                                           sampler: str = "mc",
                                           n_harm: int = 9, **kw):
        """Monte-Carlo oscillator phase noise: n perturbed lanes
        (netlist DEV=/LOT= tolerances) each solve their OWN autonomous-
        HB limit cycle + fundamental in one batched program
        (analysis/hbosc.oscillator_hb_batched), then every lane's PPV,
        Demir phase-diffusion constant, Lorentzian L(Δf) and period
        jitter extract in a second batched program (inverse-iteration
        null vectors — no per-lane host SVD).  Returns (bparams,
        HBOscBatchResult) with per-lane f0, c, L_dbc (n, F),
        period_jitter — i.e. frequency-pull AND jitter yield in two
        dispatches."""
        from .analysis.hbosc import (oscillator_hb_batched,
                                     oscillator_phase_noise_hb_batched)
        from .parallel.montecarlo import perturb_params_netlist
        if not self.lowered.mc_tols:
            raise ValueError("no DEV=/LOT= tolerances in the netlist")
        nid = self.circuit.node_name_to_id.get(anchor_node)
        if nid is None:
            raise KeyError(f"unknown node {anchor_node!r}")
        anchor_eq = self.circuit.nodes[nid].eq_index
        if anchor_eq < 0:
            raise ValueError(f"anchor node {anchor_node!r} is ground")
        bp = perturb_params_netlist(self.params, jax.random.key(seed), n,
                                    self.lowered.mc_tols, sampler=sampler)
        osc = oscillator_hb_batched(self.engine, bp, f0_guess, anchor_eq,
                                    n_harm=n_harm, **kw)
        return bp, oscillator_phase_noise_hb_batched(self.engine, bp,
                                                     osc, offsets)

    def pss_stability(self, ss=None, f0: Optional[float] = None,
                      params: Optional[Any] = None, **kw):
        """Floquet stability of a driven periodic steady state
        (analysis/oscnoise.pss_floquet): monodromy multipliers of the
        shooting solution — all |λ| < 1 means the PSS is an attractor;
        |λ| > 1 flags a repellor the transient can never settle on;
        λ → −1 warns of period doubling.  Pass ss= from steady_state()
        or let this run it (needs an .hb card or f0)."""
        from .analysis.oscnoise import pss_floquet
        p = params if params is not None else self.params
        if ss is None:
            ss = self.steady_state(params=p, f0=f0, **kw)
            if not bool(ss.converged):
                raise RuntimeError("steady state did not converge "
                                   f"(residual {float(ss.residual):.3e})")
        return pss_floquet(self.engine, p, ss, f0=f0)

    def injection_lock(self, inj_node: str, amp: float,
                       ref_node: Optional[str] = None,
                       f0_guess: Optional[float] = None,
                       anchor_node: Optional[str] = None,
                       osc=None, harmonic: int = 1,
                       method: str = "auto",
                       params: Optional[Any] = None, **osc_kw):
        """Adler injection-locking range from the oscillator PPV: a
        current amp·cos(2πf_inj·t) into inj_node[,ref_node] locks the
        oscillator for |f_inj − m·f0| ≤ lock_range_hz.  Pass a converged
        `osc` result (shooting OscillatorResult or HBOscResult — its
        type picks the path) or f0_guess + anchor_node to solve here;
        method='auto' uses autonomous HB for T-line decks (shooting
        cannot trace the delay ring) and shooting otherwise."""
        from .analysis.oscnoise import injection_lock
        from .analysis.hbosc import HBOscResult, injection_lock_hb
        from .utils.numbers import is_ground_name
        p = params if params is not None else self.params
        if method not in ("auto", "shooting", "hb"):
            raise ValueError("method must be auto/shooting/hb")
        if osc is None:
            if f0_guess is None or anchor_node is None:
                raise ValueError("give osc= or f0_guess + anchor_node")
            use_hb = (method == "hb" or
                      (method == "auto" and self.engine.n_tl > 0))
            if use_hb:
                osc = self.oscillator_hb(f0_guess, anchor_node, params=p,
                                         **osc_kw)
            else:
                osc = self.oscillator(f0_guess, anchor_node, params=p,
                                      **osc_kw)
            if not osc.converged:
                raise RuntimeError("oscillator solve did not converge "
                                   f"(residual {float(osc.residual):.3e})")

        def node_eq(name):
            if name is None or is_ground_name(name):
                return -1
            nid = self.circuit.node_name_to_id.get(name)
            if nid is None:
                raise KeyError(f"unknown node {name!r}")
            return self.circuit.nodes[nid].eq_index
        pair = (node_eq(inj_node), node_eq(ref_node))
        if isinstance(osc, HBOscResult):
            return injection_lock_hb(self.engine, p, osc, pair, amp,
                                     harmonic=harmonic)
        return injection_lock(self.engine, p, osc, pair, amp,
                              harmonic=harmonic)

    def subharmonic_lock(self, inj_node: str, amp: float, m: int = 2,
                         ref_node: Optional[str] = None,
                         f0_guess: Optional[float] = None,
                         anchor_node: Optional[str] = None,
                         osc=None, params: Optional[Any] = None,
                         **kw):
        """Subharmonic injection-locking range (f_osc = m·f_inj,
        injection near f0/m) by driven-HB fold search
        (analysis/hbosc.subharmonic_lock_hb) — the first-order PPV
        average is zero for subharmonic injection, so this solves the
        full driven HB warm-started from the free-running solution and
        bisects the fold where the locked branch disappears.  Pass a
        converged HBOscResult as osc= or f0_guess + anchor_node.
        Returns a SubharmonicLockResult (f_lo, f_hi, lock_range_hz)."""
        from .analysis.hbosc import HBOscResult, subharmonic_lock_hb
        from .utils.numbers import is_ground_name
        p = params if params is not None else self.params
        osc_kw = {k: kw.pop(k) for k in list(kw)
                  if k in ("n_harm", "warmup_periods", "steps_per_period",
                           "max_newton", "tol", "damping", "kick",
                           "gmin")}
        if osc is None:
            if f0_guess is None or anchor_node is None:
                raise ValueError("give osc= or f0_guess + anchor_node")
            osc = self.oscillator_hb(f0_guess, anchor_node, params=p,
                                     **osc_kw)
            if not osc.converged:
                raise RuntimeError("autonomous HB did not converge "
                                   f"(residual {float(osc.residual):.3e})")
        if not isinstance(osc, HBOscResult):
            raise TypeError("subharmonic_lock needs an HBOscResult "
                            "(use oscillator_hb)")

        def node_eq(name):
            if name is None or is_ground_name(name):
                return -1
            nid = self.circuit.node_name_to_id.get(name)
            if nid is None:
                raise KeyError(f"unknown node {name!r}")
            return self.circuit.nodes[nid].eq_index
        pair = (node_eq(inj_node), node_eq(ref_node))
        probe = kw.pop("probe_node", None)
        if probe is None:
            probe = pair[0] if pair[0] >= 0 else 0
        return subharmonic_lock_hb(self.engine, p, osc, pair, amp, m=m,
                                   probe_node=probe, **kw)

    def pnoise(self, deltas, out_node: str, ref_node: Optional[str] = None,
               f0: Optional[float] = None, n_harm: Optional[int] = None,
               pss_xs=None, params: Optional[Any] = None, **hb_kw):
        """Periodic (cyclostationary) noise at V(out[,ref]) around the
        periodic steady state (analysis/pac.py pnoise): time-averaged
        output PSD including sideband folding; shot noise is modulated by
        the instantaneous operating point."""
        from .analysis.pac import pnoise
        hb = self.config.hb
        f0 = f0 if f0 is not None else (hb.f0 if hb.enabled else None)
        if not f0 or f0 <= 0:
            raise ValueError("pnoise needs f0 (or a .hb card)")
        p = params if params is not None else self.params

        def node_eq(name):
            nid = self.circuit.node_name_to_id.get(name)
            if nid is None:
                raise KeyError(f"unknown node {name!r}")
            return self.circuit.nodes[nid].eq_index

        out_eq = node_eq(out_node)
        if out_eq < 0:
            raise ValueError(f"output node {out_node!r} is ground")
        ref_eq = node_eq(ref_node) if ref_node else -1
        if pss_xs is None:
            pss_xs = self._pss_samples(p, f0, n_harm, **hb_kw)
        return pnoise(self.engine, p, f0, pss_xs, deltas, out_eq, ref_eq)

    def envelope_noise(self, deltas, out_node: str,
                       t_stop: Optional[float] = None,
                       dt_env: Optional[float] = None,
                       ref_node: Optional[str] = None,
                       f0: Optional[float] = None, n_harm: int = 7,
                       t1_idx=None, env=None,
                       params: Optional[Any] = None, **env_kw):
        """Time-resolved envelope noise (analysis/envnoise.py): the
        output noise PSD at V(out[,ref]) along a modulated-carrier
        envelope trajectory — pnoise's adjoint LPTV solve rebuilt at
        each selected envelope time t1 (adiabatic approximation), with
        the device noise intensities tracking the instantaneous
        envelope.  Pass an EnvelopeResult via `env` to reuse one, or
        give t_stop/dt_env to run the envelope here; `t1_idx` selects
        envelope steps (default all).  Returns EnvelopeNoiseResult with
        onoise (T1s, F)."""
        from .analysis.envnoise import envelope_noise
        hb = self.config.hb
        f0 = f0 if f0 is not None else (hb.f0 if hb.enabled else None)
        if not f0 or f0 <= 0:
            raise ValueError("envelope_noise needs f0 (or a .hb card)")
        p = params if params is not None else self.params

        def node_eq(name):
            nid = self.circuit.node_name_to_id.get(name)
            if nid is None:
                raise KeyError(f"unknown node {name!r}")
            return self.circuit.nodes[nid].eq_index

        out_eq = node_eq(out_node)
        if out_eq < 0:
            raise ValueError(f"output node {out_node!r} is ground")
        ref_eq = node_eq(ref_node) if ref_node else -1
        if env is None:
            if t_stop is None or dt_env is None:
                raise ValueError("envelope_noise needs an EnvelopeResult "
                                 "(env=...) or t_stop and dt_env")
            env = self.envelope(t_stop, dt_env, f0=f0, n_harm=n_harm,
                                params=p, **env_kw)
        return envelope_noise(self.engine, p, env, deltas, out_eq,
                              ref_eq, t1_idx=t1_idx)

    def mixer_noise_figure(self, source_resistor: str, delta: float,
                           out_node: str, ref_node: Optional[str] = None,
                           sidebands=(1,),
                           f0: Optional[float] = None,
                           n_harm: Optional[int] = None,
                           pss_xs=None, params: Optional[Any] = None,
                           **hb_kw):
        """Conversion (mixer) noise figure at IF = delta referred to
        `source_resistor` (analysis/pac.py mixer_noise_figure): total
        periodic output noise — all sidebands folded — over the source
        resistor's contribution through the signal sideband(s).
        SSB by default (sidebands=(1,): input at f0+delta); DSB with
        sidebands=(1, -1).  Returns NF in dB."""
        from .analysis.pac import mixer_noise_figure
        from .netlist.circuit import KIND_R
        hb = self.config.hb
        f0 = f0 if f0 is not None else (hb.f0 if hb.enabled else None)
        if not f0 or f0 <= 0:
            raise ValueError("mixer_noise_figure needs f0 (or a .hb card)")
        p = params if params is not None else self.params
        ridx, j = None, 0
        for e in self.circuit.elements:
            if e.kind == KIND_R:
                if e.name.upper() == source_resistor.upper():
                    ridx = j
                    break
                j += 1
        if ridx is None:
            raise KeyError(f"no resistor named {source_resistor!r}")

        def node_eq(name):
            nid = self.circuit.node_name_to_id.get(name)
            if nid is None:
                raise KeyError(f"unknown node {name!r}")
            return self.circuit.nodes[nid].eq_index

        out_eq = node_eq(out_node)
        ref_eq = node_eq(ref_node) if ref_node else -1
        if pss_xs is None:
            pss_xs = self._pss_samples(p, f0, n_harm, **hb_kw)
        nf_db, _, _ = mixer_noise_figure(self.engine, p, f0, pss_xs,
                                         delta, out_eq, ridx,
                                         sidebands=sidebands,
                                         ref_eq=ref_eq)
        return nf_db

    def monte_carlo_mixer_noise_figure(self, n: int,
                                       source_resistor: str, delta: float,
                                       out_node: str,
                                       ref_node: Optional[str] = None,
                                       sidebands=(1,), seed: int = 0,
                                       sampler: str = "mc",
                                       f0: Optional[float] = None,
                                       n_harm: Optional[int] = None,
                                       **hb_kw):
        """Monte-Carlo conversion noise figure: n perturbed lanes'
        folded-pnoise NF at IF=delta from one batched adjoint LPTV solve
        around per-lane batched-HB steady states (analysis/pac.py
        mixer_noise_figure_batched).  Returns (bparams, nf_db (n,)) —
        NF yield in two dispatches."""
        from .analysis.hb import harmonic_balance_batched
        from .analysis.pac import mixer_noise_figure_batched
        from .netlist.circuit import KIND_R
        from .parallel.montecarlo import perturb_params_netlist
        if not self.lowered.mc_tols:
            raise ValueError("no DEV=/LOT= tolerances in the netlist")
        hb = self.config.hb
        f0 = f0 if f0 is not None else (hb.f0 if hb.enabled else None)
        if not f0 or f0 <= 0:
            raise ValueError("monte_carlo_mixer_noise_figure needs f0 "
                             "(or a .hb card)")
        n_harm = n_harm if n_harm is not None else (hb.n_harm or 8)
        ridx, j = None, 0
        for e in self.circuit.elements:
            if e.kind == KIND_R:
                if e.name.upper() == source_resistor.upper():
                    ridx = j
                    break
                j += 1
        if ridx is None:
            raise KeyError(f"no resistor named {source_resistor!r}")

        def node_eq(name):
            nid = self.circuit.node_name_to_id.get(name)
            if nid is None:
                raise KeyError(f"unknown node {name!r}")
            return self.circuit.nodes[nid].eq_index

        out_eq = node_eq(out_node)
        ref_eq = node_eq(ref_node) if ref_node else -1
        bp = perturb_params_netlist(self.params, jax.random.key(seed), n,
                                    self.lowered.mc_tols, sampler=sampler)
        pss = harmonic_balance_batched(self.engine, bp, f0,
                                       n_harm=n_harm, **hb_kw)
        nf_db, _, _ = mixer_noise_figure_batched(
            self.engine, bp, f0, pss.xs, delta, out_eq, ridx,
            sidebands=sidebands, ref_eq=ref_eq)
        conv = np.asarray(pss.converged)
        self._warn_unconverged_lanes(conv, "monte_carlo_mixer_noise_figure")
        nf_db = np.where(conv, nf_db, np.nan)
        return bp, nf_db

    def sparams(self, ports, freqs=None, params: Optional[Any] = None,
                x_op: Optional[Any] = None):
        """N-port S-parameters (analysis/sparams.py) of the circuit
        linearized at the DC operating point.  `ports` is a list of
        (node_p, node_m_or_None, z0) tuples (None = ground); `freqs`
        defaults to the .AC card's sweep.  Port terminations must NOT be
        in the netlist — matched loading is implicit."""
        from .analysis.ac import sweep_frequencies
        from .analysis.sparams import s_parameters
        if freqs is None:
            ac = self.config.ac
            if not ac.enabled:
                raise ValueError("no frequency sweep: give freqs or a "
                                 ".AC card")
            freqs = sweep_frequencies(ac.sweep_type, ac.n_points,
                                      ac.fstart, ac.fstop)
        dump = self.topo.n_unknowns

        def node_eq(name):
            if name is None or str(name).lower() in ("0", "gnd"):
                return dump
            nid = self.circuit.node_name_to_id.get(name)
            if nid is None:
                raise KeyError(f"unknown node {name!r}")
            eqi = self.circuit.nodes[nid].eq_index
            return eqi if eqi >= 0 else dump
        port_eqs = [(node_eq(p), node_eq(m)) for (p, m, _) in ports]
        z0s = [z for (_, _, z) in ports]
        p = params if params is not None else self.params
        if x_op is None:
            x_op = self.dc(params=params)
        return s_parameters(self.engine, p, port_eqs, z0s, freqs, x_op)

    def stability(self, ports=None, freqs=None, sres=None,
                  params: Optional[Any] = None, x_op: Optional[Any] = None):
        """Two-port stability/gain metrics (analysis/sparams.py
        two_port_metrics): Rollett K, determinant delta, Edwards-Sinsky
        mu/mu', MSG, MAG, Mason's U, and the unconditional-stability
        verdict per frequency.  Pass `ports` (two (node_p, node_m, z0)
        tuples, like sparams) to extract S first, or `sres` to reuse an
        SParamResult."""
        from .analysis.sparams import two_port_metrics
        if sres is None:
            if ports is None or len(ports) != 2:
                raise ValueError("stability needs two ports (or sres=)")
            sres = self.sparams(ports, freqs=freqs, params=params,
                                x_op=x_op)
        return two_port_metrics(sres)

    def hot_sparams(self, ports, deltas, f0: Optional[float] = None,
                    n_sidebands: int = 1, n_harm: Optional[int] = None,
                    pss_xs=None, params: Optional[Any] = None, **hb_kw):
        """Periodic (hot) S-parameters (analysis/psp.py): the
        frequency-translating scattering matrix of the circuit
        linearized around its periodic steady state at f0 — every
        (port, sideband m in -M..M) pair is one terminal of an extended
        multiport, so a mixer's delta -> f0+delta conversion gain is
        res.s_at(1, 1, 0, 0).  `ports` is a list of
        (node_p, node_m_or_None, z0) tuples exactly like sparams();
        port terminations must NOT be in the netlist.  The PSS defaults
        to harmonic balance on the .hb card; pass pss_xs to reuse one."""
        from .analysis.psp import periodic_s_parameters
        hb = self.config.hb
        f0 = f0 if f0 is not None else (hb.f0 if hb.enabled else None)
        if not f0 or f0 <= 0:
            raise ValueError("hot_sparams needs f0 (or a .hb card)")
        dump = self.topo.n_unknowns

        def node_eq(name):
            if name is None or str(name).lower() in ("0", "gnd"):
                return dump
            nid = self.circuit.node_name_to_id.get(name)
            if nid is None:
                raise KeyError(f"unknown node {name!r}")
            eqi = self.circuit.nodes[nid].eq_index
            return eqi if eqi >= 0 else dump
        port_eqs = [(node_eq(p), node_eq(m)) for (p, m, _) in ports]
        z0s = [z for (_, _, z) in ports]
        p = params if params is not None else self.params
        if pss_xs is None:
            pss_xs = self._pss_samples(p, f0, n_harm, **hb_kw)
        return periodic_s_parameters(self.engine, p, f0, pss_xs,
                                     port_eqs, z0s, deltas,
                                     n_sidebands=n_sidebands)

    def lssp(self, ports, power, f0: Optional[float] = None,
             n_harm: int = 7, params: Optional[Any] = None, **hb_kw):
        """Large-signal S-parameters at drive amplitude `power` (watts
        available at the driven port).  Unlike sparams()/hot_sparams(),
        the port terminations LIVE IN THE NETLIST: each port is a
        Thevenin pair — an independent V source with a SIN at f0 in
        series with a z0 resistor — and `ports` lists
        (source_name, port_node, z0) per port, `port_node` being the
        terminal AFTER the series resistor.  One harmonic-balance solve
        per port: port j's source amplitude is set to
        A_j = sqrt(8 z0_j P) (available power P = A^2/(8 z0)), every
        other port source to 0, and the fundamental waves are read off
        the HB spectrum in the e^{+jwt} phasor convention:
        a_j = Vs_j/(2 sqrt(z0_j)), b_i = (2 V_i - Vs_i)/(2 sqrt(z0_i))
        (V across the ideal source is Vs, so both waves come from node
        phasors of the SAME solution — no waveform-phase bookkeeping).
        Returns a dict: s (n, n) complex, a1db-style per-port drive
        amplitudes `amps`, and the per-port HBResults."""
        import numpy as _np
        from .analysis.hb import harmonic_balance
        hb = self.config.hb
        f0 = f0 if f0 is not None else (hb.f0 if hb.enabled else None)
        if not f0 or f0 <= 0:
            raise ValueError("lssp needs f0 (or a .hb card)")
        n = len(ports)
        src_idx, node_eqs, vs_ep, z0 = self._lssp_ports(ports)
        p0 = dict(params if params is not None else self.params)
        amps = _np.sqrt(8.0 * z0 * float(power))
        S = _np.zeros((n, n), complex)
        results = []
        for j in range(n):
            vs_sin = p0["vs_sin"]
            for i, si in enumerate(src_idx):
                vs_sin = vs_sin.at[si, 1].set(amps[j] if i == j else 0.0)
            p = dict(p0)
            p["vs_sin"] = vs_sin
            res = harmonic_balance(self.engine, p, f0, n_harm=n_harm,
                                   **hb_kw)
            if not bool(res.converged):
                raise RuntimeError(f"lssp HB did not converge driving "
                                   f"port {j} (residual "
                                   f"{float(res.residual):.3e})")
            results.append(res)
            c1 = _np.concatenate([_np.asarray(res.spectrum[1]), [0.0]])
            vs = c1[vs_ep]                    # source phasors (n,)
            vp = c1[node_eqs]                 # port-node phasors (n,)
            a_j = vs[j] / (2.0 * _np.sqrt(z0[j]))
            b = (2.0 * vp - vs) / (2.0 * _np.sqrt(z0))
            S[:, j] = b / a_j
        return {"s": S, "amps": amps, "results": results}

    def _lssp_ports(self, ports):
        """Validate lssp-style (source, node, z0) ports; returns
        (src_idx, node_eqs, vs_ep, z0)."""
        import numpy as _np
        from .analysis.sweep import find_source
        from .netlist.circuit import KIND_V
        src_idx, node_eqs, z0 = [], [], []
        for (src, node, z) in ports:
            kind, sidx = find_source(self.circuit, src)
            if kind != KIND_V:
                raise ValueError(f"lssp port source {src!r} must be a "
                                 "V source")
            src_idx.append(sidx)
            nid = self.circuit.node_name_to_id.get(node)
            if nid is None:
                raise KeyError(f"unknown node {node!r}")
            eqi = self.circuit.nodes[nid].eq_index
            if eqi < 0:
                raise ValueError(f"port node {node!r} is ground")
            node_eqs.append(eqi)
            z0.append(float(z))
        # the source's own positive terminal (phasor of Vs) — valid only
        # for a grounded Thevenin port: Vs = V(ep) requires em = ground
        # (the dump slot). A floating port source would need the branch
        # voltage V(ep)-V(em); reject it rather than report wrong waves.
        dump = self.engine.N
        for i, (src, _, _) in zip(src_idx, ports):
            if int(self.topo.vs_em[i]) != dump:
                raise ValueError(
                    f"lssp port source {src!r} is floating (negative "
                    "terminal not ground): S-parameter ports must be "
                    "grounded Thevenin sources (Vsrc + series Z0 to "
                    "ground)")
        vs_ep = [int(self.topo.vs_ep[i]) for i in src_idx]
        return src_idx, node_eqs, vs_ep, _np.asarray(z0)

    def lssp_batched(self, ports, powers, f0: Optional[float] = None,
                     n_harm: int = 7, bparams: Optional[Any] = None,
                     **hb_kw):
        """Batched large-signal S-parameters: every (Monte-Carlo lane,
        drive power, driven port) triple is one lane of a SINGLE
        harmonic_balance_batched program — the whole power sweep (e.g. a
        P1dB compression curve) and parameter spread solve in one TPU
        dispatch instead of lssp()'s one HB per (power, port).

        ports/f0 conventions exactly like lssp(); `powers` is a (Pw,)
        array of available powers in watts; `bparams` an optional params
        pytree with a leading lane axis (perturb_params) — omitted, the
        nominal params run as one lane.  Returns a dict: s (B, Pw, n, n)
        complex, amps (Pw, n), converged (B, Pw, n) bool, and the raw
        HBBatchResult as `result` (lane order: b, then power, then
        driven port)."""
        import numpy as _np
        from .analysis.hb import harmonic_balance_batched
        hb = self.config.hb
        f0 = f0 if f0 is not None else (hb.f0 if hb.enabled else None)
        if not f0 or f0 <= 0:
            raise ValueError("lssp needs f0 (or a .hb card)")
        n = len(ports)
        src_idx, node_eqs, vs_ep, z0 = self._lssp_ports(ports)
        powers = _np.asarray(powers, float).ravel()
        Pw = len(powers)
        if bparams is None:
            bparams = jax.tree.map(lambda x: jnp.asarray(x)[None],
                                   dict(self.params))
        B = int(jax.tree.leaves(bparams)[0].shape[0])
        L = B * Pw * n

        # (Pw, n_drive) drive amplitudes: A = sqrt(8 z0 P)
        amps = _np.sqrt(8.0 * z0[None, :] * powers[:, None])   # (Pw, n)
        tiled = jax.tree.map(
            lambda x: jnp.repeat(jnp.asarray(x), Pw * n, axis=0), bparams)
        # per-flat-lane SIN amplitude of every port source: port j gets
        # amps[ip, j] on its own drive lane, 0 on the others
        lane_amp = _np.zeros((B, Pw, n, len(src_idx)))
        for j in range(n):
            lane_amp[:, :, j, j] = amps[:, j][None, :]
        vs_sin = tiled["vs_sin"]
        for i, si in enumerate(src_idx):
            vs_sin = vs_sin.at[:, si, 1].set(
                jnp.asarray(lane_amp[..., i].reshape(L)))
        tiled = dict(tiled)
        tiled["vs_sin"] = vs_sin

        res = harmonic_balance_batched(self.engine, tiled, f0,
                                       n_harm=n_harm, **hb_kw)
        c1 = _np.concatenate(
            [_np.asarray(res.spectrum[:, 1]),
             _np.zeros((L, 1), complex)], axis=1)               # (L, N+1)
        vs = c1[:, vs_ep].reshape(B, Pw, n, n)     # (.., drive j, port i)
        vp = c1[:, node_eqs].reshape(B, Pw, n, n)
        # incident wave of the driven port only: a_j = Vs_j/(2 sqrt z0_j)
        a = vs.diagonal(axis1=-2, axis2=-1) / (2.0 * _np.sqrt(z0))
        b_w = (2.0 * vp - vs) / (2.0 * _np.sqrt(z0)[None, None, None, :])
        S = _np.moveaxis(b_w / a[..., :, None], -2, -1)  # (B, Pw, i, j)
        conv = _np.asarray(res.converged).reshape(B, Pw, n)
        return {"s": S, "amps": amps, "converged": conv, "result": res}

    def monte_carlo_lssp(self, n: int, ports, powers, seed: int = 0,
                         sampler: str = "mc", **kw):
        """Monte-Carlo large-signal S-parameters: n perturbed lanes
        (netlist DEV=/LOT= tolerances) x len(powers) drive levels x
        len(ports) driven ports, all as ONE batched HB program.
        Returns (bparams, lssp_batched dict with s (n, Pw, p, p))."""
        from .parallel.montecarlo import perturb_params_netlist
        if not self.lowered.mc_tols:
            raise ValueError("no DEV=/LOT= tolerances in the netlist")
        bp = perturb_params_netlist(self.params, jax.random.key(seed), n,
                                    self.lowered.mc_tols, sampler=sampler)
        return bp, self.lssp_batched(ports, powers, bparams=bp, **kw)

    def monte_carlo_psp(self, n: int, ports, deltas, seed: int = 0,
                        sampler: str = "mc", f0: Optional[float] = None,
                        n_sidebands: int = 1,
                        n_harm: Optional[int] = None, **hb_kw):
        """Monte-Carlo hot S-parameters: n perturbed lanes each
        linearized around their OWN batched-HB periodic steady state,
        with every (lane, offset) LPTV solve in one batched TPU program
        (analysis/psp.periodic_s_parameters_batched).  `ports` like
        hot_sparams ((node_p, node_m_or_None, z0); terminations NOT in
        the netlist).  Returns (bparams, PSPBatchResult)."""
        from .analysis.hb import harmonic_balance_batched
        from .analysis.psp import periodic_s_parameters_batched
        from .parallel.montecarlo import perturb_params_netlist
        if not self.lowered.mc_tols:
            raise ValueError("no DEV=/LOT= tolerances in the netlist")
        hb = self.config.hb
        f0 = f0 if f0 is not None else (hb.f0 if hb.enabled else None)
        if not f0 or f0 <= 0:
            raise ValueError("monte_carlo_psp needs f0 (or a .hb card)")
        n_harm = n_harm if n_harm is not None else (hb.n_harm or 8)
        dump = self.topo.n_unknowns

        def node_eq(name):
            if name is None or str(name).lower() in ("0", "gnd"):
                return dump
            nid = self.circuit.node_name_to_id.get(name)
            if nid is None:
                raise KeyError(f"unknown node {name!r}")
            eqi = self.circuit.nodes[nid].eq_index
            return eqi if eqi >= 0 else dump
        port_eqs = [(node_eq(p), node_eq(m)) for (p, m, _) in ports]
        z0s = [z for (_, _, z) in ports]
        bp = perturb_params_netlist(self.params, jax.random.key(seed), n,
                                    self.lowered.mc_tols, sampler=sampler)
        pss = harmonic_balance_batched(self.engine, bp, f0,
                                       n_harm=n_harm, **hb_kw)
        return bp, periodic_s_parameters_batched(
            self.engine, bp, f0, pss.xs, port_eqs, z0s, deltas,
            n_sidebands=n_sidebands)

    def monte_carlo_pnoise(self, n: int, deltas, out_node: str,
                           ref_node: Optional[str] = None, seed: int = 0,
                           sampler: str = "mc", f0: Optional[float] = None,
                           n_harm: Optional[int] = None, **hb_kw):
        """Monte-Carlo periodic noise: n perturbed lanes, each lane's
        cyclostationary output PSD computed around its OWN batched-HB
        periodic steady state, with every (lane, offset) adjoint LPTV
        solve in one batched TPU program (analysis/pac.pnoise_batched).
        Returns (bparams, PNoiseBatchResult) with onoise (n, F) and the
        per-device-kind breakdown."""
        from .analysis.hb import harmonic_balance_batched
        from .analysis.pac import pnoise_batched
        from .parallel.montecarlo import perturb_params_netlist
        if not self.lowered.mc_tols:
            raise ValueError("no DEV=/LOT= tolerances in the netlist")
        hb = self.config.hb
        f0 = f0 if f0 is not None else (hb.f0 if hb.enabled else None)
        if not f0 or f0 <= 0:
            raise ValueError("monte_carlo_pnoise needs f0 (or a .hb card)")
        n_harm = n_harm if n_harm is not None else (hb.n_harm or 8)

        def node_eq(name):
            nid = self.circuit.node_name_to_id.get(name)
            if nid is None:
                raise KeyError(f"unknown node {name!r}")
            return self.circuit.nodes[nid].eq_index

        out_eq = node_eq(out_node)
        if out_eq < 0:
            raise ValueError(f"output node {out_node!r} is ground")
        ref_eq = node_eq(ref_node) if ref_node else -1
        bp = perturb_params_netlist(self.params, jax.random.key(seed), n,
                                    self.lowered.mc_tols, sampler=sampler)
        pss = harmonic_balance_batched(self.engine, bp, f0,
                                       n_harm=n_harm, **hb_kw)
        res = pnoise_batched(self.engine, bp, f0, pss.xs, deltas,
                             out_eq, ref_eq)
        res.converged = np.asarray(pss.converged)
        self._warn_unconverged_lanes(res.converged, "monte_carlo_pnoise")
        return bp, res

    def monte_carlo_pac(self, n: int, deltas, seed: int = 0,
                        sampler: str = "mc", f0: Optional[float] = None,
                        n_sidebands: Optional[int] = None,
                        n_harm: Optional[int] = None, **hb_kw):
        """Monte-Carlo periodic AC: n perturbed lanes' conversion gains
        around their OWN batched-HB steady states, every (lane, offset)
        LPTV solve in one batched program (analysis/pac.pac_batched).
        Returns (bparams, PACBatchResult) with spectrum (n, F, M, N)."""
        from .analysis.hb import harmonic_balance_batched
        from .analysis.pac import pac_batched
        from .parallel.montecarlo import perturb_params_netlist
        if not self.lowered.mc_tols:
            raise ValueError("no DEV=/LOT= tolerances in the netlist")
        hb = self.config.hb
        f0 = f0 if f0 is not None else (hb.f0 if hb.enabled else None)
        if not f0 or f0 <= 0:
            raise ValueError("monte_carlo_pac needs f0 (or a .hb card)")
        n_harm = n_harm if n_harm is not None else (hb.n_harm or 8)
        bp = perturb_params_netlist(self.params, jax.random.key(seed), n,
                                    self.lowered.mc_tols, sampler=sampler)
        pss = harmonic_balance_batched(self.engine, bp, f0,
                                       n_harm=n_harm, **hb_kw)
        res = pac_batched(self.engine, bp, f0, pss.xs, deltas,
                          n_sidebands=n_sidebands)
        res.converged = np.asarray(pss.converged)
        self._warn_unconverged_lanes(res.converged, "monte_carlo_pac")
        return bp, res

    def monte_carlo_pxf(self, n: int, deltas, out_node: str,
                        ref_node: Optional[str] = None, seed: int = 0,
                        sampler: str = "mc", f0: Optional[float] = None,
                        n_sidebands: Optional[int] = None,
                        n_harm: Optional[int] = None, **hb_kw):
        """Monte-Carlo periodic transfer functions: every lane's full
        source x input-sideband -> output table from batched adjoint
        LPTV solves (analysis/pac.pxf_batched).  Returns (bparams,
        PXFBatchResult) with xf_v (n, F, M, nV) / xf_i (n, F, M, nI)."""
        from .analysis.hb import harmonic_balance_batched
        from .analysis.pac import pxf_batched
        from .netlist.circuit import KIND_V, KIND_I
        from .parallel.montecarlo import perturb_params_netlist
        if not self.lowered.mc_tols:
            raise ValueError("no DEV=/LOT= tolerances in the netlist")
        hb = self.config.hb
        f0 = f0 if f0 is not None else (hb.f0 if hb.enabled else None)
        if not f0 or f0 <= 0:
            raise ValueError("monte_carlo_pxf needs f0 (or a .hb card)")
        n_harm = n_harm if n_harm is not None else (hb.n_harm or 8)

        def node_eq(name):
            nid = self.circuit.node_name_to_id.get(name)
            if nid is None:
                raise KeyError(f"unknown node {name!r}")
            return self.circuit.nodes[nid].eq_index

        out_eq = node_eq(out_node)
        if out_eq < 0:
            raise ValueError(f"output node {out_node!r} is ground")
        ref_eq = node_eq(ref_node) if ref_node else -1
        bp = perturb_params_netlist(self.params, jax.random.key(seed), n,
                                    self.lowered.mc_tols, sampler=sampler)
        pss = harmonic_balance_batched(self.engine, bp, f0,
                                       n_harm=n_harm, **hb_kw)
        res = pxf_batched(self.engine, bp, f0, pss.xs, deltas, out_eq,
                          ref_eq, n_sidebands=n_sidebands)
        res.v_names = tuple(e.name for e in self.circuit.elements
                            if e.kind == KIND_V)
        res.i_names = tuple(e.name for e in self.circuit.elements
                            if e.kind == KIND_I)
        res.converged = np.asarray(pss.converged)
        self._warn_unconverged_lanes(res.converged, "monte_carlo_pxf")
        return bp, res

    @staticmethod
    def _warn_unconverged_lanes(converged, what: str):
        """Batched-HB lanes that did not converge feed every downstream
        LPTV stage a wrong steady state — surface them loudly instead of
        silently returning plausible-looking per-lane numbers."""
        import warnings
        bad = int(np.size(converged) - np.count_nonzero(converged))
        if bad:
            warnings.warn(
                f"{what}: {bad}/{np.size(converged)} HB lane(s) did not "
                f"converge; mask those lanes via the result's .converged "
                f"field before trusting their numbers", stacklevel=3)

    def monte_carlo(self, n: int, seed: int = 0,
                    params: Optional[Any] = None,
                    warm_start: bool = True,
                    sampler: str = "mc"):
        """Netlist-driven Monte Carlo from `DEV=`/`LOT=` tolerances on
        R/C/L cards (the value) and M/J/D/Q instance cards (VT/VTO, IS,
        BF mismatch) — parallel/montecarlo.perturb_params_netlist.

        Runs the deck's primary analysis over n perturbed lanes in ONE
        batched solve: with .TRAN + .MEASURE TRAN cards, returns
        (bparams, {measure: (n,) values}); with .AC + .MEASURE AC cards,
        one batched lanes x frequencies sweep with per-lane measures;
        otherwise (bparams, (n, N) DC operating points).

        warm_start (default True): every lane's DC init starts from the
        NOMINAL operating point and runs only the final Newton stage —
        perturbed lanes sit within a few percent of nominal, so this
        skips the 10-step source ramp per lane (same fixpoint and
        tolerance; see batched_dc_warm).  False restores the full ramp
        (reference-schedule trajectories).

        sampler: "mc" (default, independent draws) | "lhs" | "sobol" |
        "antithetic" — variance-reduction sampling plans for the same
        lognormal tolerances (parallel/montecarlo.normal_draws)."""
        from .parallel.montecarlo import (
            perturb_params_netlist, batched_transient_measures,
            batched_dc_fast, batched_dc_warm)
        if not self.lowered.mc_tols:
            raise ValueError("no DEV=/LOT= tolerances in the netlist")
        p = params if params is not None else self.params
        bp = perturb_params_netlist(p, jax.random.key(seed), n,
                                    self.lowered.mc_tols,
                                    sampler=sampler)
        warm = warm_start and self.topo.has_nonlinear

        def dc_init():
            if warm:
                return batched_dc_warm(self.engine, bp, self.dc(params=p))
            return batched_dc_fast(self.engine, bp)

        tran = self.config.tran
        if tran.enabled and any(m.analysis == "tran"
                                for m in self.config.measures):
            _, vals = batched_transient_measures(
                self.engine, bp, tran.tstep, tran.tstop,
                [m for m in self.config.measures if m.analysis == "tran"],
                self.topo, x0=dc_init())
            return bp, vals
        ac = self.config.ac
        if ac.enabled and any(m.analysis == "ac"
                              for m in self.config.measures):
            # Monte-Carlo AC: one batched (lanes x frequencies) solve,
            # then the .MEASURE AC cards per lane on the host
            import numpy as np
            from .analysis.ac import ac_analysis_batched, sweep_frequencies
            from .analysis.measure import run_measures
            freqs = sweep_frequencies(ac.sweep_type, ac.n_points,
                                      ac.fstart, ac.fstop)
            res = ac_analysis_batched(self.engine, bp, freqs,
                                      x_ops=dc_init())
            ms = [m for m in self.config.measures if m.analysis == "ac"]
            rows = [dict(run_measures(ms, self.topo, freqs, lane_xs, "ac",
                                      bindings=self.config.param_values))
                    for lane_xs in res.xs]
            vals = {m.name: np.asarray([r[m.name] for r in rows])
                    for m in ms}
            return bp, vals
        return bp, dc_init()

    def yield_analysis(self, key, batch: int, rel_sigma, specs,
                       params: Optional[Any] = None,
                       sampler: str = "mc", sigma_scale: float = 1.0,
                       shift=None):
        """Monte-Carlo yield over the .TRAN card with streaming .MEASURE
        scoring (parallel/montecarlo.yield_analysis): `rel_sigma` maps
        param names (e.g. "res_r", "mos_vth") to relative sigmas, `specs`
        maps .MEASURE names to (low, high) acceptance bounds.  sampler
        selects the sampling plan ("mc" | "lhs" | "sobol" |
        "antithetic"); sigma_scale > 1 enables scaled-sigma importance
        sampling for high-sigma (rare-failure) yield with per-lane
        likelihood-ratio weights; shift= (e.g. worst_case()'s z_star)
        centers the draws on the most probable failure point —
        MPP-centered IS, the classic second stage after FORM.

        Decks with a .TRAN card + .MEASURE TRAN cards score on the
        streaming transient; otherwise an .AC card + .MEASURE AC cards
        score on the batched lanes×frequencies small-signal sweep (RF
        yield — same sampling plans and IS machinery)."""
        from .parallel.montecarlo import yield_analysis
        if not self.config.measures:
            raise ValueError("yield analysis needs .MEASURE cards")
        p = params if params is not None else self.params
        tran = self.config.tran
        tran_ms = [m for m in self.config.measures
                   if m.analysis == "tran"]
        if tran.enabled and tran_ms:
            return yield_analysis(
                self.engine, self.topo, p, key, batch, rel_sigma,
                tran_ms, specs, tran.tstep, tran.tstop, sampler=sampler,
                sigma_scale=sigma_scale, shift=shift)
        ac = self.config.ac
        ac_ms = [m for m in self.config.measures if m.analysis == "ac"]
        if ac.enabled and ac_ms:
            freqs = self._ac_freqs()
            return yield_analysis(
                self.engine, self.topo, p, key, batch, rel_sigma,
                ac_ms, specs, 0.0, 0.0, sampler=sampler,
                sigma_scale=sigma_scale, shift=shift, analysis="ac",
                freqs=freqs, bindings=self.config.param_values)
        raise ValueError("yield analysis needs .TRAN + .MEASURE TRAN "
                         "cards or .AC + .MEASURE AC cards")

    def worst_case(self, rel_sigma, g_fn=None, probe: str = None,
                   at: float = None, low=None, high=None,
                   params: Optional[Any] = None,
                   analysis: str = "tran", measure: str = None, **kw):
        """FORM worst-case analysis (analysis/form.mpp_search): find the
        most probable failure point in the standard-normal mismatch
        space of `rel_sigma`, via gradient (adjoint) HL-RF iterations.
        Returns beta (sigmas-to-failure), the FORM p_fail = Φ(−β), the
        worst-case parameter set, and the importance direction alpha.

        analysis="tran" (default): pass `g_fn(times, xs) -> scalar`
        (g < 0 = failure), or `measure="name"` to bound one of the
        deck's own `.MEASURE TRAN` cards (differentiable measure layer
        — crossing times and TRIG/TARG delays included: timing yield),
        or the shorthand probe/at/low/high for a `FIND V(probe) AT=at`
        window spec; needs a .TRAN card.

        analysis="ac": the limit state evaluates on the differentiable
        small-signal solve — pass `g_fn(freqs, xr, xi)` plus
        `freqs=` in **kw, or the shorthand probe/at/low/high where
        `at` is the FREQUENCY and low/high bound |V(probe)|."""
        from .analysis.form import (mpp_search, limit_state_find_at,
                                    limit_state_ac_mag,
                                    limit_state_measure_ac)
        p = params if params is not None else self.params
        if analysis == "ac":
            if g_fn is None and measure is not None:
                ms = [m for m in self.config.measures
                      if m.name == measure and m.analysis == "ac"]
                if not ms:
                    raise KeyError(f"no .MEASURE AC card named "
                                   f"{measure!r}")
                g_fn = limit_state_measure_ac(ms[0], self.topo, low=low,
                                              high=high)
                kw.setdefault("freqs", self._ac_freqs())
            if g_fn is None:
                if probe is None or at is None:
                    raise ValueError("pass g_fn+freqs, measure=, or "
                                     "probe/at/low/high")
                nid = self.circuit.node_name_to_id.get(probe)
                if nid is None:
                    raise KeyError(f"unknown node {probe!r}")
                eqi = self.circuit.nodes[nid].eq_index
                g_fn = limit_state_ac_mag(eqi, low=low, high=high)
                kw.setdefault("freqs", [at])
            return mpp_search(self.engine, p, rel_sigma, 0.0, 0.0,
                              g_fn, analysis="ac", **kw)
        if analysis == "dc":
            if g_fn is None:
                if probe is None:
                    raise ValueError("pass g_fn or probe/low/high")
                from .analysis.form import limit_state_dc
                nid = self.circuit.node_name_to_id.get(probe)
                if nid is None:
                    raise KeyError(f"unknown node {probe!r}")
                eqi = self.circuit.nodes[nid].eq_index
                g_fn = limit_state_dc(eqi, low=low, high=high)
            return mpp_search(self.engine, p, rel_sigma, 0.0, 0.0,
                              g_fn, analysis="dc", **kw)
        tran = self.config.tran
        if not tran.enabled:
            raise ValueError("worst-case analysis needs a .TRAN card")
        if g_fn is None and measure is not None:
            from .analysis.form import limit_state_measure
            ms = [m for m in self.config.measures
                  if m.name == measure and m.analysis == "tran"]
            if not ms:
                raise KeyError(f"no .MEASURE TRAN card named {measure!r}")
            g_fn = limit_state_measure(ms[0], self.topo, low=low,
                                       high=high)
        if g_fn is None:
            if probe is None or at is None:
                raise ValueError("pass g_fn, measure=, or "
                                 "probe/at/low/high")
            nid = self.circuit.node_name_to_id.get(probe)
            if nid is None:
                raise KeyError(f"unknown node {probe!r}")
            eqi = self.circuit.nodes[nid].eq_index
            g_fn = limit_state_find_at(eqi, at, low=low, high=high)
        return mpp_search(self.engine, p,
                          rel_sigma, tran.tstep, tran.tstop, g_fn, **kw)

    def sobol_indices(self, key, n: int, rel_sigma,
                      params: Optional[Any] = None, sampler: str = "lhs"):
        """Global variance-based sensitivity of every `.MEASURE` value:
        first-order (S1) and total-effect (ST) Sobol indices over the
        mismatch space (parallel/montecarlo.sobol_indices).  All
        (dims+2)·n Saltelli evaluations run as ONE batched solve;
        ST−S1 > 0 exposes parameter interactions the linearized
        mismatch_budget cannot see.  Decks with .TRAN + .MEASURE TRAN
        cards score on the transient, otherwise .AC + .MEASURE AC cards
        score on the lanes×frequencies sweep."""
        from .parallel.montecarlo import sobol_indices
        p = params if params is not None else self.params
        tran = self.config.tran
        ms = [m for m in self.config.measures if m.analysis == "tran"]
        if tran.enabled and ms:
            return sobol_indices(
                self.engine, self.topo, p,
                key, n, rel_sigma, ms, tran.tstep, tran.tstop,
                sampler=sampler)
        ac = self.config.ac
        ac_ms = [m for m in self.config.measures if m.analysis == "ac"]
        if ac.enabled and ac_ms:
            freqs = self._ac_freqs()
            return sobol_indices(
                self.engine, self.topo, p, key, n, rel_sigma, ac_ms,
                0.0, 0.0, sampler=sampler, analysis="ac", freqs=freqs,
                bindings=self.config.param_values)
        raise ValueError("Sobol indices need .TRAN + .MEASURE TRAN "
                         "cards or .AC + .MEASURE AC cards")

    def calibrate(self, target, probe: str, param_names,
                  steps: int = 200, lr: float = 0.05,
                  params: Optional[Any] = None, verbose: bool = False):
        """Fit named parameter leaves so the probe's transient waveform
        matches `target` — gradient calibration through the reverse-mode
        adjoint (analysis/adjoint.diff_transient), optimized in
        log-space (positivity-preserving) with optax Adam.

        target: (n_steps+1,) waveform on the .TRAN grid (e.g. a
        measured trace resampled to the grid, or another run's
        xs[:, eq]).  param_names: list of leaves to fit (e.g.
        ["res_r", "cap_c"]).  Returns (fitted params dict, loss
        history).  Cost per step: one forward transient + one adjoint
        sweep, independent of the number of fitted parameters."""
        import optax
        from .analysis.adjoint import diff_transient
        tran = self.config.tran
        if not tran.enabled:
            raise ValueError("calibration needs a .TRAN card")
        nid = self.circuit.node_name_to_id.get(probe)
        if nid is None:
            raise KeyError(f"unknown node {probe!r}")
        eqi = self.circuit.nodes[nid].eq_index
        p0 = dict(params if params is not None else self.params)
        for k in param_names:
            if k not in p0:
                raise KeyError(f"unknown parameter leaf {k!r}")
        target = jnp.asarray(target, self.engine.dtype)
        theta0 = {k: jnp.log(p0[k]) for k in param_names}
        rest = {k: v for k, v in p0.items() if k not in param_names}

        def loss_fn(theta):
            p = {**rest, **{k: jnp.exp(v) for k, v in theta.items()}}
            _, xs = diff_transient(self.engine, p, tran.tstep, tran.tstop)
            return jnp.mean((xs[:, eqi] - target) ** 2)

        opt = optax.adam(lr)
        state = opt.init(theta0)
        vg = jax.jit(jax.value_and_grad(loss_fn))
        theta = theta0
        history = []
        for i in range(steps):
            val, g = vg(theta)
            history.append(float(val))
            updates, state = opt.update(g, state)
            theta = optax.apply_updates(theta, updates)
            if verbose and i % 20 == 0:
                print(f"  calibrate step {i}: loss {float(val):.3e}")
        fitted = {**rest, **{k: jnp.exp(v) for k, v in theta.items()}}
        return fitted, history

    def jitter(self, probe: str, threshold: float, n: int = 64,
               seed: int = 0, rising: bool = True, t_min: float = 0.0,
               hysteresis: float = 0.0,
               params: Optional[Any] = None):
        """Timing jitter of a probe's threshold crossings over n
        independent TRNOISE realizations (analysis/jitter.py): one
        batched noisy transient, per-edge absolute jitter (std of each
        crossing time across lanes) and period jitter.  `hysteresis`
        sets a Schmitt release band for noisy threshold regions (lanes
        that still disagree on the edge count warn loudly).  Needs
        .TRAN and at least one TRNOISE source."""
        from .analysis.jitter import jitter_analysis
        tran = self.config.tran
        if not tran.enabled:
            raise ValueError("jitter analysis needs a .TRAN card")
        nid = self.circuit.node_name_to_id.get(probe)
        if nid is None:
            raise KeyError(f"unknown node {probe!r}")
        eqi = self.circuit.nodes[nid].eq_index
        return jitter_analysis(
            self.engine, params if params is not None else self.params,
            tran.tstep, tran.tstop, eqi, threshold, jax.random.key(seed),
            n_lanes=n, rising=rising, t_min=t_min,
            hysteresis=hysteresis)

    def center_design(self, rel_sigma, specs, design_names,
                      target_beta: float = 4.0, steps: int = 15,
                      lr: float = 0.1, params: Optional[Any] = None,
                      verbose: bool = False):
        """Yield-driven design centering: move the named design leaves
        until every spec's FORM reliability index reaches target_beta.

        specs: list of dicts {probe, at, low?, high?} (the worst_case
        shorthand), {measure: name}, or {g_fn} entries; any entry may
        add analysis="dc"/"ac" (tran default) — DC specs drop `at`, AC
        specs read `at` as the FREQUENCY and bound |V(probe)| (or name
        a .MEASURE AC card), so mixed-domain centering (e.g. a DC bias
        window plus a transient settle spec) runs in one loop.  Each
        iteration runs a FORM search per spec (analysis/form.mpp_search
        with design_grads) and gradient-ascends the WORST spec's beta
        in log-parameter space (a fixed-relative-step move along
        p·dβ/dp, positivity-preserving).  Returns (centered params,
        history) with history rows {betas, worst, step}."""
        import numpy as _np
        from .analysis.form import (mpp_search, limit_state_find_at,
                                    limit_state_measure,
                                    limit_state_measure_ac,
                                    limit_state_ac_mag)
        tran = self.config.tran
        entries = []                  # (g_fn, mpp kwargs) per spec

        def node_eq(name):
            nid = self.circuit.node_name_to_id.get(name)
            if nid is None:
                raise KeyError(f"unknown node {name!r}")
            return self.circuit.nodes[nid].eq_index

        for sp in specs:
            ana = sp.get("analysis", "tran")
            kwargs = {"analysis": ana}
            if ana == "ac":
                if "freqs" in sp:
                    kwargs["freqs"] = sp["freqs"]
                else:
                    kwargs["freqs"] = ([sp["at"]] if "at" in sp
                                       else self._ac_freqs())
            if "g_fn" in sp:
                entries.append((sp["g_fn"], kwargs))
                continue
            if "measure" in sp:
                ms = [m for m in self.config.measures
                      if m.name == sp["measure"] and m.analysis == ana]
                if not ms:
                    raise KeyError(f"no .MEASURE {ana.upper()} card "
                                   f"named {sp['measure']!r}")
                mk = (limit_state_measure_ac if ana == "ac"
                      else limit_state_measure)
                entries.append((mk(ms[0], self.topo, low=sp.get("low"),
                                   high=sp.get("high")), kwargs))
                continue
            eqi = node_eq(sp["probe"])
            lo, hi = sp.get("low"), sp.get("high")
            if ana == "dc":
                from .analysis.form import limit_state_dc
                entries.append((limit_state_dc(eqi, low=lo, high=hi),
                                kwargs))
            elif ana == "ac":
                entries.append((limit_state_ac_mag(eqi, low=lo, high=hi),
                                kwargs))
            else:
                entries.append((limit_state_find_at(eqi, sp["at"],
                                                    low=lo, high=hi),
                                kwargs))
        if any(kw["analysis"] == "tran" for _, kw in entries) \
                and not tran.enabled:
            raise ValueError("transient specs need a .TRAN card")
        ts0 = tran.tstep if tran.enabled else 0.0
        ts1 = tran.tstop if tran.enabled else 0.0
        p = dict(params if params is not None else self.params)
        history = []
        for it in range(steps):
            results = [mpp_search(self.engine, p, rel_sigma,
                                  ts0, ts1, g,
                                  design_grads=design_names, **kw)
                       for g, kw in entries]
            betas = [r["beta"] for r in results]
            worst = int(_np.argmin(betas))
            history.append({"betas": betas, "worst": worst, "step": it})
            if verbose:
                print(f"  center step {it}: betas "
                      f"{['%.2f' % b for b in betas]}")
            if betas[worst] >= target_beta:
                break
            # log-space ascent on the worst spec's beta: fixed relative
            # step along the sigma-free sensitivity direction p·dβ/dp
            db = results[worst]["dbeta"]
            d = {k: _np.asarray(p[k]) * _np.asarray(db[k])
                 for k in design_names}
            norm = math.sqrt(sum(float((v ** 2).sum())
                                 for v in d.values()))
            if norm == 0.0:
                break
            for k in design_names:
                p[k] = p[k] * jnp.exp(lr * jnp.asarray(d[k]) / norm)
        return p, history

    def mismatch_budget(self, rel_sigma, m_fn=None, probe: str = None,
                        at: float = None, params: Optional[Any] = None,
                        analysis: str = "tran", measure: str = None):
        """Linearized mismatch variance budget
        (analysis/form.mismatch_budget): one adjoint pass ranks every
        mismatch dimension's share of the metric variance.  Pass
        `m_fn(times, xs) -> scalar`, `measure="name"` (one of the
        deck's `.MEASURE TRAN` cards via the differentiable measure
        layer), or probe/at for the value of V(probe) at time `at`
        (needs a .TRAN card).  analysis="ac": m_fn(freqs, xr, xi) — or
        probe/at where `at` is the FREQUENCY and the metric is
        |V(probe)|."""
        from .analysis.form import mismatch_budget
        import jax.numpy as _jnp
        p = params if params is not None else self.params
        if measure is not None and m_fn is None:
            if analysis == "ac":
                from .analysis.measure_diff import diff_measure_ac
                ms = [m for m in self.config.measures
                      if m.name == measure and m.analysis == "ac"]
                if not ms:
                    raise KeyError(f"no .MEASURE AC card named "
                                   f"{measure!r}")
                m_fn = diff_measure_ac(ms[0], self.topo)
            else:
                m_fn = self._diff_measure_fn(measure)
        if analysis == "ac":
            if m_fn is None:
                if probe is None or at is None:
                    raise ValueError("pass m_fn or probe/at")
                nid = self.circuit.node_name_to_id.get(probe)
                if nid is None:
                    raise KeyError(f"unknown node {probe!r}")
                eqi = self.circuit.nodes[nid].eq_index

                def m_fn(freqs, xr, xi):
                    return _jnp.sqrt(xr[0, eqi] ** 2 + xi[0, eqi] ** 2)

                return mismatch_budget(self.engine, p, rel_sigma,
                                       0.0, 0.0, m_fn, analysis="ac",
                                       freqs=[at])
            return mismatch_budget(self.engine, p, rel_sigma, 0.0, 0.0,
                                   m_fn, analysis="ac",
                                   freqs=self._ac_freqs())
        if analysis == "dc":
            if m_fn is None:
                if probe is None:
                    raise ValueError("pass m_fn or probe")
                nid = self.circuit.node_name_to_id.get(probe)
                if nid is None:
                    raise KeyError(f"unknown node {probe!r}")
                eqi = self.circuit.nodes[nid].eq_index
                m_fn = lambda x_op, _e=eqi: x_op[_e]
            return mismatch_budget(self.engine, p, rel_sigma, 0.0, 0.0,
                                   m_fn, analysis="dc")
        tran = self.config.tran
        if not tran.enabled:
            raise ValueError("mismatch budget needs a .TRAN card")
        if m_fn is None:
            if probe is None or at is None:
                raise ValueError("pass m_fn or probe/at")
            nid = self.circuit.node_name_to_id.get(probe)
            if nid is None:
                raise KeyError(f"unknown node {probe!r}")
            eqi = self.circuit.nodes[nid].eq_index

            def m_fn(times, xs):
                return _jnp.interp(_jnp.asarray(at, times.dtype), times,
                                   xs[:, eqi])
        return mismatch_budget(self.engine, p,
                               rel_sigma, tran.tstep, tran.tstop, m_fn)

    def _diff_measure_fn(self, name: str):
        """Differentiable fn(times, xs) of the named .MEASURE TRAN card."""
        from .analysis.measure_diff import diff_measure
        ms = [m for m in self.config.measures
              if m.name == name and m.analysis == "tran"]
        if not ms:
            raise KeyError(f"no .MEASURE TRAN card named {name!r}")
        return diff_measure(ms[0], self.topo)

    def fit_measures(self, targets, param_names, steps: int = 150,
                     lr: float = 0.05, params: Optional[Any] = None,
                     verbose: bool = False):
        """Design fitting on the deck's own `.MEASURE TRAN` cards: tune
        the named parameter leaves until each measure hits its target —
        `targets` maps measure names to desired values; the loss is the
        sum of squared RELATIVE errors, optimized in log-parameter space
        with optax Adam through the adjoint + differentiable measure
        layer.  Returns (fitted params, loss history)."""
        import optax
        from .analysis.adjoint import diff_transient
        tran = self.config.tran
        if not tran.enabled:
            raise ValueError("fit_measures needs a .TRAN card")
        fns = {k: self._diff_measure_fn(k) for k in targets}
        p0 = dict(params if params is not None else self.params)
        for k in param_names:
            if k not in p0:
                raise KeyError(f"unknown parameter leaf {k!r}")
        theta0 = {k: jnp.log(p0[k]) for k in param_names}
        rest = {k: v for k, v in p0.items() if k not in param_names}
        tv = {k: jnp.asarray(v, self.engine.dtype)
              for k, v in targets.items()}

        def loss_fn(theta):
            p = {**rest, **{k: jnp.exp(v) for k, v in theta.items()}}
            t, xs = diff_transient(self.engine, p, tran.tstep, tran.tstop)
            err = 0.0
            for k, f in fns.items():
                scale = jnp.maximum(jnp.abs(tv[k]), 1e-30)
                err = err + ((f(t, xs) - tv[k]) / scale) ** 2
            return err

        opt = optax.adam(lr)
        state = opt.init(theta0)
        vg = jax.jit(jax.value_and_grad(loss_fn))
        theta = theta0
        history = []
        for i in range(steps):
            val, g = vg(theta)
            history.append(float(val))
            updates, state = opt.update(g, state)
            theta = optax.apply_updates(theta, updates)
            if verbose and i % 20 == 0:
                print(f"  fit step {i}: loss {float(val):.3e}")
        fitted = {**rest, **{k: jnp.exp(v) for k, v in theta.items()}}
        return fitted, history

    def _ac_freqs(self):
        from .analysis.ac import sweep_frequencies
        ac = self.config.ac
        if not ac.enabled:
            raise ValueError("deck has no .AC card")
        return sweep_frequencies(ac.sweep_type, ac.n_points,
                                 ac.fstart, ac.fstop)

    def measure(self, result, analysis: str = "tran"):
        """.MEASURE evaluation (analysis/measure.py).  `result` matches
        the analysis: a TransientResult ("tran", axis = time), an ACResult
        ("ac", axis = frequency; complex data reduces per VDB/VP/...
        probe modifiers — a `.MEASURE AC bw WHEN VDB(out)=-3` is a
        bandwidth), or a DCSweepResult ("dc", axis = swept value).
        Returns [(name, value)] with NaN for failed measurements."""
        from .analysis.measure import run_measures
        if result.xs is None:
            raise ValueError(".MEASURE needs saved waveforms "
                             "(save_xs=True)")
        if analysis == "ac":
            axis = result.freqs
        elif analysis == "dc":
            axis = result.values
        else:
            axis = result.times
        return run_measures(self.config.measures, self.topo,
                            axis, result.xs, analysis=analysis,
                            bindings=self.config.param_values)

    def tf(self, params: Optional[Any] = None, x_op: Optional[Any] = None):
        """.TF DC transfer function (analysis/tf.py): small-signal DC
        gain d out/d in, input resistance seen by the input source, and
        output resistance at the output probe, all from one linearization
        at the (polished) operating point."""
        from .analysis.tf import dc_transfer_function
        from .analysis.sweep import find_source
        from .netlist.circuit import KIND_V
        cfg = self.config.tf
        if not cfg.enabled:
            raise ValueError(".TF card missing")
        kind, idx = find_source(self.circuit, cfg.input_source)
        if kind == KIND_V:
            input_ref = ("v", int(self.topo.vs_k[idx]))
        else:
            input_ref = ("i", int(self.topo.is_ep[idx]),
                         int(self.topo.is_em[idx]))
        if cfg.out_kind == "v":
            nid = self.circuit.node_name_to_id.get(cfg.out_node)
            if nid is None:
                raise KeyError(f"unknown node {cfg.out_node!r}")
            out_a = self.circuit.nodes[nid].eq_index
            if out_a < 0:
                raise ValueError(f".TF output node {cfg.out_node!r} "
                                 "is ground")
            out_b = -1
            if cfg.ref_node:
                rid = self.circuit.node_name_to_id.get(cfg.ref_node)
                if rid is None:
                    raise KeyError(f"unknown node {cfg.ref_node!r}")
                out_b = self.circuit.nodes[rid].eq_index
        else:
            out_a = out_b = -1
            for e in self.circuit.elements:
                if (e.name.lower() == cfg.out_element.lower()
                        and getattr(e, "branch_eq", -1) >= 0):
                    out_a = e.branch_eq
                    break
            if out_a < 0:
                raise ValueError(f".TF current output {cfg.out_element!r}: "
                                 "no such branch-current unknown (only "
                                 "V sources and inductors carry one)")
        p = params if params is not None else self.params
        return dc_transfer_function(self.engine, p, cfg.out_kind,
                                    out_a, out_b, input_ref, x=x_op)

    def noise(self, params: Optional[Any] = None, freqs=None,
              out_node: Optional[str] = None, ref_node: Optional[str] = None,
              input_source: Optional[str] = None,
              x_op: Optional[Any] = None):
        """Small-signal noise analysis (.NOISE card, analysis/noise.py).
        Output PSD at V(out_node[, ref_node]); with input_source also the
        gain-referred input noise.  Sweep defaults to the .NOISE card's, or
        the .AC card's if the .NOISE card omits one."""
        from .analysis.ac import sweep_frequencies
        from .analysis.noise import noise_analysis
        from .analysis.sweep import find_source
        from .netlist.circuit import KIND_V
        cfg = self.config.noise
        if out_node is None:
            if not cfg.enabled:
                raise ValueError(".NOISE card missing")
            out_node = cfg.out_node
            ref_node = ref_node or (cfg.ref_node or None)
            input_source = input_source or (cfg.input_source or None)
        if freqs is None:
            if cfg.enabled and cfg.sweep_type:
                freqs = sweep_frequencies(cfg.sweep_type, cfg.n_points,
                                          cfg.fstart, cfg.fstop)
            elif self.config.ac.enabled:
                ac = self.config.ac
                freqs = sweep_frequencies(ac.sweep_type, ac.n_points,
                                          ac.fstart, ac.fstop)
            else:
                raise ValueError("no frequency sweep: give freqs, a .NOISE "
                                 "sweep, or a .AC card")

        def node_eq(name):
            nid = self.circuit.node_name_to_id.get(name)
            if nid is None:
                raise KeyError(f"unknown node {name!r}")
            return self.circuit.nodes[nid].eq_index

        out_eq = node_eq(out_node)
        if out_eq < 0:
            raise ValueError(f".NOISE output node {out_node!r} is ground")
        ref_eq = node_eq(ref_node) if ref_node else -1
        input_ref = None
        if input_source:
            kind, idx = find_source(self.circuit, input_source)
            if kind == KIND_V:
                input_ref = ("v", int(self.topo.vs_k[idx]))
            else:
                input_ref = ("i", int(self.topo.is_ep[idx]),
                             int(self.topo.is_em[idx]))
        p = params if params is not None else self.params
        return noise_analysis(self.engine, p, freqs, out_eq, ref_eq,
                              input_ref, x_op=x_op)

    def noise_figure(self, source_resistor: str,
                     params: Optional[Any] = None, freqs=None,
                     out_node: Optional[str] = None,
                     ref_node: Optional[str] = None,
                     x_op: Optional[Any] = None):
        """Noise figure referred to the named source resistor:
        F(f) = total output noise PSD / the PSD contributed by
        `source_resistor` alone (its 4kT/R generator through the same
        adjoint transfer), NF = 10·log10 F — the classic definition
        with Rs as the reference source impedance.  Output node defaults
        to the .NOISE card's.  Returns (freqs, nf_db)."""
        import numpy as _np
        from .analysis.ac import sweep_frequencies
        from .analysis.noise import noise_analysis
        from .netlist.circuit import KIND_R
        cfg = self.config.noise
        if out_node is None:
            if not cfg.enabled:
                raise ValueError("give out_node or a .NOISE card")
            out_node = cfg.out_node
            ref_node = ref_node or (cfg.ref_node or None)
        if freqs is None:
            if cfg.enabled and cfg.sweep_type:
                freqs = sweep_frequencies(cfg.sweep_type, cfg.n_points,
                                          cfg.fstart, cfg.fstop)
            elif self.config.ac.enabled:
                ac = self.config.ac
                freqs = sweep_frequencies(ac.sweep_type, ac.n_points,
                                          ac.fstart, ac.fstop)
            else:
                raise ValueError("no frequency sweep available")
        # the source resistor's generator column: resistors lead the
        # concatenation in _device_noise_currents, in element order
        ridx = None
        j = 0
        for e in self.circuit.elements:
            if e.kind == KIND_R:
                if e.name.upper() == source_resistor.upper():
                    ridx = j
                    break
                j += 1
        if ridx is None:
            raise KeyError(f"no resistor named {source_resistor!r}")

        def node_eq(name):
            nid = self.circuit.node_name_to_id.get(name)
            if nid is None:
                raise KeyError(f"unknown node {name!r}")
            return self.circuit.nodes[nid].eq_index

        out_eq = node_eq(out_node)
        ref_eq = node_eq(ref_node) if ref_node else -1
        p = params if params is not None else self.params
        res = noise_analysis(self.engine, p, freqs, out_eq, ref_eq,
                             None, x_op=x_op, per_device=True)
        s = _np.asarray(res.s_dev)
        rs_psd = s[:, ridx]
        if not _np.all(rs_psd > 0):
            raise ValueError(f"{source_resistor!r} contributes no noise "
                             "at the output (zero transfer or zero R)")
        nf_db = 10.0 * _np.log10(_np.asarray(res.onoise) / rs_psd)
        return _np.asarray(freqs), nf_db

    def dc_sweep(self, sweep_index: int = 0, params: Optional[Any] = None,
                 values=None, source: Optional[str] = None):
        """DC sweep (analysis/sweep.py).  Defaults to the netlist's .DC
        card(s); `source`+`values` override."""
        from .analysis.sweep import dc_sweep, sweep_values
        source2, values2 = "", None
        if source is None:
            if not self.config.dc_sweeps:
                raise ValueError(".DC card missing")
            cfg = self.config.dc_sweeps[sweep_index]
            source = cfg.source_name
            if values is None:
                values = sweep_values(cfg.start, cfg.stop, cfg.step)
                if cfg.source2:
                    source2 = cfg.source2
                    values2 = sweep_values(cfg.start2, cfg.stop2, cfg.step2)
        elif values is None:
            raise ValueError("explicit `source` requires `values`")
        p = params if params is not None else self.params
        return dc_sweep(self.engine, p, self.circuit, source, values,
                        source2=source2, values2=values2)

    # ---- output ----
    def write_raw(self, path: str, result, mode: str = "w",
                  title: Optional[str] = None) -> None:
        """ngspice/SPICE3 ASCII rawfile output (io/rawfile.py, extension).
        Accepts a TransientResult, ACResult, or DCSweepResult; pass
        mode="a" to append further plots to the same file (multi-plot
        rawfiles are standard)."""
        from .io import rawfile
        t = title if title is not None else "circuitsimulator_tpu"
        if hasattr(result, "times"):
            if bool(result.failed):
                raise RuntimeError("Transient: LU produced NaN/Inf.")
            rawfile.write_raw_transient(
                path, self.topo, result.times, result.xs, title=t,
                tstart=self.config.tran.tstart or 0.0, mode=mode)
        elif hasattr(result, "freqs"):
            rawfile.write_raw_ac(path, self.topo, result.freqs, result.xs,
                                 title=t, mode=mode)
        elif hasattr(result, "values"):
            rawfile.write_raw_dc_sweep(path, self.topo, result.values,
                                       result.xs, result.source, title=t,
                                       mode=mode)
        else:
            raise TypeError(f"cannot write {type(result).__name__} "
                            "as a rawfile")

    def write_transient_csv(self, path: str, result: TransientResult,
                            tstart: Optional[float] = None,
                            probes_only: bool = False) -> None:
        if tstart is None:
            tstart = self.config.tran.tstart or 0.0
        if bool(result.failed):
            raise RuntimeError("Transient: LU produced NaN/Inf.")
        selection = None
        if probes_only:
            from .io.csvout import probe_selection
            selection = probe_selection(self.topo, self.config.print_commands)
        write_transient_csv(path, self.topo, result.times, result.xs, tstart,
                            selection=selection)

    def summary(self) -> str:
        return circuit_summary(self.topo)

    def dc_report(self, x) -> str:
        return dc_table(self.topo, x)
