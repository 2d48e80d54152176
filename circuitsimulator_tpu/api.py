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
from typing import Any, Optional

import jax
import jax.numpy as jnp

from .analysis.dc import dc_operating_point
from .analysis.transient import run_transient, TransientResult, n_steps_for
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
        circuit.assign_equation_indices()
        self.lowered: LoweredCircuit = lower(circuit, dtype=opts.dtype)
        self.topo = self.lowered.topo
        self.params = self.lowered.params
        self.engine = Engine(self.lowered, opts)

    # ---- constructors ----
    @classmethod
    def from_file(cls, path: str, opts: Optional[SolverOptions] = None):
        ckt, sim = parse_netlist(path)
        return cls(ckt, sim, opts)

    @classmethod
    def from_text(cls, text: str, opts: Optional[SolverOptions] = None):
        ckt, sim = parse_netlist_text(text)
        return cls(ckt, sim, opts)

    # ---- analyses ----
    @functools.cached_property
    def _dc_jit(self):
        return jax.jit(lambda p: dc_operating_point(self.engine, p))

    def dc(self, params: Optional[Any] = None):
        """DC operating point -> (N,) solution vector."""
        return self._dc_jit(params if params is not None else self.params)

    def transient(self, params: Optional[Any] = None,
                  tstep: Optional[float] = None,
                  tstop: Optional[float] = None,
                  save_xs: bool = True) -> TransientResult:
        """Backward-Euler transient; defaults to the netlist's .TRAN card."""
        cfg = self.config.tran
        tstep = cfg.tstep if tstep is None else tstep
        tstop = cfg.tstop if tstop is None else tstop
        if tstep is None or tstep <= 0 or tstop is None or tstop <= 0:
            raise ValueError(".TRAN card missing or invalid "
                             "(tstep and tstop must be > 0)")
        p = params if params is not None else self.params
        fn = jax.jit(functools.partial(
            run_transient, self.engine,
            tstep=tstep, tstop=tstop, save_xs=save_xs))
        return fn(p)

    # ---- output ----
    def write_transient_csv(self, path: str, result: TransientResult,
                            tstart: Optional[float] = None) -> None:
        if tstart is None:
            tstart = self.config.tran.tstart or 0.0
        if bool(result.failed):
            raise RuntimeError("Transient: LU produced NaN/Inf.")
        write_transient_csv(path, self.topo, result.times, result.xs, tstart)

    def summary(self) -> str:
        return circuit_summary(self.topo)

    def dc_report(self, x) -> str:
        return dc_table(self.topo, x)
