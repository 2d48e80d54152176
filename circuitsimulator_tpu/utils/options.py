"""Solver options.

Every knob the reference hard-codes lives here with the reference value as the
default, so the default configuration reproduces reference numerics exactly:

- DC ramp/N-R constants: src/dcanalysis.cpp:104-106 (rampSteps=10,
  maxNewtonIters=50, tol=1e-9) and the ConvController constants
  (src/dcanalysis.cpp:264-265, 274).
- Transient N-R constants: src/tanalisis.cpp:241-244 (maxNewtonIters=50,
  tol=1e-6, gmin=1e-6, alpha=0.45).
- LU pivot floor: include/solver.hpp:31 (eps=1e-15).
- Gauss-Seidel: src/dcanalysis.cpp:90,206 (2000 iters, tol 1e-10) and
  include/solver.hpp:159 (diagonal regularization 1e-12).

``strict_reference_mode`` keeps the reference's quirky-but-load-bearing
behaviors (see SURVEY.md §2 "key device-physics semantics"), most notably that
the DC damped update is always applied with alpha=0.35 regardless of the
"adaptive" alpha the controller reports (src/dcanalysis.cpp:274 re-clamps the
constant 0.35 every call, ignoring alphaCurrent).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SolverOptions:
    # --- DC operating point ---
    ramp_steps: int = 10
    dc_max_newton_iters: int = 50
    dc_tol: float = 1e-9
    # ConvController constants (src/dcanalysis.cpp:264-265)
    alpha_min: float = 0.1
    alpha_max: float = 0.5
    alpha_const: float = 0.35          # the value clamped at dcanalysis.cpp:274
    gmin_high_base: float = 1e-6
    gmin_low_base: float = 3.35e-7
    gmin_abs_max: float = 1e-4
    fast_conv_ratio: float = 0.7
    slow_conv_ratio: float = 1.05
    gmin_nonfinite_factor: float = 10.0
    gmin_nonfinite_max: float = 1e-2

    # --- Transient ---
    # integration method: "be" (Backward Euler, the reference's method,
    # tanalisis.cpp) or "trap" (trapezoidal, 2nd order — extension)
    tran_method: str = "be"
    tran_max_newton_iters: int = 50
    tran_tol: float = 1e-6
    tran_gmin: float = 1e-6
    tran_alpha: float = 0.45
    # linear-solve backend for the transient Newton loop:
    # "lu" = per-iteration re-factor (reference algorithm);
    # "woodbury" = static factor + rank-k update solve (same solution,
    # ~20x fewer flops/iter; see ops/woodbury.py).  Both reproduce the
    # reference goldens with identical Newton trajectories; woodbury is
    # the default because it is strictly faster.  "tridiag" = bordered
    # cyclic-reduction solve for ladder circuits (O(n) per iteration,
    # required beyond a few hundred nodes).  "blockband" = RCM-reordered
    # bordered block-tridiagonal solve (ops/blockband.py) for large
    # NON-ladder topologies (grids, trees, meshes).  "blockwb" = the
    # pre-factored form of blockband: the constant BE companion base is
    # block-CR-factored ONCE per transient and nonlinear devices ride
    # Woodbury rank-1 rows over it — O(nb k^2) matmuls per Newton
    # iteration instead of blockband's O(nb k^3) re-elimination
    # (single-device; SPIKE meshes keep "blockband").
    tran_solver: str = "woodbury"
    # DC linear solver: "lu" (reference), "gs", "tridiag" (ladder), or
    # "blockband" (general large circuits)
    dc_solver: str = "lu"
    # --- Adaptive transient (extension; analysis/adaptive.py) ---
    # max dyadic refinement: internal dt ranges over tstep/2**[0..levels]
    tran_max_refine_levels: int = 8
    # weighted-LTE tolerance: |lte| <= rtol*|x| + atol per component
    tran_lte_rtol: float = 1e-3
    tran_lte_atol: float = 1e-6
    # Newton damping for the adaptive path (full steps by default; the
    # reference's 0.45 damping is a fixed-grid parity behavior)
    tran_adaptive_alpha: float = 1.0
    # start each timestep's Newton from the linear extrapolation of the two
    # previous solutions instead of the previous solution (classic SPICE
    # predictor; cuts iters/step to ~1 in smooth regions).  Off by default:
    # it changes the damped-Newton *trajectory*, so reference-parity runs
    # must keep it disabled.  The converged solution is unchanged (same
    # fixed point, same tolerance).
    tran_predictor: bool = False
    # fixed unrolled Newton iterations per step (0 = use the while_loop
    # with the convergence test).  With the predictor + full Newton, K=3
    # unrolled iterations converge far below tol in practice, and removing
    # the while_loop lets XLA fuse the entire timestep — the batch also no
    # longer pays for the slowest lane's trip count.  No convergence
    # guarantee: benchmarks validate accuracy against the f64 oracle.
    tran_unrolled_iters: int = 0
    # tridiag TRANSIENT algorithm: "pcr" (parallel cyclic reduction,
    # O(N log N) work, log2(N) sequential stages) or "cr" (classic CR,
    # O(N) work, 2*log2(N) stages).  PCR measured 2.9x faster on the v5e
    # 10k-node ladder (0.47 vs 1.39 ms/step): the stage count, not the
    # flop count, is what the hot loop pays for.  The transient system is
    # C/dt-diagonally-dominant, where PCR is stable; the DC path always
    # uses CR (a gmin-grounded ladder is near-singular and PCR loses
    # digits there).
    tridiag_algo: str = "pcr"
    # per-iteration Newton update clamp in volts (0 = off).  SPICE-style
    # limiting: full (quadratic) steps near the solution, bounded steps far
    # away — kills the region-switching oscillation that otherwise makes a
    # few Monte-Carlo lanes dominate a vmapped while_loop (the batch cost is
    # the max over lanes, not the mean).  Use with tran_alpha=1.0.
    tran_newton_clamp: float = 0.0
    # Mixed-precision transient (f64 engines, 'lu' backend): evaluate
    # residuals and carry state in f64 but run every inner Newton solve
    # in f32 (the dc_refine trick along the whole transient) — on TPU
    # the f32 factorization is ~20x the emulated-f64 one, and Newton
    # itself is the refinement loop, so the trajectory converges to the
    # f64 fixpoint at f32 solve cost (analysis/transient.py).
    tran_mixed_refine: bool = False
    # let the Simulator switch both to "tridiag" automatically for large
    # ladder-structured circuits
    auto_backend: bool = True

    # --- Linear solver ---
    lu_pivot_floor: float = 1e-15
    gs_max_iters: int = 2000
    gs_tol: float = 1e-10
    gs_diag_eps: float = 1e-12

    # --- Numerics / engine ---
    dtype: Any = jnp.float64
    strict_reference_mode: bool = True
    # MOSFET off-state drain-source leak conductance (src/element.cpp:246)
    mos_off_gds: float = 1e-12
    # symmetric (reverse-region / drain-source swap) MOS conduction
    # (extension; the reference treats Vds_eff < 0 as "off",
    # element.cpp:223).  Needed for pass-transistor topologies.
    mos_reverse_region: bool = False
    # MOS capacitance model (extension; .OPTIONS MOSCAP=):
    #   "fixed"  — the reference's bias-independent lumps Cgs=Cgd=Cj0/2,
    #              Csb=Cdb=Cj0 (tanalisis.cpp:321-353), bitwise default;
    #   "charge" — charge-conserving Ward-Dutton gate charges + SPICE
    #              depletion junction charges (models/moscap.py).
    # The charge model runs on the BE transient ("lu"/"woodbury"
    # backends), linearizes exactly for AC/PZ, and carries into the
    # harmonic domains as the spectral charge derivative D·q(x):
    # single-tone HB, envelope (host + batched), PAC/PNOISE and hot
    # S-parameters.  Multi-tone HB, autonomous HB, shooting PSS and the
    # fused Pallas kernel keep requiring "fixed".
    mos_cap_model: str = "fixed"

    def replace(self, **kw) -> "SolverOptions":
        return dataclasses.replace(self, **kw)


DEFAULT_OPTIONS = SolverOptions()
