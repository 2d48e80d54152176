"""Adaptive-timestep transient analysis (LTE-controlled, extension).

The reference integrates on a fixed user grid only (src/tanalisis.cpp:238 —
``nSteps = floor(tstop/dt)`` with constant dt).  This module adds the
SPICE-style adaptive refinement the reference lacks, designed for XLA:

- **Dyadic dt ladder.**  The internal step is always ``tstep / 2**lvl`` for
  an integer level ``lvl in [0, max_levels]``.  Because every candidate dt
  is known at trace time, the dt-dependent static parts of the system
  (companion conductances C/dt, L/dt -> G_static; its factorization for the
  Woodbury backend) are precomputed per level and selected with one
  ``lax.dynamic_index_in_dim`` per substep — no re-assembly, no dynamic
  shapes, no recompilation when the controller moves.

- **Integer tick clock.**  Each output interval is 2**max_levels ticks; a
  level-``lvl`` step advances ``2**(max_levels-lvl)`` ticks.  Steps stay
  aligned to the dyadic grid (a step may only double when the position is
  even in the doubled stride), so the integrator lands *exactly* on every
  output point and the result has the same static shape as the fixed-step
  path: one row per .TRAN grid point.

- **LTE control.**  Local truncation error is estimated from the explicit
  linear predictor ``x_pred = x + (x - x_prev) * dt/dt_prev``; for Backward
  Euler ``LTE ~= (x_corr - x_pred) * dt/(dt+dt_prev)`` (the standard
  divided-difference estimate of dt^2/2 * x''), for trapezoidal the same
  difference scaled by ``dt/(3(dt+dt_prev))``.  A step is rejected and
  halved when the weighted LTE norm exceeds 1, and doubled when it falls
  below ``grow_threshold`` and the dyadic alignment allows.  Newton
  non-convergence / non-finite solves also reject and refine — a genuine
  robustness win over the reference, which plows ahead with warnings
  (tanalisis.cpp:364-376).

Everything is masked so ``vmap`` over circuits works: under vmap a
``while_loop`` body runs for all lanes until the last one finishes, so every
carry update is gated on the lane's own ``pos < END`` activity flag.
"""

from __future__ import annotations

import copy
import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.assemble import Engine
from ..ops.lu import lu_solve
from .dc import dc_operating_point
from .transient import n_steps_for


@dataclasses.dataclass
class AdaptiveTransientResult:
    times: Any        # (n_out+1,) — the .TRAN output grid incl. t=0
    xs: Any           # (n_out+1, N) or None
    x_final: Any      # (N,)
    n_substeps: Any   # total accepted internal steps
    n_rejected: Any   # total rejected (refined) attempts
    newton_iters: Any # total Newton iterations
    failed: Any       # per-lane: non-finite solve at max refinement
    lte_exceeded: Any # per-lane: accepted a step with LTE > tol at max lvl
    n_steps: int


jax.tree_util.register_dataclass(
    AdaptiveTransientResult,
    data_fields=["times", "xs", "x_final", "n_substeps", "n_rejected",
                 "newton_iters", "failed", "lte_exceeded"],
    meta_fields=["n_steps"])


def _wb_at_level(wb, lvl):
    """View of a level-stacked WoodburySolver at one dyadic level."""
    w = copy.copy(wb)
    w.G0inv = lax.dynamic_index_in_dim(wb.G0inv, lvl, 0, keepdims=False)
    w.Y = lax.dynamic_index_in_dim(wb.Y, lvl, 0, keepdims=False)
    w.Y_cols = lax.dynamic_index_in_dim(wb.Y_cols, lvl, 0, keepdims=False)
    return w


def run_transient_adaptive(engine: Engine, params, tstep, tstop,
                           x0: Optional[Any] = None, save_xs: bool = True):
    """LTE-controlled transient on the dyadic refinement ladder.

    Output rows are exactly the fixed-step .TRAN grid (t=0 from DC, then
    k*tstep); internally each interval is integrated with dt in
    {tstep/2**l}.  Unbatched only — batch by vmapping this function.
    """
    opts = engine.opts
    N = engine.N
    dtype = engine.dtype
    method = opts.tran_method
    L = int(opts.tran_max_refine_levels)
    if L < 0 or L > 20:
        raise ValueError("tran_max_refine_levels must be in [0, 20]")
    END = 1 << L                      # ticks per output interval
    tstep_f = float(tstep)
    dt_min = jnp.asarray(tstep_f / END, dtype)
    alpha = opts.tran_adaptive_alpha
    rtol = opts.tran_lte_rtol
    atol = opts.tran_lte_atol
    grow_thr = 0.25 if method == "be" else 0.1
    n_out = n_steps_for(tstep_f, float(tstop))

    if engine.n_tl:
        raise NotImplementedError(
            "adaptive timestepping with transmission lines is not "
            "supported: the delay ring length is dt-dependent and the "
            "dyadic refinement levels use different dts, so a single "
            "ring cannot serve all levels (a fixed-rate ring at dt_min "
            "would need a dynamic number of pushes per accepted step). "
            "Use the fixed-step transient — T-line decks run on every "
            "fixed-step backend including the fused Pallas kernel "
            "(ops/pallas_step.py carries the ring in VMEM).")
    solver = opts.tran_solver
    use_woodbury = solver == "woodbury"
    use_tridiag = solver == "tridiag"
    use_blockband = solver == "blockband"
    # B-sources ride the rank-k plan; time-dependent expressions get the
    # substep's own t_new threaded through every Newton tier below

    # --- per-level static precompute (all dts known at trace time) ---
    dts = [tstep_f / (1 << l) for l in range(L + 1)]
    if use_tridiag:
        # O(n) bordered-tridiagonal path: per-level banded statics, selected
        # by level with one dynamic index per substep (mirrors transient.py)
        from ..ops.banded import BandedPlan
        from ..ops.tridiag import bordered_solve
        n = engine.topo.n_node_eq
        m = N - n
        plans = [engine.tran_static_entries(params, d, opts.tran_gmin,
                                            method) for d in dts]
        static_plan = BandedPlan(n, m, plans[0][0], plans[0][1])
        nl_plan = BandedPlan(n, m, engine.nl_rows, engine.nl_cols)
        if not (static_plan.ok and nl_plan.ok):
            raise ValueError("circuit is not ladder-structured; "
                             "tridiag transient solver not applicable")
        banded_stack = jax.tree_util.tree_map(
            lambda *leaves: jnp.stack(leaves),
            *[static_plan.scatter(sv) for _, _, sv in plans])
        Gs = None
    elif use_blockband:
        # general large-circuit path, per-level statics (mirrors tridiag)
        from ..ops.blockband import get_layout, BlockScatter
        from ..ops.blockcr import bordered_block_solve
        bb_layout = get_layout(engine)
        plans = [engine.tran_static_entries(params, d, opts.tran_gmin,
                                            method) for d in dts]
        bb_static_plan = BlockScatter(bb_layout, plans[0][0], plans[0][1])
        bb_nl_plan = BlockScatter(bb_layout, engine.nl_rows, engine.nl_cols)
        bb_stack = jax.tree_util.tree_map(
            lambda *leaves: jnp.stack(leaves),
            *[bb_static_plan.scatter(sv) for _, _, sv in plans])
        Gs = None
    else:
        Gs = jnp.stack([engine.tran_static_G(params, d, opts.tran_gmin,
                                             method)
                        for d in dts])                 # (L+1, ..., N+1, N+1)
    if use_woodbury:
        from ..ops.woodbury import WoodburySolver
        # one factorization per level, stacked on a leading level axis
        # (lu_inverse is not broadcast-safe over a batched G0)
        wbs = [WoodburySolver(engine, params, Gs[l, ..., :N, :N])
               for l in range(L + 1)]
        wb = wbs[0]
        wb.G0inv = jnp.stack([w.G0inv for w in wbs])
        wb.Y = jnp.stack([w.Y for w in wbs])
        wb.Y_cols = jnp.stack([w.Y_cols for w in wbs])

    if x0 is None:
        x0 = dc_operating_point(engine, params)
    state0 = engine.init_state(x0)

    def newton(x_init, I_s, lvl, dt, t_new):
        """Damped Newton at one substep; returns (x_new, converged, finite,
        iters).  x_init may be an extrapolated predictor — convergence is
        measured on the iterate step, so the fixed point is unchanged."""
        if use_woodbury:
            wv = _wb_at_level(wb, lvl)
            z0 = wv.z0(I_s[..., :N])
        elif use_tridiag:
            banded_static = jax.tree_util.tree_map(
                lambda a: lax.dynamic_index_in_dim(a, lvl, 0,
                                                   keepdims=False),
                banded_stack)
        elif use_blockband:
            bb_static = jax.tree_util.tree_map(
                lambda a: lax.dynamic_index_in_dim(a, lvl, 0,
                                                   keepdims=False),
                bb_stack)
        else:
            G_static = lax.dynamic_index_in_dim(Gs, lvl, 0, keepdims=False)

        def cond(c):
            return (~c["done"]) & (c["iter"] < opts.tran_max_newton_iters)

        def body(c):
            if use_woodbury:
                x_raw = wv.solve(params, c["x"], z0, t_new)
            elif use_tridiag:
                gvals, rvals = engine._nl_vals(params, c["x"], t_new)
                mats = nl_plan.scatter(gvals, base=banded_static)
                I = I_s.at[..., engine.nl_rhs_rows].add(rvals)
                xn, y = bordered_solve(
                    mats["sub"], mats["diag"], mats["sup"],
                    mats["U"], mats["W"], mats["D"],
                    I[..., :n], I[..., n:N],
                    algo=opts.tridiag_algo)
                x_raw = jnp.concatenate([xn, y], axis=-1)
            elif use_blockband:
                gvals, rvals = engine._nl_vals(params, c["x"], t_new)
                mats = bb_nl_plan.scatter(gvals, base=bb_static)
                I = I_s.at[..., engine.nl_rhs_rows].add(rvals)
                f, g = bb_layout.gather_rhs(I)
                xi, y = bordered_block_solve(
                    mats["L"], mats["D"], mats["U"],
                    mats["Ub"], mats["Wb"], mats["Db"], f, g,
                    opts.lu_pivot_floor)
                x_raw = bb_layout.gather_solution(xi, y)
            else:
                G, I = engine.assemble_tran_iter(G_static, I_s, params,
                                                 c["x"], t_new)
                x_raw = lu_solve(G[..., :N, :N], I[..., :N],
                                 opts.lu_pivot_floor)
            finite = jnp.all(jnp.isfinite(x_raw), axis=-1)
            x_new = c["x"] + alpha * (x_raw - c["x"])
            err = jnp.linalg.norm(x_new - c["x"], axis=-1)
            conv = finite & (err < opts.tran_tol)
            out = dict(c)
            out["x"] = jnp.where(finite, x_new, c["x"])
            out["done"] = c["done"] | conv | ~finite
            out["conv"] = c["conv"] | conv
            out["finite"] = c["finite"] & finite
            out["iter"] = c["iter"] + 1
            return out

        init = dict(x=x_init, done=jnp.asarray(False),
                    conv=jnp.asarray(False), finite=jnp.asarray(True),
                    iter=jnp.asarray(0, jnp.int32))
        out = lax.while_loop(cond, body, init)
        return out["x"], out["conv"], out["finite"], out["iter"]

    def interval(carry, t0):
        """Integrate one output interval [t0, t0 + tstep]."""

        def cond(c):
            return c["pos"] < END

        def body(c):
            active = c["pos"] < END
            lvl = c["lvl"]
            ticks = jnp.right_shift(jnp.asarray(END, jnp.int32), lvl)
            dt = tstep_f * jnp.exp2(-lvl.astype(dtype))
            t_new = t0 + (c["pos"] + ticks).astype(dtype) * dt_min

            I_s = engine.make_tran_static_I(dt, method)(params, c["state"],
                                                        t_new)
            # linear predictor: the Newton initial guess AND the LTE probe
            slope = jnp.where(c["have_prev"],
                              (c["x"] - c["x_prev"])
                              / jnp.maximum(c["dt_prev"], dt_min), 0.0)
            x_pred = c["x"] + slope * dt
            x_new, conv, finite, iters = newton(x_pred, I_s, lvl, dt, t_new)
            fac = dt / (dt + c["dt_prev"])
            if method == "trap":
                fac = fac / 3.0
            wt = rtol * jnp.maximum(jnp.abs(x_new), jnp.abs(c["x"])) + atol
            lte = jnp.max(jnp.abs(x_new - x_pred) / wt, axis=-1) * fac
            lte_ok = lte <= 1.0

            at_max = lvl >= L
            good = finite & conv & lte_ok
            accept = good | at_max
            # at max refinement a non-finite solve freezes the lane instead
            # of poisoning it (mirrors transient.py's failed-lane handling)
            freeze = at_max & ~finite
            x_acc = jnp.where(freeze, c["x"], x_new)

            new_pos = c["pos"] + ticks
            state_new = engine.make_update_state(dt, method)(params, x_acc,
                                                             c["state"])
            # refinement level for the next attempt
            lvl_ref = jnp.minimum(lvl + 1, L)                 # on reject
            stride2 = 2 * ticks
            can_grow = ((lvl > 0)
                        & (new_pos % stride2 == 0)
                        & (new_pos + stride2 <= END)
                        & (lte <= grow_thr))
            lvl_acc = jnp.where(can_grow & finite & conv, lvl - 1, lvl)

            upd = active & accept
            rej = active & ~accept
            out = dict(c)
            out["pos"] = jnp.where(upd, new_pos, c["pos"])
            out["lvl"] = jnp.where(upd, lvl_acc,
                                   jnp.where(rej, lvl_ref, c["lvl"]))
            out["x"] = jnp.where(upd, x_acc, c["x"])
            out["x_prev"] = jnp.where(upd, c["x"], c["x_prev"])
            out["dt_prev"] = jnp.where(upd, dt, c["dt_prev"])
            out["have_prev"] = c["have_prev"] | upd
            out["state"] = jax.tree_util.tree_map(
                lambda n, o: jnp.where(upd, n, o), state_new, c["state"])
            out["failed"] = c["failed"] | (upd & freeze)
            out["lte_exceeded"] = c["lte_exceeded"] | (upd & ~good & finite)
            out["n_sub"] = c["n_sub"] + jnp.where(upd, 1, 0)
            out["n_rej"] = c["n_rej"] + jnp.where(rej, 1, 0)
            out["n_newton"] = c["n_newton"] + jnp.where(active, iters, 0)
            return out

        c = dict(carry)
        c["pos"] = jnp.asarray(0, jnp.int32)
        c = lax.while_loop(cond, body, c)
        return c, c["x"]

    carry0 = dict(
        pos=jnp.asarray(0, jnp.int32),
        lvl=jnp.asarray(0, jnp.int32),
        x=x0, x_prev=x0,
        dt_prev=jnp.asarray(tstep_f, dtype),
        have_prev=jnp.asarray(False),
        state=state0,
        failed=jnp.asarray(False),
        lte_exceeded=jnp.asarray(False),
        n_sub=jnp.asarray(0, jnp.int32),
        n_rej=jnp.asarray(0, jnp.int32),
        n_newton=jnp.asarray(0, jnp.int32),
    )
    t0s = jnp.arange(n_out, dtype=dtype) * jnp.asarray(tstep_f, dtype)
    carry, xs = lax.scan(interval, carry0, t0s)

    times = jnp.concatenate(
        [jnp.zeros((1,), dtype),
         (jnp.arange(1, n_out + 1, dtype=dtype)) * tstep_f])
    xs_all = jnp.concatenate([x0[None], xs], axis=0) if save_xs else None
    return AdaptiveTransientResult(
        times=times, xs=xs_all, x_final=carry["x"],
        n_substeps=carry["n_sub"], n_rejected=carry["n_rej"],
        newton_iters=carry["n_newton"], failed=carry["failed"],
        lte_exceeded=carry["lte_exceeded"], n_steps=n_out)
