"""DC operating point.

Reproduces the reference's solver structure (src/dcanalysis.cpp):

- Linear circuits (no MOS/diode): one stamp pass at sourceScale=1 and one LU
  solve, NO gmin (dcSolveDirectLU, dcanalysis.cpp:46-68).
- Nonlinear circuits: 10-step source ramp; per ramp step a damped Newton loop
  (max 50 iters) with the ConvController schedule (dcanalysis.cpp:95-163,
  264-307).  Quirks kept in strict mode:
    * the damped update is ALWAYS x + 0.35*(xRaw - x): dcanalysis.cpp:274
      re-clamps the constant 0.35, so the "adaptive" alpha never affects the
      update (it only appears in warning logs);
    * convergence tests the damped step size ||xNew - x|| < tol, not a
      residual (dcanalysis.cpp:275-276, 304);
    * gmin starts each ramp step at base(scale) = 1e-6*(1-s) + 3.35e-7*s,
      is doubled (cap 1e-4) on slow convergence, relaxed toward base
      otherwise, and multiplied by 10 (cap 1e-2) on a non-finite solve with
      x and prevErr left untouched (dcanalysis.cpp:135-138, 277-298);
    * non-convergence after 50 iters is NOT an error — the ramp proceeds
      (dcanalysis.cpp:153-158).

All loops are lax primitives; the function is jit- and vmap-safe.  Under
vmap, converged lanes are frozen by masking so extra iterations (run because
other lanes still work) cannot perturb their trajectory.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..ops.assemble import Engine
from ..ops.lu import lu_solve
from ..ops.gauss_seidel import gauss_seidel_solve
from ..utils.options import SolverOptions


def dc_linear(engine: Engine, params):
    """dcSolveDirectLU: single stamp + solve, sourceScale=1, no gmin."""
    N = engine.N
    one = jnp.asarray(1.0, engine.dtype)
    G, I = engine.dc_static(params, one)
    return lu_solve(G[..., :N, :N], I[..., :N], engine.opts.lu_pivot_floor)


def dc_linear_gs(engine: Engine, params):
    """dcSolveDirectGS (dcanalysis.cpp:71-92): one stamp pass, Gauss-Seidel
    with 2000 iterations / tol 1e-10 from a zero initial guess."""
    N = engine.N
    opts = engine.opts
    one = jnp.asarray(1.0, engine.dtype)
    G, I = engine.dc_static(params, one)
    return gauss_seidel_solve(G[..., :N, :N], I[..., :N], None,
                              opts.gs_max_iters, opts.gs_tol, opts.gs_diag_eps)


def dc_newton(engine: Engine, params, with_stats: bool = False,
              linear_solver: str = "lu", batch: int = 0, nodeset=None,
              x_init=None, final_only: bool = False):
    """dcSolveNewtonLU / dcSolveNewtonGS: source ramp + damped Newton with
    the ConvController schedule.  The GS variant warm-starts Gauss-Seidel
    from the current x, allows 60 Newton iterations per ramp step and 120 on
    the final step (dcanalysis.cpp:175-191).

    batch > 0: params carry a leading lane axis of that size and the whole
    ramp/Newton loop runs natively batched (per-lane done/gmin/prevErr
    masks) with the per-iteration solves dispatched to the Pallas batched
    LU kernel — far faster than vmapping the scalar path, because the
    factorization keeps each lane block resident in VMEM
    (ops/pallas_lu.py).

    x_init / final_only (extension, no reference counterpart): warm-start
    the Newton from x_init; with final_only=True the source ramp is
    skipped entirely and only the scale=1 step runs — the Monte-Carlo
    fast path (perturbed lanes start from the nominal operating point and
    converge in a handful of iterations instead of paying the 10-step
    ramp; see parallel/montecarlo.batched_dc_warm)."""
    opts = engine.opts
    N = engine.N
    dtype = engine.dtype
    ramp = opts.ramp_steps
    use_gs = linear_solver == "gs"
    max_iters_base = 60 if use_gs else opts.dc_max_newton_iters
    if batch and use_gs:
        raise ValueError("batched DC supports the LU solver only")
    if batch:
        import jax
        # the Pallas kernel is f32-only (Mosaic reductions); f64 lanes use
        # the portable batched LU
        if jax.default_backend() == "tpu" and dtype == jnp.float32:
            from ..ops.pallas_lu import lu_solve_pallas_batched
            batched_solve = lambda G, I: lu_solve_pallas_batched(
                G, I, opts.lu_pivot_floor)
        else:
            from ..ops.lu import lu_solve_batched
            batched_solve = lambda G, I: lu_solve_batched(
                G, I, opts.lu_pivot_floor)

    use_tridiag = linear_solver == "tridiag"
    if use_tridiag:
        from ..ops.banded import BandedPlan
        from ..ops.tridiag import bordered_solve
        n = engine.topo.n_node_eq
        m = N - n
        srows, scols, _ = engine.dc_static_entries(params)
        static_plan = BandedPlan(n, m, srows, scols)
        nl_plan = BandedPlan(n, m, engine.nl_rows, engine.nl_cols)
        if not (static_plan.ok and nl_plan.ok):
            raise ValueError("circuit is not ladder-structured; "
                             "tridiag DC solver not applicable")
    use_blockband = linear_solver == "blockband"
    if use_blockband:
        if batch:
            raise ValueError("batched DC supports the LU solver only")
        from ..ops.blockband import get_layout, BlockScatter
        from ..ops.blockcr import bordered_block_solve
        bb_layout = get_layout(engine)
        srows, scols, _ = engine.dc_static_entries(params)
        bb_static_plan = BlockScatter(bb_layout, srows, scols)
        bb_nl_plan = BlockScatter(bb_layout, engine.nl_rows, engine.nl_cols)
        bb_ns_map = (bb_layout.diag_map(nodeset[0])
                     if nodeset is not None else None)

    def ramp_body(step, carry):
        x0, total_iters = carry
        scale = (step + 1).astype(dtype) / ramp
        if use_tridiag:
            _, _, svals = engine.dc_static_entries(params)
            banded_s = static_plan.scatter(svals)
            I_s = engine.dc_rhs(params, scale)
        elif use_blockband:
            _, _, svals = engine.dc_static_entries(params)
            bb_s = bb_static_plan.scatter(svals)
            I_s = engine.dc_rhs(params, scale)
        else:
            G_s, I_s = engine.dc_static(params, scale)
        if nodeset is not None:
            ns_eqs, ns_vals = nodeset
            hold = jnp.where(step < ramp - 1, 1.0, 0.0)
            if use_tridiag or use_blockband:
                I_s = I_s.at[..., ns_eqs].add(hold * ns_vals)
            else:
                G_s = G_s.at[..., ns_eqs, ns_eqs].add(hold)
                I_s = I_s.at[..., ns_eqs].add(hold * ns_vals)
        s = jnp.clip(scale, 0.0, 1.0)
        gmin_base = opts.gmin_high_base * (1.0 - s) + opts.gmin_low_base * s
        if use_gs:
            max_iters = jnp.where(step == ramp - 1, 2 * max_iters_base,
                                  max_iters_base)
        else:
            max_iters = max_iters_base

        def cond(c):
            active = jnp.any(~c["done"]) if batch else ~c["done"]
            return active & (c["iter"] < max_iters)

        def body(c):
            x, gmin, prev_err = c["x"], c["gmin"], c["prev_err"]
            alpha_c = c["alpha"]
            if batch:
                G, I = engine.assemble_dc_iter(G_s, I_s, params, x, gmin)
                x_raw = batched_solve(G[:, :N, :N], I[:, :N])
            elif use_tridiag:
                gvals, rvals = engine._nl_vals(params, x)
                mats = nl_plan.scatter(gvals, base=banded_s)
                diag = mats["diag"] + gmin
                if nodeset is not None:
                    diag = diag.at[..., nodeset[0]].add(
                        jnp.where(step < ramp - 1, 1.0, 0.0))
                I = I_s.at[..., engine.nl_rhs_rows].add(rvals)
                xn, y = bordered_solve(
                    mats["sub"], diag, mats["sup"],
                    mats["U"], mats["W"], mats["D"],
                    I[..., :n], I[..., n:N],
                    algo="cr")  # DC can be near-singular (gmin-only
                                # grounding); CR is the stable choice —
                                # PCR is reserved for the C/dt-dominant
                                # transient systems
                x_raw = jnp.concatenate([xn, y], axis=-1)
            elif use_blockband:
                gvals, rvals = engine._nl_vals(params, x)
                mats = bb_nl_plan.scatter(gvals, base=bb_s)
                # adaptive gmin on every node-equation diagonal (interior
                # slots are all node eqs; hub border nodes get it too)
                Df = mats["D"].reshape(mats["D"].shape[:-3] + (-1,))
                Df = Df.at[..., bb_layout.gmin_int_flat].add(gmin)
                mats["D"] = Df.reshape(mats["D"].shape)
                if len(bb_layout.gmin_bor_flat):
                    Dbf = mats["Db"].reshape(mats["Db"].shape[:-2] + (-1,))
                    Dbf = Dbf.at[..., bb_layout.gmin_bor_flat].add(gmin)
                    mats["Db"] = Dbf.reshape(mats["Db"].shape)
                if nodeset is not None:
                    hold = jnp.where(step < ramp - 1, 1.0, 0.0)
                    sel_i, flat_i, sel_b, flat_b = bb_ns_map
                    if len(flat_i):
                        Df = mats["D"].reshape(mats["D"].shape[:-3] + (-1,))
                        mats["D"] = Df.at[..., flat_i].add(hold).reshape(
                            mats["D"].shape)
                    if len(flat_b):
                        Dbf = mats["Db"].reshape(mats["Db"].shape[:-2] + (-1,))
                        mats["Db"] = Dbf.at[..., flat_b].add(hold).reshape(
                            mats["Db"].shape)
                I = I_s.at[..., engine.nl_rhs_rows].add(rvals)
                f, g = bb_layout.gather_rhs(I)
                xi, yb = bordered_block_solve(
                    mats["L"], mats["D"], mats["U"],
                    mats["Ub"], mats["Wb"], mats["Db"], f, g,
                    opts.lu_pivot_floor)
                x_raw = bb_layout.gather_solution(xi, yb)
            elif use_gs:
                G, I = engine.assemble_dc_iter(G_s, I_s, params, x, gmin)
                x_raw = gauss_seidel_solve(
                    G[..., :N, :N], I[..., :N], x,
                    opts.gs_max_iters, opts.gs_tol, opts.gs_diag_eps)
            else:
                G, I = engine.assemble_dc_iter(G_s, I_s, params, x, gmin)
                x_raw = lu_solve(G[..., :N, :N], I[..., :N],
                                 opts.lu_pivot_floor)
            finite = jnp.all(jnp.isfinite(x_raw), axis=-1)

            # ConvController::update (finite path).  Strict mode replicates
            # the reference bug: the damping used for the update is ALWAYS
            # the re-clamped constant 0.35 (dcanalysis.cpp:274); the
            # "adaptive" alpha only feeds the next iteration's logs.
            # Non-strict mode applies the adaptation the controller
            # apparently intended: the carried alpha damps the update and
            # evolves with the error ratio.
            if opts.strict_reference_mode:
                alpha = jnp.clip(opts.alpha_const, opts.alpha_min,
                                 opts.alpha_max)
            else:
                # the clamp the controller applies to its input
                # (dcanalysis.cpp:274 with alphaCurrent, as intended)
                alpha = jnp.clip(alpha_c, opts.alpha_min, opts.alpha_max)
            x_new = x + (alpha[..., None] if batch else alpha) * (x_raw - x)
            err = jnp.linalg.norm(x_new - x, axis=-1)
            first = (c["iter"] == 0) | ~jnp.isfinite(prev_err)
            slow = err > prev_err * opts.slow_conv_ratio
            fast = err < prev_err * opts.fast_conv_ratio
            if opts.strict_reference_mode:
                alpha_next = alpha_c   # dead in strict mode; keep carry shape
            else:
                alpha_next = jnp.where(
                    first, alpha,
                    jnp.where(slow, jnp.maximum(alpha * 0.7, opts.alpha_min),
                              jnp.where(fast,
                                        jnp.minimum(alpha * 1.1,
                                                    opts.alpha_max),
                                        alpha)))
            gmin_upd = jnp.where(
                first, gmin_base,
                jnp.where(slow, jnp.minimum(gmin * 2.0, opts.gmin_abs_max),
                          jnp.where(fast, 0.5 * gmin + 0.5 * gmin_base,
                                    0.7 * gmin + 0.3 * gmin_base)))
            converged = err < opts.dc_tol

            # non-finite path: bump gmin, keep x/prevErr (dcanalysis.cpp:135-138)
            gmin_nf = jnp.minimum(gmin * opts.gmin_nonfinite_factor,
                                  opts.gmin_nonfinite_max)

            upd = finite & ~c["done"]
            c = dict(c)
            c["x"] = jnp.where(upd[..., None], x_new, x)
            c["prev_err"] = jnp.where(upd, err, prev_err)
            c["gmin"] = jnp.where(c["done"], gmin,
                                  jnp.where(finite, gmin_upd, gmin_nf))
            c["alpha"] = jnp.where(upd, alpha_next, alpha_c)
            c["done"] = c["done"] | (upd & converged)
            c["iter"] = c["iter"] + 1
            return c

        lane_shape = (batch,) if batch else ()
        alpha0 = 0.7 if use_gs else 0.5   # initialAlphaGS/LU (dcanalysis.hpp)
        init = dict(
            x=x0,
            gmin=jnp.full(lane_shape, gmin_base, dtype),
            prev_err=jnp.full(lane_shape, jnp.inf, dtype),
            alpha=jnp.full(lane_shape, alpha0, dtype),
            done=jnp.zeros(lane_shape, bool),
            iter=jnp.asarray(0, jnp.int32),
        )
        out = lax.while_loop(cond, body, init)
        return out["x"], total_iters + out["iter"]

    if x_init is not None:
        x0 = jnp.broadcast_to(
            jnp.asarray(x_init, dtype),
            ((batch,) if batch else ()) + (N,))
    else:
        x0 = jnp.zeros(((batch,) if batch else ()) + (N,), dtype=dtype)
    if nodeset is not None:
        x0 = x0.at[..., nodeset[0]].set(nodeset[1])
    lo = ramp - 1 if final_only else 0
    x, iters = lax.fori_loop(lo, ramp, ramp_body,
                             (x0, jnp.asarray(0, jnp.int32)))
    if with_stats:
        return x, {"newton_iters": iters}
    return x


def dc_linear_tridiag(engine: Engine, params):
    """Linear DC via the bordered-tridiagonal solve (ladder circuits)."""
    from ..ops.banded import BandedPlan
    from ..ops.tridiag import bordered_solve
    N = engine.N
    n = engine.topo.n_node_eq
    m = N - n
    rows, cols, vals = engine.dc_static_entries(params)
    plan = BandedPlan(n, m, rows, cols)
    if not plan.ok:
        raise ValueError("circuit is not ladder-structured")
    mats = plan.scatter(vals)
    one = jnp.asarray(1.0, engine.dtype)
    I = engine.dc_rhs(params, one)
    xn, y = bordered_solve(mats["sub"], mats["diag"], mats["sup"],
                           mats["U"], mats["W"], mats["D"],
                           I[..., :n], I[..., n:N],
                           algo="cr")  # see note above: DC stays on CR
    return jnp.concatenate([xn, y], axis=-1)


def dc_linear_blockband(engine: Engine, params):
    """Linear DC via the bordered block-tridiagonal solve (general large
    circuits; ops/blockband.py)."""
    from ..ops.blockband import get_layout, BlockScatter
    from ..ops.blockcr import bordered_block_solve
    layout = get_layout(engine)
    rows, cols, vals = engine.dc_static_entries(params)
    mats = BlockScatter(layout, rows, cols).scatter(vals)
    one = jnp.asarray(1.0, engine.dtype)
    I = engine.dc_rhs(params, one)
    f, g = layout.gather_rhs(I)
    xi, y = bordered_block_solve(mats["L"], mats["D"], mats["U"],
                                 mats["Ub"], mats["Wb"], mats["Db"], f, g,
                                 engine.opts.lu_pivot_floor)
    return layout.gather_solution(xi, y)


def dc_refine(engine: Engine, params, x, n_iter: int = 2, gmin=0.0,
              batch: int = 0):
    """Mixed-precision iterative refinement of a DC operating point:
    residuals evaluated in the engine's (high) precision — float64 on the
    host, or x64-enabled TPU — with the Jacobian factored and solved in
    float32 (the Pallas batched LU when batched on TPU).

    TPUs have no native f64 ALU; XLA's emulated f64 LU is ~20x slower than
    f32 (measured, benchmarks/precision_table.py).  Classic refinement
    recovers f64-grade solutions at f32 factorization cost: each sweep is
    a damped-free Newton step x += J32^{-1} r64, converging to the true
    gmin-free operating point (so it also removes the ramped solve's
    "gmin leak").  No reference equivalent (its solver is f64-only dense
    LU, solver.hpp:30-80); this covers SURVEY.md §7 hard-part 4."""
    import jax
    N = engine.N
    f32 = jnp.float32
    use_pallas = bool(batch) and jax.default_backend() == "tpu"
    one = jnp.asarray(1.0, engine.dtype)
    gmin = jnp.asarray(gmin, engine.dtype)
    for _ in range(int(n_iter)):
        G_s, I_s = engine.dc_static(params, one)
        G, I = engine.assemble_dc_iter(G_s, I_s, params, x, gmin)
        r = I[..., :N] - jnp.einsum("...ij,...j->...i", G[..., :N, :N], x)
        G32 = G[..., :N, :N].astype(f32)
        r32 = r.astype(f32)
        if use_pallas:
            from ..ops.pallas_lu import lu_solve_pallas_batched
            d = lu_solve_pallas_batched(G32, r32, engine.opts.lu_pivot_floor)
        elif batch:
            from ..ops.lu import lu_solve_batched
            d = lu_solve_batched(G32, r32, engine.opts.lu_pivot_floor)
        else:
            d = lu_solve(G32, r32, engine.opts.lu_pivot_floor)
        x = x + d.astype(engine.dtype)
    return x


def dc_residual(engine: Engine, params, x, gmin=0.0):
    """Infinity-norm residual ||I(x) - G(x) x||_inf of the (gmin-free by
    default) nonlinear DC system, in the engine's precision."""
    N = engine.N
    one = jnp.asarray(1.0, engine.dtype)
    G_s, I_s = engine.dc_static(params, one)
    G, I = engine.assemble_dc_iter(G_s, I_s, params, x,
                                   jnp.asarray(gmin, engine.dtype))
    r = I[..., :N] - jnp.einsum("...ij,...j->...i", G[..., :N, :N], x)
    return jnp.max(jnp.abs(r), axis=-1)


def dc_operating_point(engine: Engine, params, with_stats: bool = False,
                       linear_solver: str = None, nodeset=None):
    """computeDcOperatingPoint (tanalisis.cpp:44-47 -> dcSolve -> dcSolveLU).
    linear_solver: "lu" (reference default), "gs" (dcSolveGaussSeidel,
    dcanalysis.cpp:251-257), or "tridiag" (ladder circuits).  Defaults to
    engine.opts.dc_solver."""
    if linear_solver is None:
        linear_solver = engine.opts.dc_solver
    if engine.topo.has_nonlinear:
        return dc_newton(engine, params, with_stats=with_stats,
                         linear_solver=linear_solver, nodeset=nodeset)
    fn = {"gs": dc_linear_gs, "tridiag": dc_linear_tridiag,
          "blockband": dc_linear_blockband}.get(linear_solver, dc_linear)
    x = fn(engine, params)
    if with_stats:
        return x, {"newton_iters": jnp.asarray(0, jnp.int32)}
    return x
