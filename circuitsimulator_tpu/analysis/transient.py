"""Backward-Euler transient analysis.

Reproduces src/tanalisis.cpp:83-424 as a `lax.scan` over timesteps with a
damped-Newton `lax.while_loop` per step:

- t=0 state comes from the DC operating point (tanalisis.cpp:109-180);
- nSteps = floor(tstop/dt + 1e-12), t_k = (k+1)*dt (tanalisis.cpp:238, 256);
- per step: fixed alpha=0.45, gmin=1e-6, tol=1e-6 on the damped step size,
  max 50 Newton iterations; non-convergence is a warning, not an error
  (tanalisis.cpp:241-244, 364-376);
- companion models: C -> G += C/dt with history current, L -> Thevenin
  R=L/dt with V_hist = -(L/dt) i_prev, MOS junction caps Cgs=Cgd=Cj0/2,
  Csb=Cdb=Cj0 (tanalisis.cpp:59-80, 294-353);
- element history state updates from the *accepted* x after each step even
  if Newton did not converge (tanalisis.cpp:379-417).

Where the reference throws on a non-finite LU result (tanalisis.cpp:360-362)
this engine freezes the offending batch lane and raises a per-lane `failed`
flag instead, so one diverging Monte-Carlo lane cannot poison the batch; the
single-circuit CLI path turns the flag back into an error.

The scan carry is a pytree (x, cap history, inductor currents, failed flag)
— serializable for checkpoint/resume (see parallel/checkpoint.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.assemble import Engine
from ..ops.lu import lu_solve, make_lu_solve_auto
from .dc import dc_operating_point


@dataclasses.dataclass
class TransientResult:
    times: Any        # (n_saved,) — includes t=0 row from the DC solution
    xs: Any           # (n_saved, N)
    x_final: Any      # (N,)
    newton_iters: Any # (n_steps,) or total, per save mode
    failed: Any       # per-lane bool: non-finite LU encountered
    n_steps: int


jax.tree_util.register_dataclass(
    TransientResult,
    data_fields=["times", "xs", "x_final", "newton_iters", "failed"],
    meta_fields=["n_steps"])




def n_steps_for(tstep: float, tstop: float) -> int:
    """nSteps = floor(tstop/dt + 1e-12) (tanalisis.cpp:238)."""
    import math
    return int(math.floor(tstop / tstep + 1e-12))


def transient_step_fn(engine: Engine, params, dt, predictor: bool = False,
                      mesh=None):
    """Build the single-timestep function (carry, t) -> (carry, (x, iters)).

    carry = (x, state, failed) with state the TranState dict
    {vc, ic, il, vl} (see Engine.init_state).  With predictor=True
    (SolverOptions.tran_predictor) the carry is (x, x_prev, state, failed)
    and each step's Newton iteration starts from the linear extrapolation
    2x - x_prev instead of x — same fixed point and tolerance, typically
    ~1 iteration/step in smooth regions instead of 2+.

    Integration method via SolverOptions.tran_method ("be" = reference
    Backward Euler, "trap" = trapezoidal).  Three interchangeable
    linear-solve backends (SolverOptions.tran_solver):
    - "lu":       re-assemble + pivoted LU per Newton iteration, the
                  reference's algorithm (tanalisis.cpp:255-362);
    - "woodbury": G_static factored once for the whole transient, each
                  Newton iteration is a rank-k update solve
                  (ops/woodbury.py) — algebraically the same x_raw,
                  ~20x fewer flops per iteration at dbmixer size;
    - "tridiag":  bordered cyclic reduction for ladder circuits;
    - "blockband": RCM-reordered bordered block-tridiagonal solve for
                  large non-ladder topologies (ops/blockband.py).

    mesh (giant-circuit multi-chip): a single-axis jax.sharding.Mesh named
    parallel.spike.PART_AXIS — the blockband solve is then domain-
    decomposed across devices with the SPIKE algorithm
    (parallel/spike.py); single circuit instance only (no batch lanes).
    """
    opts = engine.opts
    N = engine.N
    dtype = engine.dtype
    method = opts.tran_method
    static_I = engine.make_tran_static_I(dt, method)
    update_state = engine.make_update_state(dt, method)
    use_woodbury = opts.tran_solver == "woodbury"
    use_tridiag = opts.tran_solver == "tridiag"
    use_blockband = opts.tran_solver == "blockband"
    use_blockwb = opts.tran_solver == "blockwb"
    if use_blockwb and mesh is not None:
        # the pre-factored path is single-device; a mesh means SPIKE
        # domain decomposition — use the re-eliminating solve it shards
        use_blockwb, use_blockband = False, True
    mos_charge = getattr(engine, "mos_charge", False)
    inv_dt = 1.0 / dt if mos_charge else None
    mixed_refine = (bool(opts.tran_mixed_refine)
                    and dtype == jnp.float64
                    and not (use_woodbury or use_tridiag
                             or use_blockband or use_blockwb))
    # Every nonlinear class rides the rank-k plan now: MOS/JFET/diode/BJT
    # (width-3 rows), switches (width-4), and behavioral B-sources
    # (rank-1 rows over their probe pairs, width 2m; the plan widens to
    # the max — ops/woodbury.py).  No LU fallback remains on this path.
    if use_tridiag:
        # O(n) bordered-tridiagonal path for ladder circuits (no dense G)
        from ..ops.banded import BandedPlan
        from ..ops.tridiag import bordered_solve
        n = engine.topo.n_node_eq
        m = N - n
        srows, scols, svals = engine.tran_static_entries(
            params, dt, opts.tran_gmin, method)
        static_plan = BandedPlan(n, m, srows, scols)
        nl_plan = BandedPlan(n, m, engine.nl_rows, engine.nl_cols)
        mq_plan = (BandedPlan(n, m, engine.mq_rows, engine.mq_cols)
                   if mos_charge else None)
        if not (static_plan.ok and nl_plan.ok
                and (mq_plan is None or mq_plan.ok)):
            raise ValueError("circuit is not ladder-structured; "
                             "tridiag transient solver not applicable")
        banded_static = static_plan.scatter(svals)
    elif use_blockband:
        # general large-circuit path: RCM-reordered bordered block-tridiag
        from ..ops.blockband import get_layout, BlockScatter
        from ..ops.blockcr import bordered_block_solve
        bb_layout = get_layout(engine)
        srows, scols, svals = engine.tran_static_entries(
            params, dt, opts.tran_gmin, method)
        bb_static_plan = BlockScatter(bb_layout, srows, scols)
        bb_nl_plan = BlockScatter(bb_layout, engine.nl_rows, engine.nl_cols)
        bb_mq_plan = (BlockScatter(bb_layout, engine.mq_rows,
                                   engine.mq_cols)
                      if mos_charge else None)
        bb_static = bb_static_plan.scatter(svals)
        if mesh is not None:
            from ..parallel.spike import bordered_spike_solve
            from functools import partial as _partial
            bordered_block_solve = _partial(bordered_spike_solve, mesh)
    elif use_blockwb:
        # pre-factored large-circuit path: the BE companion matrix is
        # CONSTANT over the whole transient (fixed dt), so factor the
        # RCM bordered block-tridiagonal base ONCE (block-CR elimination
        # inverses cached) and carry every nonlinear device as Woodbury
        # rank-1 rows over it — each Newton iteration costs O(nb k^2)
        # matmuls + the k_wb^2 capacitance solve instead of blockband's
        # O(nb k^3) re-elimination.  Single-device only (a mesh falls
        # back to blockband/SPIKE above).
        from ..ops.blockband import get_layout, BlockScatter
        from ..ops.blockcr import (bordered_block_factor,
                                   bordered_block_apply)
        bb_layout = get_layout(engine)
        srows, scols, svals = engine.tran_static_entries(
            params, dt, opts.tran_gmin, method)
        mats = BlockScatter(bb_layout, srows, scols).scatter(svals)
        bfac = bordered_block_factor(
            mats["L"], mats["D"], mats["U"],
            mats["Ub"], mats["Wb"], mats["Db"], opts.lu_pivot_floor)

        def bb_solve_op(Bmat):
            """Apply G0^{-1} to (..., N, q) original-order multi-RHS."""
            Bq = jnp.moveaxis(Bmat, -1, -2)          # (..., q, N)
            f, g = bb_layout.gather_rhs(Bq)
            x, y = bordered_block_apply(bfac, f, g)
            return jnp.moveaxis(bb_layout.gather_solution(x, y), -2, -1)
    else:
        G_static = engine.tran_static_G(params, dt, opts.tran_gmin, method)
        # Monte-Carlo batches (vmap over lanes) dispatch the per-iteration
        # dense solve to the Pallas VMEM-resident LU on TPU; single-lane
        # and CPU runs are bitwise-unchanged (plain lu_solve).
        dense_solve = make_lu_solve_auto(opts.lu_pivot_floor)
    if use_woodbury:
        from ..ops.woodbury import WoodburySolver
        wb = WoodburySolver(engine, params, G_static[..., :N, :N])
    elif use_blockwb:
        from ..ops.woodbury import WoodburySolver
        wb = WoodburySolver(engine, params, solve_op=bb_solve_op)
        use_woodbury = True

    def step(carry, t):
        # Pin full-f32 matmul passes for everything traced in the step
        # (assembly one-hot matmuls, Woodbury reads, history updates): the
        # TPU MXU's default bf16 passes round the RHS of every step, an
        # error that INTEGRATES over the transient instead of being
        # corrected by Newton (measured: 5.8e-2 final-state error on a
        # resonant RLC over 8k steps vs 1.2e-4 pinned, at a 3.5%
        # throughput cost on dbmixer; benchmarks/bench_filter.py).  The
        # fused Pallas kernel (ops/pallas_step.py) already pins HIGHEST.
        # No-op on CPU and for f64.
        with jax.default_matmul_precision("highest"):
            return _step_inner(carry, t)

    def _step_inner(carry, t):
        if predictor:
            x, x_prev, state, failed = carry
            x_init = 2.0 * x - x_prev
        else:
            x, state, failed = carry
            x_init = x
        I_s = static_I(params, state, t)
        if use_woodbury:
            z0 = wb.z0(I_s[..., :N])

        unrolled = int(opts.tran_unrolled_iters)

        def cond(c):
            return (~c["done"]) & (c["iter"] < opts.tran_max_newton_iters)

        if mos_charge:
            qex = ((state["qm"], inv_dt, state["qi"])
                   if method == "trap" else (state["qm"], inv_dt))
        else:
            qex = None

        def body(c):
            if use_woodbury:
                x_raw = wb.solve(params, c["x"], z0, t, qex)
            elif use_tridiag:
                gvals, rvals = engine._nl_vals(params, c["x"], t)
                mats = nl_plan.scatter(gvals, base=banded_static)
                I = I_s.at[..., engine.nl_rhs_rows].add(rvals)
                if mos_charge:
                    # charge cap model: the 15 Jacobian + 5 RHS
                    # injection entries per MOS (mq_* patterns) ride the
                    # banded plan like the nonlinear conduction does
                    gq, cq = engine.mosq_linearize(
                        params, engine.mos_vdgs(c["x"]), *qex)
                    mats = mq_plan.scatter(
                        gq.reshape(*gq.shape[:-3], -1), base=mats)
                    I = I.at[..., engine.mq_rhs_rows].add(
                        -cq.reshape(*cq.shape[:-2], -1))
                xn, y = bordered_solve(
                    mats["sub"], mats["diag"], mats["sup"],
                    mats["U"], mats["W"], mats["D"],
                    I[..., :n], I[..., n:N],
                    algo=opts.tridiag_algo)
                x_raw = jnp.concatenate([xn, y], axis=-1)
            elif use_blockband:
                gvals, rvals = engine._nl_vals(params, c["x"], t)
                mats = bb_nl_plan.scatter(gvals, base=bb_static)
                I = I_s.at[..., engine.nl_rhs_rows].add(rvals)
                if mos_charge:
                    # charge injection scatter (see the tridiag branch)
                    gq, cq = engine.mosq_linearize(
                        params, engine.mos_vdgs(c["x"]), *qex)
                    mats = bb_mq_plan.scatter(
                        gq.reshape(*gq.shape[:-3], -1), base=mats)
                    I = I.at[..., engine.mq_rhs_rows].add(
                        -cq.reshape(*cq.shape[:-2], -1))
                f, g = bb_layout.gather_rhs(I)
                xi, y = bordered_block_solve(
                    mats["L"], mats["D"], mats["U"],
                    mats["Ub"], mats["Wb"], mats["Db"], f, g,
                    opts.lu_pivot_floor)
                x_raw = bb_layout.gather_solution(xi, y)
            else:
                G, I = engine.assemble_tran_iter(G_static, I_s, params,
                                                 c["x"], t, qex)
                if mixed_refine:
                    # f64 residual around the current iterate, f32 inner
                    # solve for the correction (dc_refine along the
                    # transient): Newton is the refinement loop, so the
                    # damped fixpoint is the f64 one while every
                    # factorization runs at f32 cost
                    Gn = G[..., :N, :N]
                    r = (I[..., :N]
                         - jnp.einsum("...ij,...j->...i", Gn, c["x"]))
                    d = dense_solve(Gn.astype(jnp.float32),
                                    r.astype(jnp.float32))
                    x_raw = c["x"] + d.astype(dtype)
                else:
                    x_raw = dense_solve(G[..., :N, :N], I[..., :N])
            finite = jnp.all(jnp.isfinite(x_raw), axis=-1)
            upd_vec = x_raw - c["x"]
            if opts.tran_newton_clamp > 0.0:
                upd_vec = jnp.clip(upd_vec, -opts.tran_newton_clamp,
                                   opts.tran_newton_clamp)
            x_new = c["x"] + opts.tran_alpha * upd_vec
            err = jnp.linalg.norm(x_new - c["x"], axis=-1)
            upd = finite & ~c["done"]
            out = dict(c)
            out["x"] = jnp.where(upd, x_new, c["x"])
            out["done"] = c["done"] | (upd & (err < opts.tran_tol)) | ~finite
            out["failed"] = c["failed"] | ~finite
            out["iter"] = c["iter"] + 1
            return out

        init = dict(x=x_init, done=failed, failed=failed,
                    iter=jnp.asarray(0, jnp.int32))
        if unrolled > 0:
            out = init
            for _ in range(unrolled):
                out = body(out)
        else:
            out = lax.while_loop(cond, body, init)
        x_new = out["x"]
        state = update_state(params, x_new, state)
        if predictor:
            return (x_new, x, state, out["failed"]), (x_new, out["iter"])
        return (x_new, state, out["failed"]), (x_new, out["iter"])

    return step


def run_transient(engine: Engine, params, tstep, tstop,
                  x0: Optional[Any] = None, save_xs: bool = True,
                  mesh=None, noise_key=None):
    """Full transient run.  x0 defaults to the DC operating point.
    mesh: domain-decompose the (blockband) solve across devices — see
    transient_step_fn.
    noise_key: PRNG key activating TRNOISE sources (extension) — white
    Gaussian noise values (per-source RMS na, hold interval nt) are
    drawn per step inside the scan via counter-keyed fold_in (O(1)
    memory, reproducible, per-lane distinct under vmap with split
    keys); without a key the run is deterministic."""
    dtype = engine.dtype
    # concrete even while tracing under jit: tstep is a bound static and
    # the transmission-line ring length must be a compile-time constant
    with jax.ensure_compile_time_eval():
        dt = jnp.asarray(tstep, dtype)
    n_steps = n_steps_for(float(tstep), float(tstop))

    if x0 is None:
        x0 = dc_operating_point(engine, params)
    state0 = engine.init_state(x0, params, dt, noise_key=noise_key)
    failed0 = jnp.zeros(x0.shape[:-1], dtype=bool)
    predictor = engine.opts.tran_predictor
    carry0 = (x0, x0, state0, failed0) if predictor else (x0, state0, failed0)

    ts = (jnp.arange(1, n_steps + 1, dtype=dtype)) * dt
    step = transient_step_fn(engine, params, dt, predictor=predictor,
                             mesh=mesh)

    if save_xs:
        carry, (xs, iters) = lax.scan(step, carry0, ts)
        times = jnp.concatenate([jnp.zeros((1,), dtype), ts])
        xs_all = jnp.concatenate([x0[None], xs], axis=0)
        return TransientResult(times=times, xs=xs_all, x_final=carry[0],
                               newton_iters=iters, failed=carry[-1],
                               n_steps=n_steps)
    else:
        def step_nosave(carry, t):
            carry, (_, iters) = step(carry, t)
            return carry, iters
        carry, iters = lax.scan(step_nosave, carry0, ts)
        return TransientResult(times=ts, xs=None, x_final=carry[0],
                               newton_iters=iters, failed=carry[-1],
                               n_steps=n_steps)
