"""Monte-Carlo / parameter-sweep batching.

The reference runs one circuit per process; here thousands of instances of
the same topology batch via `vmap` over the params pytree (SURVEY.md §2
parallelism table).  Only *parameters* vary across lanes — topology (index
patterns) is shared, so the whole batch compiles to one XLA program whose
leading batch dimension maps onto the TPU vector lanes, and shards across
chips via parallel/sharding.py.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np_mod
import jax
import jax.numpy as jnp
from jax import lax

from ..analysis.dc import dc_operating_point
from ..analysis.transient import run_transient
from ..ops.assemble import Engine


def broadcast_params(params: Dict[str, Any], batch: int) -> Dict[str, Any]:
    """Tile every parameter leaf to a leading batch axis."""
    return jax.tree.map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape), params)


def normal_draws(key, batch: int, dims: int, sampler: str = "mc"):
    """(batch, dims) standard-normal draws under a sampling plan.

    sampler:
      "mc"         independent pseudo-random draws (plain Monte Carlo).
      "lhs"        Latin-hypercube: each dimension's batch values fall in
                   distinct equiprobable strata (one per lane, randomly
                   permuted, jittered within the stratum), then mapped
                   through the normal inverse CDF.  Same marginals as
                   "mc", far lower variance of batch means.
      "sobol"      scrambled Sobol low-discrepancy sequence (host-side
                   scipy.stats.qmc, seeded from `key`) through the
                   inverse CDF; best equidistribution when `batch` is a
                   power of two.
      "antithetic" mirrored pairs: lane i and lane batch//2 + i carry
                   z and -z, cancelling the odd error component of any
                   symmetric estimator.

    All plans produce exactly-N(0,1) marginals; only the joint layout
    across the batch differs, so downstream lognormal perturbation and
    measure statistics are unchanged in expectation.
    """
    if sampler == "mc":
        return jax.random.normal(key, (batch, dims))
    if sampler == "antithetic":
        half = (batch + 1) // 2
        z = jax.random.normal(key, (half, dims))
        return jnp.concatenate([z, -z], axis=0)[:batch]
    if sampler == "lhs":
        from jax.scipy.special import ndtri
        k1, k2 = jax.random.split(key)
        # one random permutation of the strata per dimension (argsort of
        # iid uniforms), jittered uniformly inside each stratum.  The
        # CDF argument is clipped strictly inside (0, 1) AFTER the
        # division — f32 rounding can land (perm+u)/batch on exactly 0.0
        # or 1.0, and ndtri(0|1) = ±inf would destroy the lane.  1e-6
        # caps the tail at 4.75σ, beyond any stratum of batch < 500k.
        perm = jnp.argsort(jax.random.uniform(k1, (dims, batch)), axis=1)
        u = jax.random.uniform(k2, (dims, batch))
        p = (perm.astype(jnp.float32) + u) / batch
        return ndtri(jnp.clip(p, 1e-6, 1.0 - 1e-6)).T
    if sampler == "sobol":
        try:
            from scipy.stats import qmc
            from scipy.special import ndtri as ndtri_host
        except ImportError as e:                      # pragma: no cover
            raise ImportError(
                "sampler='sobol' needs scipy; use 'lhs'") from e
        import warnings
        seed = int(np_mod.asarray(
            jax.random.key_data(key)).ravel()[-1]) & 0x7FFFFFFF
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")           # non-2^k batch note
            u = qmc.Sobol(d=dims, scramble=True, seed=seed).random(batch)
        # host-side f64 inverse CDF: scipy's Sobol grid is 2^-30-spaced,
        # so u can sit within f32-rounding distance of 1.0 — clip in
        # f64 where 1-1e-12 is representable, THEN cast the z values
        z = ndtri_host(np_mod.clip(u, 1e-12, 1.0 - 1e-12))
        return jnp.asarray(z, jnp.float32)
    raise ValueError(f"unknown sampler {sampler!r}; expected "
                     "'mc' | 'lhs' | 'sobol' | 'antithetic'")


def _z_layout(params, rel_sigma):
    """Column layout of the joint z-space: perturbable names in sorted
    order, one column per scalar dimension of each leaf."""
    names = [n for n in sorted(rel_sigma)
             if n in params and params[n].dtype.kind == "f"
             and params[n].size]
    sizes = [int(params[n].size) for n in names]
    return names, sizes, sum(sizes)


def _params_from_Z(params, rel_sigma, Z):
    """Apply the lognormal mismatch map to a (batch, dims) z matrix in
    the _z_layout column order."""
    names, sizes, _ = _z_layout(params, rel_sigma)
    batch = Z.shape[0]
    out = {}
    off = 0
    cols = {}
    for n, sz in zip(names, sizes):
        cols[n] = Z[:, off:off + sz].reshape((batch,) + params[n].shape)
        off += sz
    for name, arr in params.items():
        if name in cols:
            out[name] = arr[None] * jnp.exp(
                rel_sigma[name] * cols[name].astype(arr.dtype))
        else:
            out[name] = jnp.broadcast_to(arr, (batch,) + arr.shape)
    return out


def perturb_params(params: Dict[str, Any], key, batch: int,
                   rel_sigma: Mapping[str, float],
                   dtype=None, sampler: str = "mc") -> Dict[str, Any]:
    """Batched lognormal perturbation: params[k] * exp(sigma * N(0,1)).

    `rel_sigma` maps param names (e.g. "mos_vth", "res_r") to relative
    sigmas; unlisted params are broadcast unperturbed.  Lognormal keeps
    physical positivity (R, C, K, ...).

    sampler != "mc" selects a variance-reduction plan (normal_draws):
    every scalar perturbation dimension across all named params becomes
    one column of a joint (batch, dims) stratified draw.  "mc" keeps the
    historical per-name independent draws bit-for-bit (stable seeds).
    """
    out = {}
    if sampler != "mc":
        _, _, dims = _z_layout(params, rel_sigma)
        Z = normal_draws(key, batch, max(dims, 1), sampler)[:, :dims]
        return _params_from_Z(params, rel_sigma, Z)
    keys = jax.random.split(key, len(rel_sigma))
    key_for = dict(zip(sorted(rel_sigma), keys))
    for name, arr in params.items():
        if name in rel_sigma and arr.dtype.kind == "f" and arr.size:
            sig = rel_sigma[name]
            noise = jax.random.normal(
                key_for[name], (batch,) + arr.shape, dtype=arr.dtype)
            out[name] = arr[None] * jnp.exp(sig * noise)
        else:
            out[name] = jnp.broadcast_to(arr, (batch,) + arr.shape)
    return out


def perturb_params_netlist(params: Dict[str, Any], key, batch: int,
                           mc_tols: Mapping[str, Any],
                           sampler: str = "mc") -> Dict[str, Any]:
    """Batched perturbation from netlist `DEV=`/`LOT=` tolerances
    (LoweredCircuit.mc_tols): value * exp(dev*N_dev + lot*N_lot), where
    N_dev is drawn independently per device per lane and N_lot is ONE
    draw per lane shared by every element carrying a LOT tolerance (the
    classic same-production-lot correlation).  Lognormal keeps physical
    positivity, matching perturb_params.

    sampler != "mc" stratifies the joint draw (normal_draws): the shared
    lot dimension is column 0, per-device dev dimensions follow in
    sorted-name order.  "mc" keeps the historical per-name draws
    bit-for-bit."""
    out = {}
    if sampler != "mc":
        names, sizes, ndev = _z_layout(params, mc_tols)
        Z = normal_draws(key, batch, 1 + ndev, sampler)
        lot_noise = Z[:, :1]
        off = 1
        cols = {}
        for n, sz in zip(names, sizes):
            cols[n] = Z[:, off:off + sz].reshape(
                (batch,) + params[n].shape)
            off += sz
        for name, arr in params.items():
            if name in cols:
                dev, lot = mc_tols[name]
                sig = (jnp.asarray(dev, arr.dtype) * cols[name].astype(arr.dtype)
                       + jnp.asarray(lot, arr.dtype)
                       * lot_noise.astype(arr.dtype))
                out[name] = arr[None] * jnp.exp(sig)
            else:
                out[name] = jnp.broadcast_to(arr, (batch,) + arr.shape)
        return out
    keys = jax.random.split(key, len(mc_tols) + 1)
    lot_noise = jax.random.normal(keys[0], (batch, 1))
    key_for = dict(zip(sorted(mc_tols), keys[1:]))
    for name, arr in params.items():
        if name in mc_tols and arr.dtype.kind == "f" and arr.size:
            dev, lot = mc_tols[name]
            dev = jnp.asarray(dev, arr.dtype)
            lot = jnp.asarray(lot, arr.dtype)
            noise = jax.random.normal(
                key_for[name], (batch,) + arr.shape, dtype=arr.dtype)
            sig = dev * noise + lot * lot_noise.astype(arr.dtype)
            out[name] = arr[None] * jnp.exp(sig)
        else:
            out[name] = jnp.broadcast_to(arr, (batch,) + arr.shape)
    return out


def batched_dc(engine: Engine, bparams):
    """vmap'd DC operating point: params with leading batch axis -> (B, N)."""
    return jax.vmap(lambda p: dc_operating_point(engine, p))(bparams)


def batched_dc_fast(engine: Engine, bparams, nodeset=None):
    """Natively batched DC operating point: the Newton loop runs once with
    per-lane convergence masks and each iteration's dense solves go to the
    Pallas batched LU kernel on TPU (VMEM-resident lane blocks) — much
    faster than vmapping the scalar path.  CPU falls back to the vmapped
    solver.  Same fixpoint as batched_dc; lane trajectories can differ from
    the vmapped path at float rounding (different summation order).

    nodeset: optional (eqs, vals) Newton aid (Simulator._nodeset()) —
    high-gain multi-stage decks (e.g. the inamp.sp op-amps) need it to
    keep the reference's fixed-alpha ramp off the iteration cap."""
    from ..analysis.dc import dc_newton, dc_linear
    B = jax.tree.leaves(bparams)[0].shape[0]
    if not engine.topo.has_nonlinear:
        return jax.vmap(lambda p: dc_linear(engine, p))(bparams)
    return dc_newton(engine, bparams, batch=B, nodeset=nodeset)


def batched_dc_warm(engine: Engine, bparams, x_nom):
    """Monte-Carlo fast DC: every lane warm-starts from the NOMINAL
    operating point `x_nom` and runs only the final (scale=1) Newton step —
    perturbed lanes sit within a few percent of nominal, so this converges
    in a handful of iterations instead of paying the full 10-step source
    ramp per lane.  Same fixpoint as batched_dc_fast (same tolerance and
    gmin schedule at scale 1); trajectories differ, so use batched_dc_fast
    when reference-schedule parity matters."""
    from ..analysis.dc import dc_newton, dc_linear
    B = jax.tree.leaves(bparams)[0].shape[0]
    if not engine.topo.has_nonlinear:
        return jax.vmap(lambda p: dc_linear(engine, p))(bparams)
    return dc_newton(engine, bparams, batch=B, x_init=x_nom, final_only=True)


def fused_transient_measures(engine: Engine, bparams, tstep, tstop, sm,
                             x0=None, chunk: int = 512,
                             interpret: bool = False, noise_key=None):
    """Streaming-measures transient stepped by the fused Pallas chunk
    kernel (ops/pallas_step.py): whole timesteps advance in VMEM, and the
    kernel's in-kernel probe output feeds the measure accumulators per
    chunk — O(chunk * P * B) waveform memory, none of the (B, T, N) state
    history ever leaves the chip.  Caller must have checked
    pallas_step.supported(engine) and B % 128 == 0.
    Returns (TransientResult-without-xs, accs-finalized values).

    noise_key (TRNOISE decks): split per lane; each chunk's per-step
    source-noise values are precomputed with Engine.trnoise_stream (the
    XLA path's own threefry draws — white realizations are bitwise the
    XLA path's, flicker to f32 fusion order) and streamed into the
    kernel; the flicker AR(1) bank states ride the chunk carry.  Caller
    must have checked pallas_step.noise_block_ok(nN, chunk)."""
    from ..analysis.transient import TransientResult, n_steps_for
    from ..ops import pallas_step

    f32 = jnp.float32
    with jax.ensure_compile_time_eval():
        dt = float(tstep)
    n_steps = n_steps_for(float(tstep), float(tstop))
    if x0 is None:
        x0 = batched_dc_fast(engine, bparams)
    x0 = x0.astype(f32)
    B = x0.shape[0]
    state0 = (engine.init_state(x0, params=bparams, dt=dt)
              if engine.n_tl else engine.init_state(x0))
    nP = sm.probe_matrix.shape[0]
    noise_on = noise_key is not None and engine.has_trnoise
    if noise_on:
        nv_idx, ni_idx = engine.vs_noisy, engine.is_noisy
        noise_idx = np_mod.concatenate(
            [nv_idx, len(engine.topo.vs_ep) + ni_idx]).astype(np_mod.int32)
        keys = jax.random.split(noise_key, B)
        M = engine._FLICKER_M
        fv0 = (jnp.zeros(bparams["vs_tn"].shape[:-1] + (M,), f32)
               if engine.vs_flicker else None)
        fi0 = (jnp.zeros(bparams["is_tn"].shape[:-1] + (M,), f32)
               if engine.is_flicker else None)
    runner = pallas_step.PallasStepRunner(
        engine, bparams, dt, probe_mat=sm.probe_matrix,
        noise_idx=noise_idx if noise_on else None)
    acc0 = sm.init(engine, x0)
    nT = runner.nT

    def advance(carry, acc, step0, n):
        core, tlw, fvfi = carry
        if noise_on:
            fv, fi = fvfi
            s0i = step0.astype(jnp.int32)
            tnv, tni, fv, fi = jax.vmap(
                lambda k_, p_, a_, b_: engine.trnoise_stream(
                    p_, k_, s0i, n, dt, a_, b_)
            )(keys, bparams, fv, fi)
            nz = jnp.concatenate(
                [tnv[..., nv_idx], tni[..., ni_idx]], axis=-1)
            nz = jnp.moveaxis(nz, 0, -1)              # (n, nN, B)
            fvfi = (fv, fi)
        else:
            nz = None
        out = runner.run_chunk(*core, step0, n, interpret=interpret,
                               tlw=tlw, noise=nz)
        carry = (out[:5], out[-1] if nT else None, fvfi)
        iters = out[5]
        raw = jnp.moveaxis(out[6][:, :nP, :], 1, 2)     # (n, B, nP)
        ys_all = sm.vals_from_raw(raw)
        ts = (step0 + jnp.arange(1, n + 1, dtype=f32)) * dt

        def body(a, inp):
            ys, t = inp
            return sm.update_vals(a, ys, t, jnp.asarray(dt, f32)), None

        acc, _ = lax.scan(body, acc, (ys_all, ts))
        return carry, acc, iters

    n_full, rem = divmod(n_steps, chunk)
    if n_full == 0:
        chunk, n_full, rem = n_steps, 1, 0
    jit_full = jax.jit(lambda c, a, s0: advance(c, a, s0, chunk))
    carry = ((x0, x0, state0["vc"], state0["il"],
              jnp.zeros((B,), bool)),
             state0["tlw"] if nT else None,
             (fv0, fi0) if noise_on else None)
    total_iters = jnp.zeros((runner.n_blocks,), jnp.int32)
    for i in range(n_full):
        carry, acc0, iters = jit_full(carry, acc0,
                                      jnp.asarray(i * chunk, f32))
        total_iters = total_iters + iters
    if rem:
        carry, acc0, iters = jax.jit(
            lambda c, a, s0: advance(c, a, s0, rem))(
            carry, acc0, jnp.asarray(n_full * chunk, f32))
        total_iters = total_iters + iters

    ts_all = jnp.arange(1, n_steps + 1, dtype=f32) * dt
    core = carry[0]
    res = TransientResult(times=ts_all, xs=None, x_final=core[0],
                          newton_iters=total_iters, failed=core[4],
                          n_steps=n_steps)
    return res, sm.finalize(acc0)


def batched_transient_measures(engine: Engine, bparams, tstep, tstop,
                               measures, topo, bindings=None,
                               fused="auto", x0=None, noise_key=None):
    """vmap'd transient with STREAMING .MEASURE evaluation: per-lane
    measurement results with O(1) waveform memory — the whole sweep's
    statistics without ever materializing (B, T, N) waveforms
    (analysis/measure_stream.py).  Returns (TransientResult-without-xs,
    {measure_name: (B,) values}).

    fused: "auto" steps the run with the fused Pallas chunk kernel
    (ops/pallas_step.py, in-kernel probe streaming) when the circuit is
    in its scope, the batch is a multiple of 128, f32, and a TPU backend
    is active; True forces it (interpret mode off-TPU — tests); False
    keeps the vmapped XLA loop.

    noise_key (TRNOISE decks): split per lane — every lane measures an
    INDEPENDENT noise realization (noisy ensemble statistics)."""
    from ..analysis.measure_stream import (StreamingMeasures,
                                           apply_derived_measures,
                                           run_transient_streaming)
    from ..ops import pallas_step
    sm = StreamingMeasures(measures, topo, engine.dtype)
    # natively-batched DC init: the vmapped per-lane ramp would pay the
    # max iteration count over all lanes at every ramp step (see bench.py).
    # Callers with a nominal operating point pass x0 (warm start, e.g.
    # Simulator.monte_carlo via batched_dc_warm — same fixpoint).
    if x0 is None:
        x0 = batched_dc_fast(engine, bparams)
    B = x0.shape[0]
    noisy_ok = noise_key is None or (
        engine.has_trnoise and pallas_step.noise_block_ok(
            len(engine.vs_noisy) + len(engine.is_noisy), 512))
    eligible = (pallas_step.supported(engine, float(tstep))
                and B % 128 == 0 and engine.dtype == jnp.float32
                and noisy_ok)
    if fused == "auto":
        fused = eligible and jax.default_backend() != "cpu"
    if fused:
        assert eligible
        res, vals = fused_transient_measures(
            engine, bparams, tstep, tstop, sm, x0=x0,
            interpret=jax.default_backend() == "cpu",
            noise_key=noise_key)
    elif noise_key is not None and engine.has_trnoise:
        keys = jax.random.split(noise_key, B)
        res, vals = jax.vmap(
            lambda p, x0row, k: run_transient_streaming(
                engine, p, tstep, tstop, sm, x0=x0row, noise_key=k)
        )(bparams, x0, keys)
    else:
        res, vals = jax.vmap(
            lambda p, x0row: run_transient_streaming(engine, p, tstep,
                                                     tstop, sm, x0=x0row)
        )(bparams, x0)
    derived = [m for m in measures
               if m.analysis == "tran" and m.kind == "param"]
    if derived:
        # derived expressions evaluate on the host; the direct results
        # stay as (possibly sharded) device arrays
        host_vals = apply_derived_measures(
            measures, {k: np_mod.asarray(v) for k, v in vals.items()},
            bindings=bindings)
        vals = dict(vals)
        for m in derived:
            vals[m.name] = host_vals[m.name]
    return res, vals


def batched_ac_measures(engine: Engine, topo, bparams, freqs, measures,
                        bindings=None):
    """Evaluate `.MEASURE AC` cards per lane on the batched
    lanes×frequencies small-signal sweep — the AC twin of
    batched_transient_measures.  Returns {name: (B,) values}."""
    import numpy as np_
    from ..analysis.ac import ac_analysis_batched
    from ..analysis.measure import run_measures
    res_ac = ac_analysis_batched(engine, bparams,
                                 jnp.asarray(freqs, engine.dtype))
    fr = np_.asarray(freqs)
    rows = [dict(run_measures(measures, topo, fr, lane_xs, "ac",
                              bindings=bindings))
            for lane_xs in res_ac.xs]
    return {m.name: np_.asarray([r[m.name] for r in rows])
            for m in measures}


def yield_analysis(engine: Engine, topo, params, key, batch: int,
                   rel_sigma: Mapping[str, float], measures, specs,
                   tstep, tstop, sampler: str = "mc",
                   sigma_scale: float = 1.0, shift=None,
                   analysis: str = "tran", freqs=None, bindings=None):
    """Monte-Carlo yield estimation, waveform-free.

    Perturb `batch` lanes (lognormal, rel_sigma), run the transient with
    STREAMING .MEASURE accumulators, and score each lane against `specs`
    — a mapping {measure_name: (low, high)} (either bound may be None;
    NaN measurements fail).  Returns a dict with the per-lane pass mask,
    the measurement arrays, the yield fraction, and its 95% Wilson
    confidence interval.  One compile, one batched run, O(1) waveform
    memory — this is the deployment shape of the engine: thousands of
    corners scored per chip without materializing a single waveform.

    sampler: "mc" | "lhs" | "sobol" | "antithetic" (normal_draws) — the
    stratified plans cut the run-to-run spread of the yield estimate for
    the same batch size.

    sigma_scale > 1 switches to scaled-sigma importance sampling for
    HIGH-SIGMA yield (rare failures a plain batch would never hit): the
    draws are inflated to N(0, sigma_scale²) so tail corners appear in
    the batch, and each lane carries the exact lognormal likelihood
    ratio w = prod_j s·exp(y_j²·(1/s² - 1)/2).  The failure probability
    is then the weighted mean E[w·1{fail}] — unbiased for the NOMINAL
    distribution — with a normal-approximation CI and the effective
    number of failure samples n_eff = (Σw_fail)²/Σw_fail² reported (the
    IS convergence diagnostic; aim for ≳50).  A 6-sigma spec measured
    with a few thousand lanes at sigma_scale≈2-3 replaces the ~10⁹
    plain-MC lanes the reference's one-lane-per-process flow would
    need.

    shift (dims-long vector in the sorted-name z layout, e.g.
    worst_case()'s z_star) centers the sampling density on the most
    probable failure point — MPP-centered mean-shift IS, the classic
    second stage after a FORM search, with far lower estimator variance
    than sigma_scale alone.  Both may combine: N(shift, sigma_scale²).

    analysis="ac" scores `.MEASURE AC` cards on the batched
    lanes×frequencies small-signal sweep (ac_analysis_batched) at
    `freqs` instead of the streaming transient — RF yield (bandwidth,
    gain, margins) with the same sampling plans and IS machinery;
    tstep/tstop are then ignored."""
    import math
    import numpy as np_
    if sigma_scale != 1.0 or shift is not None:
        _, _, dims = _z_layout(params, rel_sigma)
        Z = normal_draws(key, batch, max(dims, 1), sampler)[:, :dims]
        mu = (jnp.zeros((dims,), Z.dtype) if shift is None
              else jnp.asarray(shift, Z.dtype).reshape(dims))
        Y = mu[None, :] + sigma_scale * Z
        bparams = _params_from_Z(params, rel_sigma, Y)
        # log-likelihood ratio of nominal N(0,1)^dims vs the sampling
        # density N(mu, s²)^dims at the drawn point y:
        # sum_j [log s − y_j²/2 + (y_j − mu_j)²/(2s²)]
        s = sigma_scale
        Yn = np_.asarray(Y)
        mun = np_.asarray(mu)
        logw = (dims * math.log(s)
                - (Yn ** 2).sum(axis=1) / 2.0
                + ((Yn - mun[None, :]) ** 2).sum(axis=1) / (2.0 * s * s))
        weights = np_.exp(logw)
    else:
        bparams = perturb_params(params, key, batch, rel_sigma,
                                 sampler=sampler)
        weights = None
    if analysis == "ac":
        if freqs is None:
            raise ValueError("analysis='ac' needs freqs")
        vals = batched_ac_measures(engine, topo, bparams, freqs,
                                   measures, bindings=bindings)
        failed = np_.zeros(batch, dtype=bool)
    else:
        res, vals = batched_transient_measures(engine, bparams, tstep,
                                               tstop, measures, topo)
        failed = np_.asarray(res.failed)
    ok = np_.ones(batch, dtype=bool)
    for name, (low, high) in specs.items():
        v = np_.asarray(vals[name])
        m = np_.isfinite(v)
        if low is not None:
            m &= v >= low
        if high is not None:
            m &= v <= high
        ok &= m
    ok &= ~failed
    n = batch
    z = 1.959963984540054          # 95%
    out = {
        "pass": ok, "measures": {k: np_.asarray(v) for k, v in vals.items()},
        "n": n, "params": bparams, "failed": failed,
    }
    if weights is None:
        p = float(ok.mean())
        den = 1 + z * z / n
        center = (p + z * z / (2 * n)) / den
        half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / den
        out["yield"] = p
        out["ci95"] = (max(0.0, center - half), min(1.0, center + half))
    else:
        wf = weights * (~ok)                       # weighted failures
        p_fail = float(wf.mean())
        se = float(wf.std(ddof=1)) / math.sqrt(n)
        out["yield"] = 1.0 - p_fail
        out["p_fail"] = p_fail
        out["p_fail_se"] = se
        out["ci95"] = (max(0.0, 1.0 - (p_fail + z * se)),
                       min(1.0, 1.0 - max(0.0, p_fail - z * se)))
        out["weights"] = weights
        # IS convergence diagnostic: the effective number of FAILURE
        # samples (the estimator only sums failing-lane weights; a huge
        # bulk-lane weight is irrelevant to its variance)
        wsum = float(wf.sum())
        w2sum = float((wf ** 2).sum())
        out["n_eff"] = wsum * wsum / w2sum if w2sum > 0 else 0.0
    return out


def sobol_indices(engine: Engine, topo, params, key, n: int,
                  rel_sigma: Mapping[str, float], measures,
                  tstep, tstop, sampler: str = "lhs",
                  analysis: str = "tran", freqs=None, bindings=None):
    """Global variance-based sensitivity: first-order and total-effect
    Sobol indices of every .MEASURE value over the mismatch space.

    Saltelli scheme: two independent draw matrices A, B (n lanes each)
    plus d column-swapped hybrids AB_j — all (d+2)·n evaluations run as
    ONE batched transient with streaming measures, the shape this
    engine is built for.  Estimators (Saltelli 2010 / Jansen):

        S_j = mean(f_B·(f_ABj − f_A)) / Var(f)        (first order)
        T_j = mean((f_A − f_ABj)²) / (2·Var(f))       (total effect)

    T_j − S_j > 0 exposes interactions the linearized mismatch_budget
    cannot see.  Returns {measure: {"S1": (dims,), "ST": (dims,),
    "dims": [(name, idx), ...], "var": float}}.
    """
    import numpy as np_
    names, sizes, dims = _z_layout(params, rel_sigma)
    if dims == 0:
        raise ValueError("rel_sigma names no perturbable parameter")
    kA, kB = jax.random.split(key)
    A = normal_draws(kA, n, dims, sampler)
    Bm = normal_draws(kB, n, dims, sampler)
    blocks = [A, Bm]
    for j in range(dims):
        ABj = A.at[:, j].set(Bm[:, j])
        blocks.append(ABj)
    Z = jnp.concatenate(blocks, axis=0)           # ((d+2)·n, dims)
    bparams = _params_from_Z(params, rel_sigma, Z)
    if analysis == "ac":
        if freqs is None:
            raise ValueError("analysis='ac' needs freqs")
        vals = batched_ac_measures(engine, topo, bparams, freqs,
                                   measures, bindings=bindings)
    else:
        _, vals = batched_transient_measures(engine, bparams, tstep,
                                             tstop, measures, topo)
    dim_labels = []
    for nm, sz in zip(names, sizes):
        dim_labels += [(nm, i) for i in range(sz)]
    out = {}
    for name, v in vals.items():
        f = np_.asarray(v).reshape(dims + 2, n)
        fA, fB = f[0], f[1]
        var = float(np_.concatenate([fA, fB]).var())
        S1 = np_.zeros(dims)
        ST = np_.zeros(dims)
        if var > 0.0:            # a mismatch-independent measure gets 0s
            for j in range(dims):
                fABj = f[2 + j]
                S1[j] = float((fB * (fABj - fA)).mean()) / var
                ST[j] = float(((fA - fABj) ** 2).mean()) / (2 * var)
        out[name] = {"S1": S1, "ST": ST, "dims": dim_labels, "var": var}
    return out


def batched_transient(engine: Engine, bparams, tstep, tstop,
                      save_xs: bool = False, fused: str = "auto",
                      noise_key=None):
    """vmap'd Backward-Euler transient over a params batch.

    With save_xs=False only final state / iteration counts / failure flags
    are kept — the right mode for large sweeps (a 8192-lane dbmixer sweep
    would otherwise materialize ~50 G waveform samples).

    fused: "auto" steps a save_xs=False run with the fused Pallas chunk
    kernel (ops/pallas_step.py) when the circuit is in its scope, the
    batch is a multiple of 128, f32, and a TPU backend is active (same
    dispatch rule as batched_transient_measures); newton_iters is then
    per-128-lane-block chunk totals rather than per-lane per-step.

    noise_key (TRNOISE decks): one PRNG key, split so every lane gets an
    INDEPENDENT noise realization; omitted, the batch runs noise-free."""
    from ..ops import pallas_step
    B = jax.tree.leaves(bparams)[0].shape[0]
    n_noisy = len(engine.vs_noisy) + len(engine.is_noisy)
    noisy_ok = noise_key is None or (
        engine.has_trnoise and pallas_step.noise_block_ok(
            n_noisy, min(2000, 8192 // max(n_noisy, 1))))
    eligible = (not save_xs
                and pallas_step.supported(engine, float(tstep))
                and B % 128 == 0 and engine.dtype == jnp.float32
                and noisy_ok)
    if fused == "auto":
        fused = eligible and jax.default_backend() != "cpu"
    if fused:
        assert eligible
        return _fused_batched_transient(
            engine, bparams, tstep, tstop,
            interpret=jax.default_backend() == "cpu",
            noise_key=noise_key)
    if noise_key is not None and engine.has_trnoise:
        keys = jax.random.split(noise_key, B)
        return jax.vmap(
            lambda p, k: run_transient(engine, p, tstep, tstop,
                                       save_xs=save_xs, noise_key=k)
        )(bparams, keys)
    return jax.vmap(
        lambda p: run_transient(engine, p, tstep, tstop, save_xs=save_xs)
    )(bparams)


def make_fused_transient_fn(engine: Engine, bparams, tstep,
                            chunk: int = 2000, interpret: bool = False,
                            noise_key=None):
    """Warm factory for the fused-kernel batched transient: returns
    (carry0, jit_advance, meta) where jit_advance(carry, step0) runs ONE
    chunk and is reused across calls (benchmarks need the warm path —
    re-closing per call pays DC + runner build + retrace every time).
    meta: dict(chunk, n_blocks, advance) — `advance(c, s0, n)` traces a
    custom-length (remainder) chunk."""
    from ..ops import pallas_step

    f32 = jnp.float32
    with jax.ensure_compile_time_eval():
        dt = float(tstep)
    x0 = batched_dc_fast(engine, bparams).astype(f32)
    B = x0.shape[0]
    state0 = (engine.init_state(x0, params=bparams, dt=dt)
              if engine.n_tl else engine.init_state(x0))
    noise_on = noise_key is not None and engine.has_trnoise
    if noise_on:
        nv_idx, ni_idx = engine.vs_noisy, engine.is_noisy
        noise_idx = np_mod.concatenate(
            [nv_idx, len(engine.topo.vs_ep) + ni_idx]).astype(np_mod.int32)
        chunk = min(chunk, 8192 // max(len(noise_idx), 1))
        keys = jax.random.split(noise_key, B)
        M = engine._FLICKER_M
        fv0 = (jnp.zeros(bparams["vs_tn"].shape[:-1] + (M,), f32)
               if engine.vs_flicker else None)
        fi0 = (jnp.zeros(bparams["is_tn"].shape[:-1] + (M,), f32)
               if engine.is_flicker else None)
    runner = pallas_step.PallasStepRunner(
        engine, bparams, dt,
        noise_idx=noise_idx if noise_on else None)
    nT = runner.nT

    def advance(carry, step0, n):
        core, tlw, fvfi = carry
        if noise_on:
            fv, fi = fvfi
            s0i = step0.astype(jnp.int32)
            tnv, tni, fv, fi = jax.vmap(
                lambda k_, p_, a_, b_: engine.trnoise_stream(
                    p_, k_, s0i, n, dt, a_, b_)
            )(keys, bparams, fv, fi)
            nz = jnp.moveaxis(jnp.concatenate(
                [tnv[..., nv_idx], tni[..., ni_idx]], axis=-1), 0, -1)
            fvfi = (fv, fi)
        else:
            nz = None
        out = runner.run_chunk(*core, step0, n, interpret=interpret,
                               tlw=tlw, noise=nz)
        return (out[:5], out[-1] if nT else None, fvfi), out[5]

    carry0 = ((x0, x0, state0["vc"], state0["il"],
               jnp.zeros((B,), bool)),
              state0["tlw"] if nT else None,
              (fv0, fi0) if noise_on else None)
    jit_full = jax.jit(lambda c, s0: advance(c, s0, chunk))
    meta = {"chunk": chunk, "n_blocks": runner.n_blocks,
            "advance": advance, "B": B}
    return carry0, jit_full, meta


def _fused_batched_transient(engine: Engine, bparams, tstep, tstop,
                             chunk: int = 2000, interpret: bool = False,
                             noise_key=None):
    """Waveform-free batched transient on the fused Pallas chunk kernel:
    natively-batched DC init, then whole timesteps advance in VMEM.
    noise_key: per-lane TRNOISE realizations streamed into the kernel
    (see fused_transient_measures); the chunk shrinks to keep the noise
    block inside its VMEM budget."""
    from ..analysis.transient import TransientResult, n_steps_for

    f32 = jnp.float32
    n_steps = n_steps_for(float(tstep), float(tstop))
    carry, jit_full, meta = make_fused_transient_fn(
        engine, bparams, tstep, chunk=chunk, interpret=interpret,
        noise_key=noise_key)
    chunk, advance = meta["chunk"], meta["advance"]
    n_full, rem = divmod(n_steps, chunk)
    if n_full == 0:
        chunk, n_full, rem = n_steps, 1, 0
        jit_full = jax.jit(lambda c, s0: advance(c, s0, chunk))
    total_iters = jnp.zeros((meta["n_blocks"],), jnp.int32)
    for i in range(n_full):
        carry, iters = jit_full(carry, jnp.asarray(i * chunk, f32))
        total_iters = total_iters + iters
    if rem:
        carry, iters = jax.jit(lambda c, s0: advance(c, s0, rem))(
            carry, jnp.asarray(n_full * chunk, f32))
        total_iters = total_iters + iters
    with jax.ensure_compile_time_eval():
        dt = float(tstep)
    ts_all = jnp.arange(1, n_steps + 1, dtype=f32) * dt
    core = carry[0]
    return TransientResult(times=ts_all, xs=None, x_final=core[0],
                           newton_iters=total_iters, failed=core[4],
                           n_steps=n_steps)
