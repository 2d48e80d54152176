"""Small-signal AC analysis (the `.AC lin|dec|oct n fstart fstop` card).

NEW WORK with a defined-from-scratch semantics: the reference parses .AC
(parser.cpp:526-549) and has AC stamps for the independent sources
(element.cpp:68-81, 125-151) but no AC driver, and no stampAC for
R/C/L/MOS — executing its intended design verbatim would produce a singular
system.  This module implements the standard SPICE small-signal analysis:

1. solve the DC operating point;
2. linearize every nonlinear device there (the same gd/gg/gs the Newton
   stamp uses, models/mosfet.py);
3. for each frequency solve  Y(w) X = J  with
     R:   1/R                    C (and MOS junction caps): jwC
     L:   branch rows +/-1 with Y[k,k] = -jwL
     V:   branch rows +/-1, RHS J[k] = acMag * e^{j*phase}
     I:   RHS J[p] -= Iac, J[m] += Iac
     MOS/diode: DC-point conductances;
4. the frequency sweep is vmapped — every point solves in parallel.

Sweep conventions: lin = n points total; dec = n points/decade;
oct = n points/octave (endpoints included).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.assemble import Engine, _two_terminal_vals
from ..ops.lu import lu_solve
from .dc import dc_operating_point


@dataclasses.dataclass
class ACResult:
    freqs: Any    # (F,)
    xs: Any       # (F, N) complex node solutions


def sweep_frequencies(sweep_type: str, n_points: int,
                      fstart: float, fstop: float) -> np.ndarray:
    if n_points <= 0 or fstart <= 0 or fstop < fstart:
        raise ValueError("invalid .AC sweep parameters")
    if sweep_type == "lin":
        return np.linspace(fstart, fstop, max(n_points, 1))
    per = np.log10(fstop / fstart) if sweep_type == "dec" \
        else np.log2(fstop / fstart)
    total = int(np.floor(n_points * per + 1e-9)) + 1
    total = max(total, 1)
    return np.asarray(
        fstart * (fstop / fstart) ** (np.arange(total) / max(total - 1, 1)))


def ac_system_real(engine: Engine, params, x_op, omega):
    """Real/imaginary split of the AC MNA system at angular frequency omega:
    Y = G + jB, J = Jr + jJi, each real (N,)/(N,N).

    The split exists for TPU execution: the axon TPU backend's complex-
    dtype support is unreliable (v5e has no native complex; the lowering is
    experimental), so the AC/noise solves run as the equivalent real
    2N-system [[G, -B], [B, G]] — see solve_ac_real."""
    t = engine.topo
    N = engine.N
    dtype = engine.dtype

    G = jnp.zeros((N + 1, N + 1), dtype=dtype)
    G = G.at[engine.res_rows, engine.res_cols].add(engine._res_vals(params))
    G = G.at[engine.dc_const_rows, engine.dc_const_cols].add(
        engine.dc_const_vals)
    if len(engine.ctrl_rows):
        G = G.at[engine.ctrl_rows, engine.ctrl_cols].add(
            engine._ctrl_vals(params))
    if len(engine.b_static_rows):
        # behavioral V-form branch couplings (the expression part is in
        # the nl linearization below)
        G = G.at[engine.b_static_rows, engine.b_static_cols].add(
            engine.b_static_vals)
    # nonlinear devices linearized at the DC operating point
    gvals, _ = engine._nl_vals(params, x_op)
    G = G.at[engine.nl_rows, engine.nl_cols].add(gvals)

    B = jnp.zeros((N + 1, N + 1), dtype=dtype)
    C = engine._caplike_C(params)
    B = B.at[engine.cap_rows, engine.cap_cols].add(
        _two_terminal_vals(omega * C))
    if getattr(engine, "mos_charge", False):
        # charge cap model: exact small-signal trans-capacitances
        # C_tj = dq_t/dv_j at the operating point (models/moscap.py) —
        # bias-dependent and non-reciprocal, unlike the fixed lumps
        # (which _caplike_C zeroes under this model)
        from ..models.moscap import charge_jacobian
        _, Jq = charge_jacobian(engine.mos_vdgs(x_op), params)
        B = B.at[engine.mq_rows, engine.mq_cols].add(
            omega * Jq.reshape(-1))
    if len(t.ind_k):
        B = B.at[t.ind_k, t.ind_k].add(-omega * params["ind_l"])
    if len(t.mut_a):
        M = engine._mutual_M(params)
        B = B.at[engine.mut_rows, engine.mut_cols].add(
            -omega * jnp.concatenate([M, M], axis=-1))
    if engine.n_tl:
        # exact frequency-domain line (no discretization): the Branin
        # branch rows with the delay as a phase factor e^{-j w TD}:
        #   k1: V(p1)-V(n1) - Z0 I1 - e^{-jwTD} (V(p2)-V(n2) + Z0 I2) = 0
        # real split: -e^{-jth} = -cos(th) + j sin(th)
        z0v = params["tl_z0"]
        th = omega * params["tl_td"]
        cth, sth = jnp.cos(th), jnp.sin(th)
        G = G.at[engine.tl_kcl_rows, engine.tl_kcl_cols].add(
            engine.tl_kcl_vals)
        one = jnp.ones_like(z0v)
        # own-port part (constant, real): +1, -1, -Z0
        own_rows = np.stack([t.tl_k1, t.tl_k1, t.tl_k1,
                             t.tl_k2, t.tl_k2, t.tl_k2], 1).ravel()
        own_cols = np.stack([t.tl_ep1, t.tl_em1, t.tl_k1,
                             t.tl_ep2, t.tl_em2, t.tl_k2], 1).ravel()
        own_vals = jnp.stack([one, -one, -z0v, one, -one, -z0v],
                             axis=-1).reshape(-1)
        G = G.at[own_rows, own_cols].add(own_vals)
        # delayed other-port part: coefficient -e^{-jth} on V(other) and
        # -Z0 e^{-jth} on I(other)
        oth_rows = np.stack([t.tl_k1, t.tl_k1, t.tl_k1,
                             t.tl_k2, t.tl_k2, t.tl_k2], 1).ravel()
        oth_cols = np.stack([t.tl_ep2, t.tl_em2, t.tl_k2,
                             t.tl_ep1, t.tl_em1, t.tl_k1], 1).ravel()
        g_oth = jnp.stack([-cth, cth, -z0v * cth,
                           -cth, cth, -z0v * cth], axis=-1).reshape(-1)
        b_oth = jnp.stack([sth, -sth, z0v * sth,
                           sth, -sth, z0v * sth], axis=-1).reshape(-1)
        G = G.at[oth_rows, oth_cols].add(g_oth)
        B = B.at[oth_rows, oth_cols].add(b_oth)

    deg = jnp.pi / 180.0
    vph = params["vs_ac_phase"] * deg
    Jr = jnp.zeros((N + 1,), dtype=dtype)
    Ji = jnp.zeros((N + 1,), dtype=dtype)
    Jr = Jr.at[t.vs_k].add(params["vs_ac_mag"] * jnp.cos(vph))
    Ji = Ji.at[t.vs_k].add(params["vs_ac_mag"] * jnp.sin(vph))
    iph = params["is_ac_phase"] * deg
    ir = params["is_ac_mag"] * jnp.cos(iph)
    ii = params["is_ac_mag"] * jnp.sin(iph)
    Jr = Jr.at[engine.is_rhs_rows].add(
        jnp.stack([-ir, ir], axis=-1).reshape(-1))
    Ji = Ji.at[engine.is_rhs_rows].add(
        jnp.stack([-ii, ii], axis=-1).reshape(-1))
    return G[:N, :N], B[:N, :N], Jr[:N], Ji[:N]


def ac_system(engine: Engine, params, x_op, omega):
    """Build complex (Y, J) at angular frequency omega (CPU path)."""
    cdtype = jnp.complex128 if engine.dtype == jnp.float64 else jnp.complex64
    G, B, Jr, Ji = ac_system_real(engine, params, x_op, omega)
    return (G.astype(cdtype) + 1j * B.astype(cdtype),
            Jr.astype(cdtype) + 1j * Ji.astype(cdtype))


def solve_ac_real(engine: Engine, G, B, br, bi):
    """Solve (G + jB)(xr + jxi) = br + jbi as the real 2N system
    [[G, -B], [B, G]] [xr; xi] = [br; bi].  Returns (xr, xi)."""
    M = jnp.concatenate(
        [jnp.concatenate([G, -B], axis=-1),
         jnp.concatenate([B, G], axis=-1)], axis=-2)
    rhs = jnp.concatenate([br, bi], axis=-1)
    x = lu_solve(M, rhs, engine.opts.lu_pivot_floor)
    N = G.shape[-1]
    return x[..., :N], x[..., N:]


def _make_solve_sweep(engine: Engine, params, x_op):
    """Per-frequency solver closure with the assembly hoisted when legal.

    Without T-lines every susceptance entry is LINEAR in omega (caps/
    charge-model trans-caps scale +omega, inductor/mutual branch rows
    -omega) and G and the RHS are frequency-independent, so the whole
    scatter-add assembly runs ONCE and each frequency point is just
    [[G, -wB1], [wB1, G]] — the per-(lane, freq) assembly was measured
    to dominate the batched sweep (HARDWARE_CHECKLIST item 11: 6.3k
    solves/s assembly-bound at B=4096xF=64).  T-line decks keep the
    exact per-frequency build (e^{-jwTD} is not linear in omega)."""
    if engine.n_tl:
        def solve_one(f):
            G, B, br, bi = ac_system_real(engine, params, x_op,
                                          2.0 * jnp.pi * f)
            return solve_ac_real(engine, G, B, br, bi)
        return solve_one
    one = jnp.asarray(1.0, engine.dtype)
    G, B1, br, bi = ac_system_real(engine, params, x_op, one)

    def solve_one(f):
        return solve_ac_real(engine, G, (2.0 * jnp.pi * f) * B1, br, bi)
    return solve_one


def ac_analysis(engine: Engine, params, freqs, x_op: Optional[Any] = None):
    """Run the AC sweep; returns ACResult with complex (F, N) solutions.

    The jitted computation is complex-free (real 2N solves; see
    ac_system_real) — the complex result is composed on the host, so the
    sweep runs on TPU backends without complex-dtype support."""
    if x_op is None:
        x_op = dc_operating_point(engine, params)
    freqs = jnp.asarray(freqs, engine.dtype)

    def sweep(fs):
        return jax.vmap(_make_solve_sweep(engine, params, x_op))(fs)

    xr, xi = jax.jit(sweep)(freqs)
    xs = np.asarray(xr) + 1j * np.asarray(xi)
    return ACResult(freqs=freqs, xs=xs)


def make_ac_batched_fn(engine: Engine, freqs):
    """Factory for the batched-AC jitted program: fn(bparams, x_ops) ->
    (xr, xi) of shape (B, F, N) each, with the jit reused across calls of
    the same shapes (ac_analysis_batched re-closes over a fresh jit every
    call; benchmarks need the warm path).

    Frequencies run in lax.map chunks of CSIM_AC_FREQ_BLOCK (default 8,
    largest divisor of F taken): materializing all B x F real 2N x 2N
    systems at once OOMs HBM at production sizes (measured 19.6 GB at
    B=4096, F=64, N=31 on a 16 GB v5e), while a frequency chunk bounds
    the live working set at B x block systems with no dispatch overhead
    (the map stays inside the one jit)."""
    import os as _os
    freqs = jnp.asarray(freqs, engine.dtype)
    F = int(freqs.shape[0])

    # Fused Pallas sweep (ops/pallas_ac.py): per-lane G/B1 assembled once,
    # every (lane, freq) complex NxN system formed and eliminated in VMEM.
    # Eligibility mirrors the T-line-free linear-in-omega hoist below; the
    # f32 + TPU gate matches ops/lu._solve_batched_dispatch.  Measured 26x
    # the XLA path at B=4096 x F=64 on v5e (benchmarks/bench_ac_mc.py).
    from ..ops.pallas_ac import N_MAX as _AC_NMAX
    use_fused = (_os.environ.get("CSIM_AC_FUSED", "1") != "0"
                 and jax.default_backend() == "tpu"
                 and engine.dtype == jnp.float32
                 and not engine.n_tl
                 and 0 < engine.N <= _AC_NMAX)
    if use_fused:
        from ..ops.pallas_ac import ac_sweep_pallas

        def fused(bp, x_ops):
            one = jnp.asarray(1.0, engine.dtype)
            G, B1, br, bi = jax.vmap(
                lambda p, x: ac_system_real(engine, p, x, one))(bp, x_ops)
            om = 2.0 * jnp.pi * freqs
            return ac_sweep_pallas(G, B1, br, bi, om,
                                   engine.opts.lu_pivot_floor)

        return jax.jit(fused)

    blk = min(int(_os.environ.get("CSIM_AC_FREQ_BLOCK", 8)), F)
    while F % blk:
        blk -= 1
    fchunks = freqs.reshape(F // blk, blk)

    def one_lane(p, x_op):
        # assembly hoisted out of the frequency loop when the deck has
        # no T-lines (see _make_solve_sweep) — the old per-(lane, freq)
        # rebuild made the sweep assembly-bound on chip
        solve_one = _make_solve_sweep(engine, p, x_op)
        xr, xi = jax.lax.map(jax.vmap(solve_one), fchunks)
        return (xr.reshape(F, -1), xi.reshape(F, -1))

    return jax.jit(jax.vmap(one_lane))


def ac_analysis_batched(engine: Engine, bparams, freqs,
                        x_ops: Optional[Any] = None) -> ACResult:
    """Monte-Carlo AC: the whole (lanes x frequencies) sweep solves as
    one batched program — vmap over lanes around the vmapped frequency
    sweep, complex-free on device (see ac_analysis).  `bparams` carries a
    leading batch axis; x_ops (B, N) defaults to the natively-batched DC
    operating points.  Returns ACResult with xs of shape (B, F, N)."""
    if x_ops is None:
        from ..parallel.montecarlo import batched_dc_fast
        x_ops = batched_dc_fast(engine, bparams)
    freqs = jnp.asarray(freqs, engine.dtype)
    xr, xi = make_ac_batched_fn(engine, freqs)(bparams, x_ops)
    xs = np.asarray(xr) + 1j * np.asarray(xi)
    return ACResult(freqs=freqs, xs=xs)


def write_ac_csv(path: str, topo, result: ACResult, selection=None) -> None:
    """CSV schema: freq, then VM(node)/VP(node) (magnitude, phase in deg) for
    every node-voltage column, then IM/IP for branch currents.  `selection`
    (from io.csvout.probe_selection, e.g. the .PRINT AC probes) restricts
    and orders the columns; differential V(a,b) probes subtract the complex
    phasors before taking magnitude/phase."""
    freqs = np.asarray(result.freqs)
    xs = np.asarray(result.xs)
    if selection is None:
        selection = [(f"V({n})", int(e)) for n, e in
                     zip(topo.volt_col_names, topo.volt_col_eqs)]
        selection += [(f"I({n})", int(e)) for n, e in
                      zip(topo.branch_col_names, topo.branch_col_eqs)]

    def phasor(row, spec):
        if isinstance(spec, tuple):
            a = row[spec[0]] if spec[0] >= 0 else 0.0
            b = row[spec[1]] if spec[1] >= 0 else 0.0
            return a - b
        return row[spec] if spec >= 0 else 0.0

    cols = []
    for label, _ in selection:
        inner = label[label.find("(") + 1:label.rfind(")")] \
            if "(" in label else label
        kind = "I" if label.startswith("I(") else "V"
        cols += [f"{kind}M({inner})", f"{kind}P({inner})"]
    with open(path, "w") as f:
        f.write("freq," + ",".join(cols) + "\n")
        for fi, row in zip(freqs, xs):
            vals = []
            for _, spec in selection:
                v = phasor(row, spec)
                vals += [f"{abs(v):.9e}", f"{np.degrees(np.angle(v)):.9e}"]
            f.write(f"{fi:.9e}," + ",".join(vals) + "\n")
