"""Periodic AC (PAC) analysis — small-signal transfer functions of a
periodically driven circuit (extension; no reference equivalent — this is
the classic RF conversion-gain analysis the reference's empty steady-state
module could never have reached).

Math: linearize the MNA system around the periodic steady state x*(t)
(period T = 1/f0).  A small-signal drive u e^{j delta t} produces a
response y(t) = Y(t) e^{j delta t} with Y T-periodic, satisfying the
linear periodically-time-varying system

    G(t) Y + C (dY/dt + j delta Y) = U

with G(t) = conduction Jacobian at x*(t) and C the constant reactive
structure matrix.  On the K = 2H+1 uniform HB samples with the spectral
differentiation matrix D this is one (K*N) x (K*N) complex solve per
offset frequency:

    [ blockdiag(G_t) + kron(D, C) + j delta kron(I, C) ] Y = 1_K (x) U

The output spectrum is the FFT of the envelope: y contains sidebands at
m*f0 + delta with coefficients Y_m — conversion gain from the input to
the m-th sideband is Y_m[out] / |U|.

Cold path: the PSS comes from the existing HB/shooting solvers; the
per-offset complex solves run on the host (K*N is a few hundred for
mixer-class circuits).  The small-signal inputs are the sources' AC specs
(`AC mag [phase]`), exactly like `.AC`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.assemble import Engine
from .hb import _reactive_structure, spectral_diff_matrix


@dataclasses.dataclass
class PACResult:
    f0: float
    deltas: np.ndarray        # (F,) offset frequencies
    harmonics: np.ndarray     # (M,) sideband indices m (response at m*f0+delta)
    spectrum: np.ndarray      # (F, M, N) complex envelope coefficients Y_m
    xs_pss: Any               # (K, N) the PSS samples used


def lptv_operator(engine: Engine, params, f0: float, xs_pss):
    """(J0, CI, K, tl): the LPTV frequency-domain operator —
    J(delta) = J0 + j*2*pi*delta*CI [+ sum_i e^{-j*2*pi*delta*tau_i} B_i]
    — built from the PSS samples.  Shared by PAC and PNOISE.

    tl is None without transmission lines; otherwise (taus, B) with
    B (n_tl, KN, KN) the real delayed-coupling blocks: a solution
    perturbation Y(t)e^{j2πδt} delays to e^{-j2πδτ}(S_τ Y)(t)e^{j2πδt},
    so each line contributes its HB shift block (hb._tl_hb_terms)
    scaled by the offset-dependent envelope phase."""
    N = engine.N
    xs_pss = jnp.asarray(xs_pss)
    K = xs_pss.shape[0]
    T = 1.0 / f0
    D = spectral_diff_matrix(K, T)                      # (K, K)
    mos_q = bool(getattr(engine, "mos_charge", False))
    C = np.asarray(_reactive_structure(engine, params, base_only=mos_q),
                   float)

    # conduction Jacobian at each PSS sample: static entries + nonlinear
    # linearization (same split the HB Newton uses)
    rows, cols, svals = engine.dc_static_entries(params)
    A_res = np.zeros((N + 1, N + 1))
    np.add.at(A_res, (np.asarray(rows), np.asarray(cols)),
              np.asarray(svals, float))
    ts = np.arange(K) * (T / K)

    tl = None
    if engine.n_tl:
        from .hb import _tl_hb_terms
        cr, cc, cv, S = _tl_hb_terms(engine, params,
                                     jnp.asarray(ts, engine.dtype),
                                     (K - 1) // 2, f0)
        np.add.at(A_res, (cr, cc), np.asarray(cv, float))
        S = np.asarray(S, float)
        t = engine.topo
        z0 = np.asarray(params["tl_z0"], float)
        taus = np.asarray(params["tl_td"], float)
        B = np.zeros((engine.n_tl, K, N, K, N))
        for i in range(engine.n_tl):
            for row, cols3 in (
                    (int(t.tl_k1[i]), (int(t.tl_ep2[i]), int(t.tl_em2[i]),
                                       int(t.tl_k2[i]))),
                    (int(t.tl_k2[i]), (int(t.tl_ep1[i]), int(t.tl_em1[i]),
                                       int(t.tl_k1[i])))):
                for c, coef in zip(cols3, (-1.0, 1.0, -z0[i])):
                    if c < N:
                        B[i, :, row, :, c] += coef * S[i]
        tl = (taus, B.reshape(engine.n_tl, K * N, K * N).astype(complex))

    def a_t(x_t, t_t):
        gvals, _ = engine._nl_vals(params, x_t, t_t)
        A = jnp.zeros((N + 1, N + 1), engine.dtype)
        A = A.at[engine.nl_rows, engine.nl_cols].add(gvals)
        return A

    A_nl = np.asarray(jax.vmap(a_t)(xs_pss, jnp.asarray(ts, engine.dtype)),
                      float)
    G_t = A_res[None, :N, :N] + A_nl[:, :N, :N]         # (K, N, N)
    J0 = np.zeros((K, N, K, N))
    kk = np.arange(K)
    J0[kk, :, kk, :] += G_t
    if mos_q:
        # charge cap model: the LPTV reactive term is d/dt[Cq(x*(t)) Y]
        # + jδ Cq(x*(t)) Y with the per-sample exact trans-capacitances
        # (hb._mos_charge_pieces) — D picks column-sample blocks, the
        # offset term is block-diagonal
        from .hb import _mos_charge_pieces
        _, Cq = _mos_charge_pieces(engine, params, xs_pss)
        C_t = C[None] + np.asarray(Cq, float)           # (K, N, N)
        J0 += np.einsum("ts,sij->tisj", D, C_t)
        CI4 = np.zeros((K, N, K, N))
        CI4[kk, :, kk, :] = C_t
        CI = CI4.reshape(K * N, K * N)
    else:
        J0 += D[:, None, :, None] * C[None, :, None, :]
        CI = np.kron(np.eye(K), C)
    J0 = J0.reshape(K * N, K * N).astype(complex)
    return J0, CI, K, tl


def _lptv_at(J0, CI, tl, delta: float):
    """Evaluate J(delta) including the offset-phased T-line blocks."""
    J = J0 + (2j * np.pi * delta) * CI
    if tl is not None:
        taus, B = tl
        J = J + np.tensordot(np.exp(-2j * np.pi * delta * taus), B, axes=1)
    return J


def _adjoint_psd_at(J0, CI, tl, d, rhs, K, N, pairs,
                    s_white_t, s_flick_t):
    """Per-source output-referred PSD contributions at offset d: solve
    the adjoint LPTV system J(d)^H psi = rhs, take each noise pair's
    gain at every PSS sample, and average |gain|^2 x S(t) over the
    period (cyclostationary folding).  Shared by pnoise and
    envelope_noise (analysis/envnoise.py) so the adjoint math lives in
    exactly one place.  Returns (nS,) real contributions."""
    J = _lptv_at(J0, CI, tl, float(d))
    psi = np.linalg.solve(J.conj().T, rhs).reshape(K, N)
    psi_e = np.concatenate([psi, np.zeros((K, 1), complex)], axis=1)
    g = psi_e[:, pairs[:, 0]] - psi_e[:, pairs[:, 1]]       # (K, nS)
    s_t = s_white_t + s_flick_t / float(d)
    return np.mean(np.abs(g) ** 2 * s_t, axis=0)            # (nS,)


def pac(engine: Engine, params, f0: float, xs_pss, deltas,
        n_sidebands: Optional[int] = None) -> PACResult:
    """xs_pss: (K, N) periodic-steady-state samples on the uniform grid
    (K odd = 2H+1, e.g. HBResult.xs).  deltas: offset frequencies."""
    N = engine.N
    J0, CI, K, tl = lptv_operator(engine, params, f0, xs_pss)

    # small-signal input vector from the sources' AC specs (like .AC)
    deg = np.pi / 180.0
    U = np.zeros(N + 1, complex)
    vph = np.asarray(params["vs_ac_phase"], float) * deg
    vmag = np.asarray(params["vs_ac_mag"], float)
    np.add.at(U, np.asarray(engine.topo.vs_k), vmag * np.exp(1j * vph))
    iph = np.asarray(params["is_ac_phase"], float) * deg
    imag = np.asarray(params["is_ac_mag"], float)
    ivals = imag * np.exp(1j * iph)
    np.add.at(U, np.asarray(engine.topo.is_ep), -ivals)
    np.add.at(U, np.asarray(engine.topo.is_em), ivals)
    U = U[:N]

    rhs = np.tile(U, K)
    H = (K - 1) // 2
    M = int(n_sidebands) if n_sidebands is not None else H
    M = min(M, H)
    harmonics = np.arange(-M, M + 1)

    spec = np.zeros((len(deltas), len(harmonics), N), complex)
    for i, d in enumerate(np.asarray(deltas, float)):
        J = _lptv_at(J0, CI, tl, d)
        Y = np.linalg.solve(J, rhs).reshape(K, N)       # envelope samples
        coeff = np.fft.fft(Y, axis=0) / K               # e^{+j m w0 t} basis
        for j, m in enumerate(harmonics):
            spec[i, j] = coeff[m % K]
    return PACResult(f0=f0, deltas=np.asarray(deltas, float),
                     harmonics=harmonics, spectrum=spec, xs_pss=xs_pss)


@dataclasses.dataclass
class PXFResult:
    f0: float
    deltas: np.ndarray        # (F,) output offset frequencies
    harmonics: np.ndarray     # (M,) input sideband indices m (input at m*f0+delta)
    xf_v: np.ndarray          # (F, M, nV) transfer from each V source (V/V)
    xf_i: np.ndarray          # (F, M, nI) transfer from each I source (V/A)
    xs_pss: Any               # (K, N) the PSS samples used
    v_names: Any = None       # (nV,) source names (filled by Simulator.pxf)
    i_names: Any = None       # (nI,)


def pxf(engine: Engine, params, f0: float, xs_pss, deltas,
        out_eq: int, ref_eq: int = -1,
        n_sidebands: Optional[int] = None) -> PXFResult:
    """Periodic transfer functions (PXF) — the adjoint of PAC: transfer
    from EVERY independent source, injected at every sideband m*f0+delta,
    to ONE output V(out[,ref]) read at the offset delta.  (PAC answers
    "one input, all output sidebands"; PXF answers "one output, all
    inputs x all input sidebands" — the classic SpectreRF trio's missing
    member next to pac/pnoise above.)

    Math: with J(delta) the LPTV operator on the K uniform PSS samples
    (lptv_operator) and c the output selector, one adjoint solve
    J(delta)^H Psi = 1_K (x) c per offset yields every transfer at once:
    an input u e^{j m w0 t} (sample values u e^{2 pi i m t/K}) produces
    output envelope-0 coefficient

        H_m(u) = (1/K) sum_t conj(Psi_t) . u e^{2 pi i m t/K}
               = ifft_t[conj(Psi_t) . u][m]

    — exactly the sample-space pairing pnoise uses for noise generators,
    here evaluated for the V-source branch rows (u_j = e_{vs_k}) and
    I-source node pairs (u_j = e_{em} - e_{ep}, the reference RHS sign,
    element.cpp:60-65).  Unit inputs, so xf_v is V/V and xf_i is V/A."""
    N = engine.N
    J0, CI, K, tl = lptv_operator(engine, params, f0, xs_pss)
    t = engine.topo

    c = np.zeros(N, complex)
    c[out_eq] = 1.0
    if ref_eq >= 0:
        c[ref_eq] -= 1.0
    rhs = np.tile(c, K)

    H = (K - 1) // 2
    M = int(n_sidebands) if n_sidebands is not None else H
    M = min(M, H)
    harmonics = np.arange(-M, M + 1)

    deltas = np.asarray(deltas, float)
    nV, nI = len(t.vs_k), len(t.is_ep)
    xf_v = np.zeros((len(deltas), len(harmonics), nV), complex)
    xf_i = np.zeros((len(deltas), len(harmonics), nI), complex)
    for i, d in enumerate(deltas):
        J = _lptv_at(J0, CI, tl, float(d))
        psi = np.linalg.solve(J.conj().T, rhs).reshape(K, N)
        psi_e = np.concatenate([psi, np.zeros((K, 1), complex)],
                               axis=1).conj()              # (K, N+1)
        gv = psi_e[:, np.asarray(t.vs_k)]                  # (K, nV)
        gi = (psi_e[:, np.asarray(t.is_em)]
              - psi_e[:, np.asarray(t.is_ep)])             # (K, nI)
        cv = np.fft.ifft(gv, axis=0)                       # (K, nV)
        ci = np.fft.ifft(gi, axis=0)
        for j, m in enumerate(harmonics):
            xf_v[i, j] = cv[m % K]
            xf_i[i, j] = ci[m % K]
    return PXFResult(f0=f0, deltas=deltas, harmonics=harmonics,
                     xf_v=xf_v, xf_i=xf_i, xs_pss=xs_pss)


@dataclasses.dataclass
class PNoiseResult:
    f0: float
    deltas: np.ndarray        # (F,) offset frequencies
    onoise: np.ndarray        # (F,) output noise PSD, V^2/Hz
    by_kind: dict             # device-kind -> (F,) PSD contribution


def pnoise(engine: Engine, params, f0: float, xs_pss, deltas,
           out_eq: int, ref_eq: int = -1) -> PNoiseResult:
    """Periodic (cyclostationary) noise at the output V(out[,ref]) for
    offsets `deltas` from DC — i.e. the time-averaged output noise PSD of
    the periodically driven circuit, including noise FOLDING from every
    sideband.

    Method: one adjoint LPTV solve per offset, J(delta)^H Psi = 1_K (x)
    e_out.  The adjoint envelope Psi_t picks up the transfer from every
    source at every sideband at once; a white source with (possibly
    time-varying) intensity s_j(t) contributes

        (1/K) sum_t |Psi_t . u_j|^2 s_j(t)

    — the operating-point modulation of shot noise (diodes/BJTs at their
    instantaneous current) is therefore handled exactly.  Flicker terms
    are approximated as stationary at the time-averaged intensity with
    the 1/delta envelope (their sideband folding is not modeled)."""
    from .noise import _device_noise_currents
    deltas = np.asarray(deltas, float)
    if np.any(deltas <= 0):
        raise ValueError("pnoise offsets must be > 0 (the flicker 1/delta "
                         "envelope diverges at DC), like the .NOISE sweep")
    J0, CI, K, tl = lptv_operator(engine, params, f0, xs_pss)
    N = engine.N
    xs_pss = jnp.asarray(xs_pss)

    # per-sample (cyclostationary) device noise intensities
    per_t = jax.vmap(
        lambda x: _device_noise_currents(engine, params, x)[1:3])(xs_pss)
    s_white_t = np.asarray(per_t[0], float)             # (K, nS)
    s_flick_t = np.asarray(per_t[1], float)             # (K, nS)
    pairs, _, _, kinds = _device_noise_currents(engine, params, xs_pss[0])

    c = np.zeros(N, complex)
    c[out_eq] = 1.0
    if ref_eq >= 0:
        c[ref_eq] -= 1.0
    rhs = np.tile(c, K)

    onoise = np.zeros(len(deltas))
    by_kind = {k: np.zeros(len(deltas)) for k in set(kinds)}
    for i, d in enumerate(np.asarray(deltas, float)):
        contrib = _adjoint_psd_at(J0, CI, tl, d, rhs, K, N, pairs,
                                  s_white_t, s_flick_t)
        onoise[i] = contrib.sum()
        for j, k in enumerate(kinds):
            by_kind[k][i] += contrib[j]
    return PNoiseResult(f0=f0, deltas=np.asarray(deltas, float),
                        onoise=onoise, by_kind=by_kind)


def make_lptv_blocks_fn(engine: Engine, f0: float, K: int):
    """Traced (J0, CI, tl) builder for the batched LPTV analyses — the
    same math as lptv_operator above but jit/vmap-able (one lane at a
    time): J(delta) = J0 + j*2*pi*delta*CI
    [+ sum_i e^{-j*2*pi*delta*tau_i} B_i] on the K uniform PSS samples.
    Shared by psp.make_psp_batched_fn (forward solves) and
    make_pnoise_batched_fn (adjoint solves).

    tl is None without transmission lines; otherwise (taus (n_tl,),
    Bb (n_tl, KN, KN)) — the REAL delayed-coupling blocks (hb._tl_hb_terms
    band-limited shift operators under the Branin branch rows, exactly
    the host lptv_operator construction but traced so tl_td/tl_z0 ride
    the Monte-Carlo lane axis).  Consumers fold the offset-dependent
    phase into the real 2KN block system per delta (see _tl_real_blocks)."""
    from .hb import _reactive_structure, spectral_diff_matrix
    N = engine.N
    dtype = engine.dtype
    T = 1.0 / f0
    D = jnp.asarray(spectral_diff_matrix(K, T), dtype)        # (K, K)
    ts = jnp.arange(K, dtype=dtype) * (T / K)
    kk = np.arange(K)
    mos_q = bool(getattr(engine, "mos_charge", False))

    def blocks(params, xs_pss):
        rows, cols, svals = engine.dc_static_entries(params)
        A_res = jnp.zeros((N + 1, N + 1), dtype)
        A_res = A_res.at[rows, cols].add(svals)
        tl = None
        if engine.n_tl:
            from .hb import _tl_hb_terms
            cr, cc, cv, S = _tl_hb_terms(engine, params, ts,
                                         (K - 1) // 2, f0)
            # corr patch: cancel the DC-degenerate tl stamps baked into
            # dc_static_entries, stamp the own-port Branin rows
            A_res = A_res.at[cr, cc].add(cv)
            t = engine.topo
            z0 = params["tl_z0"]
            Bb = jnp.zeros((engine.n_tl, K, N, K, N), dtype)
            for i in range(engine.n_tl):
                for row, cols3 in (
                        (int(t.tl_k1[i]),
                         (int(t.tl_ep2[i]), int(t.tl_em2[i]),
                          int(t.tl_k2[i]))),
                        (int(t.tl_k2[i]),
                         (int(t.tl_ep1[i]), int(t.tl_em1[i]),
                          int(t.tl_k1[i])))):
                    for c, coef in zip(cols3, (-1.0, 1.0, None)):
                        if c >= N:        # grounded port node
                            continue
                        cf = (-z0[i] if coef is None
                              else jnp.asarray(coef, dtype))
                        Bb = Bb.at[i, :, row, :, c].add(cf * S[i])
            tl = (params["tl_td"],
                  Bb.reshape(engine.n_tl, K * N, K * N))

        def a_t(x_t, t_t):
            gvals, _ = engine._nl_vals(params, x_t, t_t)
            A = jnp.zeros((N + 1, N + 1), dtype)
            return A.at[engine.nl_rows, engine.nl_cols].add(gvals)

        G_t = A_res[None, :N, :N] + jax.vmap(a_t)(xs_pss, ts)[:, :N, :N]
        C = _reactive_structure(engine, params, base_only=mos_q)
        if mos_q:
            # per-sample exact trans-capacitances (see lptv_operator)
            from .hb import _mos_charge_pieces
            _, Cq = _mos_charge_pieces(engine, params, xs_pss)
            C_t = C[None] + Cq                                # (K, N, N)
            J0 = jnp.einsum("ts,sij->tisj", D, C_t)
            J0 = J0.at[kk, :, kk, :].add(G_t)
            J0 = J0.reshape(K * N, K * N)
            CI = jnp.zeros((K, N, K, N), dtype).at[
                kk, :, kk, :].set(C_t).reshape(K * N, K * N)
        else:
            J0 = D[:, None, :, None] * C[None, :, None, :]
            J0 = J0.at[kk, :, kk, :].add(G_t)
            J0 = J0.reshape(K * N, K * N)
            CI = jnp.kron(jnp.eye(K, dtype=dtype), C)         # (KN, KN)
        return J0, CI, tl

    return blocks


@dataclasses.dataclass
class PNoiseBatchResult:
    f0: float
    deltas: np.ndarray        # (F,)
    onoise: np.ndarray        # (B, F) output noise PSD per lane, V^2/Hz
    by_kind: dict             # device-kind -> (B, F) PSD contribution
    converged: Any = None     # (B,) bool — the upstream HB lanes; lanes
    #                           False here rode an unconverged steady
    #                           state and their PSDs are untrustworthy


def make_pnoise_batched_fn(engine: Engine, f0: float, K: int,
                           out_eq: int, ref_eq: int, deltas,
                           params_probe):
    """Jittable per-lane pnoise kernel (vmapped over the Monte-Carlo
    lane axis by pnoise_batched).  Same math as the host pnoise above —
    one adjoint LPTV solve per offset — with the complex adjoint solve
    J(d)^H psi = rhs as the equivalent real block system

        [[J0^T, w CI^T], [-w CI^T, J0^T]] [psi_r; psi_i] = [c; 0]

    (w = 2*pi*delta; J^H = J0^T - j*w*CI^T since J0/CI are real), the
    same MXU-shaped trick as psp.make_psp_batched_fn.  Returns the
    per-source PSD contributions (F, nS); the kind breakdown sums on
    the host."""
    from .noise import _device_noise_currents
    N = engine.N
    dtype = engine.dtype
    blocks = make_lptv_blocks_fn(engine, f0, K)
    # generator catalog (topology-static: index pairs + kinds only;
    # params_probe is any one concrete lane)
    pairs, _, _, kinds = _device_noise_currents(
        engine, params_probe, jnp.zeros((N,), dtype))
    p0 = jnp.asarray(np.asarray(pairs)[:, 0])
    p1 = jnp.asarray(np.asarray(pairs)[:, 1])

    c = np.zeros(K * N)
    c[np.arange(K) * N + out_eq] = 1.0
    if ref_eq >= 0:
        c[np.arange(K) * N + ref_eq] -= 1.0
    rhs2 = jnp.asarray(np.concatenate([c, np.zeros(K * N)]), dtype)
    ds = jnp.asarray(np.asarray(deltas, float), dtype)

    def lane(params, xs_pss):
        J0, CI, tl = blocks(params, xs_pss)
        J0t, CIt = J0.T, CI.T
        per = jax.vmap(
            lambda x: _device_noise_currents(engine, params, x)[1:3])(
                xs_pss)
        s_white_t, s_flick_t = per                            # (K, nS)

        def at_delta(d):
            w = 2.0 * jnp.pi * d
            # adjoint J(d)^H = J0^T - jw CI^T [+ sum e^{+j w tau} B^T]
            Mr, Mi = J0t, -w * CIt
            if tl is not None:
                taus, Bb = tl
                th = w * taus
                Bt = jnp.swapaxes(Bb, -1, -2)
                Mr = Mr + jnp.tensordot(jnp.cos(th), Bt, axes=1)
                Mi = Mi + jnp.tensordot(jnp.sin(th), Bt, axes=1)
            A2 = jnp.concatenate([
                jnp.concatenate([Mr, -Mi], axis=1),
                jnp.concatenate([Mi, Mr], axis=1)], axis=0)
            psi = jnp.linalg.solve(A2, rhs2)
            pr = psi[:K * N].reshape(K, N)
            pi = psi[K * N:].reshape(K, N)
            z = jnp.zeros((K, 1), dtype)
            pr_e = jnp.concatenate([pr, z], axis=1)
            pi_e = jnp.concatenate([pi, z], axis=1)
            gr = pr_e[:, p0] - pr_e[:, p1]                    # (K, nS)
            gi = pi_e[:, p0] - pi_e[:, p1]
            s_t = s_white_t + s_flick_t / d
            return jnp.mean((gr * gr + gi * gi) * s_t, axis=0)

        return jax.lax.map(at_delta, ds)                      # (F, nS)

    return lane, kinds


@dataclasses.dataclass
class PACBatchResult:
    f0: float
    deltas: np.ndarray        # (F,)
    harmonics: np.ndarray     # (M,)
    spectrum: np.ndarray      # (B, F, M, N) complex envelope coefficients
    xs_pss: Any               # (B, K, N)
    converged: Any = None     # (B,) bool — upstream HB lane flags


def make_pac_batched_fn(engine: Engine, f0: float, K: int, deltas,
                        adjoint_rhs=None):
    """Jittable per-lane LPTV-solve kernel shared by the batched PAC
    (forward, adjoint_rhs=None: rhs from the lane's AC source specs)
    and batched PXF (adjoint_rhs = the static output selector c: solves
    J(d)^H psi like make_pnoise_batched_fn and returns the full adjoint
    envelope).  Returns lane(params, xs_pss) -> (F, K, N, 2) real/imag
    envelope samples; the FFT finalization stays on the host."""
    N = engine.N
    dtype = engine.dtype
    blocks = make_lptv_blocks_fn(engine, f0, K)
    ds = jnp.asarray(np.asarray(deltas, float), dtype)
    deg = np.pi / 180.0
    adjoint = adjoint_rhs is not None
    if adjoint:
        c = np.asarray(adjoint_rhs, float)
        rhs2_c = jnp.asarray(
            np.concatenate([np.tile(c, K), np.zeros(K * N)]), dtype)

    def lane(params, xs_pss):
        J0, CI, tl = blocks(params, xs_pss)
        if adjoint:
            J0u, CIu = J0.T, CI.T
            rhs2 = rhs2_c
        else:
            J0u, CIu = J0, CI
            # small-signal input vector from the lane's AC specs (pac)
            vph = params["vs_ac_phase"] * deg
            iph = params["is_ac_phase"] * deg
            Ur = jnp.zeros((N + 1,), dtype).at[engine.topo.vs_k].add(
                params["vs_ac_mag"] * jnp.cos(vph))
            Ui = jnp.zeros((N + 1,), dtype).at[engine.topo.vs_k].add(
                params["vs_ac_mag"] * jnp.sin(vph))
            ir = params["is_ac_mag"] * jnp.cos(iph)
            ii = params["is_ac_mag"] * jnp.sin(iph)
            Ur = Ur.at[engine.topo.is_ep].add(-ir).at[
                engine.topo.is_em].add(ir)
            Ui = Ui.at[engine.topo.is_ep].add(-ii).at[
                engine.topo.is_em].add(ii)
            rhs2 = jnp.concatenate([jnp.tile(Ur[:N], K),
                                    jnp.tile(Ui[:N], K)])

        def at_delta(d):
            w = 2.0 * jnp.pi * d
            # forward: J = J0 + jw CI [+ sum e^{-j w tau} B];
            # adjoint: J^H = J0^T - jw CI^T [+ sum e^{+j w tau} B^T] —
            # same real block shape with the signs folded into (s, sgn)
            s = -w if adjoint else w
            Mr, Mi = J0u, s * CIu
            if tl is not None:
                taus, Bb = tl
                th = w * taus
                Bu = jnp.swapaxes(Bb, -1, -2) if adjoint else Bb
                sgn = 1.0 if adjoint else -1.0
                Mr = Mr + jnp.tensordot(jnp.cos(th), Bu, axes=1)
                Mi = Mi + sgn * jnp.tensordot(jnp.sin(th), Bu, axes=1)
            A2 = jnp.concatenate([
                jnp.concatenate([Mr, -Mi], axis=1),
                jnp.concatenate([Mi, Mr], axis=1)], axis=0)
            Y = jnp.linalg.solve(A2, rhs2)
            return jnp.stack([Y[:K * N].reshape(K, N),
                              Y[K * N:].reshape(K, N)], axis=-1)

        return jax.lax.map(at_delta, ds)      # (F, K, N, 2)

    return lane


def _run_lptv_lane_batched(engine, lane, bparams, xs_pss_b,
                           env_var: str):
    """vmap + precision pin + lane blocking shared by the batched
    PAC/PXF drivers (the pnoise/PSP pattern)."""
    import os

    def batched(bp, xs_b):
        with jax.default_matmul_precision("highest"):
            return jax.vmap(lane)(bp, xs_b)

    fn = jax.jit(batched)
    B_all = int(xs_pss_b.shape[0])
    blk = min(int(os.environ.get(env_var, 128)), B_all)
    if B_all % blk:
        blk = B_all
    chunks = []
    for lo in range(0, B_all, blk):
        bp_c = jax.tree.map(lambda x: x[lo:lo + blk], bparams)
        chunks.append(np.asarray(fn(bp_c, xs_pss_b[lo:lo + blk])))
    out = np.concatenate(chunks, axis=0)      # (B, F, K, N, 2)
    return out[..., 0] + 1j * out[..., 1]


def pac_batched(engine: Engine, bparams, f0: float, xs_pss_b, deltas,
                n_sidebands: Optional[int] = None) -> PACBatchResult:
    """Monte-Carlo periodic AC: B lanes' conversion gains around their
    OWN periodic steady states, every (lane, offset) LPTV solve as one
    batched real-2KN program (the pnoise/PSP pattern, forward
    system)."""
    xs_pss_b = jnp.asarray(xs_pss_b)
    K = int(xs_pss_b.shape[1])
    H = (K - 1) // 2
    lane = make_pac_batched_fn(engine, f0, K, deltas)
    Yc = _run_lptv_lane_batched(engine, lane, bparams, xs_pss_b,
                                "CSIM_PAC_LANE_BLOCK")
    M = int(n_sidebands) if n_sidebands is not None else H
    M = min(M, H)
    harmonics = np.arange(-M, M + 1)
    coeffs = np.fft.fft(Yc, axis=2) / K       # (B, F, K, N)
    spec = np.stack([coeffs[:, :, m % K] for m in harmonics], axis=2)
    return PACBatchResult(f0=f0, deltas=np.asarray(deltas, float),
                          harmonics=harmonics, spectrum=spec,
                          xs_pss=xs_pss_b)


@dataclasses.dataclass
class PXFBatchResult:
    f0: float
    deltas: np.ndarray        # (F,)
    harmonics: np.ndarray     # (M,)
    xf_v: np.ndarray          # (B, F, M, nV)
    xf_i: np.ndarray          # (B, F, M, nI)
    v_names: Any = None
    i_names: Any = None
    converged: Any = None     # (B,) bool — upstream HB lane flags


def pxf_batched(engine: Engine, bparams, f0: float, xs_pss_b, deltas,
                out_eq: int, ref_eq: int = -1,
                n_sidebands: Optional[int] = None) -> PXFBatchResult:
    """Monte-Carlo periodic transfer functions: every lane's full
    source x sideband -> output table from batched adjoint LPTV solves
    (same real-2KN block systems as pnoise_batched; the ifft readout
    stays on the host — see pxf above for the math)."""
    N = engine.N
    t = engine.topo
    xs_pss_b = jnp.asarray(xs_pss_b)
    K = int(xs_pss_b.shape[1])
    H = (K - 1) // 2
    c = np.zeros(N)
    c[out_eq] = 1.0
    if ref_eq >= 0:
        c[ref_eq] -= 1.0
    lane = make_pac_batched_fn(engine, f0, K, deltas, adjoint_rhs=c)
    Psi = _run_lptv_lane_batched(engine, lane, bparams, xs_pss_b,
                                 "CSIM_PXF_LANE_BLOCK")  # (B,F,K,N)
    M = int(n_sidebands) if n_sidebands is not None else H
    M = min(M, H)
    harmonics = np.arange(-M, M + 1)
    psi_e = np.concatenate(
        [Psi, np.zeros(Psi.shape[:3] + (1,), complex)], axis=-1).conj()
    gv = psi_e[..., np.asarray(t.vs_k)]                   # (B, F, K, nV)
    gi = (psi_e[..., np.asarray(t.is_em)]
          - psi_e[..., np.asarray(t.is_ep)])
    cv = np.fft.ifft(gv, axis=2)
    ci = np.fft.ifft(gi, axis=2)
    xf_v = np.stack([cv[:, :, m % K] for m in harmonics], axis=2)
    xf_i = np.stack([ci[:, :, m % K] for m in harmonics], axis=2)
    return PXFBatchResult(f0=f0, deltas=np.asarray(deltas, float),
                          harmonics=harmonics, xf_v=xf_v, xf_i=xf_i)


def pnoise_batched(engine: Engine, bparams, f0: float, xs_pss_b, deltas,
                   out_eq: int, ref_eq: int = -1) -> PNoiseBatchResult:
    """Monte-Carlo periodic noise: B lanes of perturbed params (leading
    lane axis) each around their OWN periodic steady state xs_pss_b
    (B, K, N) — e.g. HBBatchResult.xs from harmonic_balance_batched.
    Every (lane, offset) adjoint LPTV solve runs as one batched TPU
    program; only the (B, F, nS) contribution table comes back for the
    kind breakdown."""
    import os
    deltas = np.asarray(deltas, float)
    if np.any(deltas <= 0):
        raise ValueError("pnoise offsets must be > 0 (the flicker "
                         "1/delta envelope diverges at DC)")
    xs_pss_b = jnp.asarray(xs_pss_b)
    K = int(xs_pss_b.shape[1])
    probe = jax.tree.map(lambda x: x[0], bparams)
    lane, kinds = make_pnoise_batched_fn(engine, f0, K, out_eq, ref_eq,
                                         deltas, probe)

    def batched(bp, xs_b):
        # full-f32 matmuls: the MXU's default bf16 passes would corrupt
        # the 2KN real-block adjoint solves (see hb.make_hb_batched_fn)
        with jax.default_matmul_precision("highest"):
            return jax.vmap(lane)(bp, xs_b)

    fn = jax.jit(batched)
    B_all = int(xs_pss_b.shape[0])
    blk = min(int(os.environ.get("CSIM_PNOISE_LANE_BLOCK", 128)), B_all)
    if B_all % blk:
        blk = B_all       # ragged batch: single dispatch
    chunks = []
    for lo in range(0, B_all, blk):
        bp_c = jax.tree.map(lambda x: x[lo:lo + blk], bparams)
        chunks.append(np.asarray(fn(bp_c, xs_pss_b[lo:lo + blk])))
    contrib = np.concatenate(chunks, axis=0)   # (B, F, nS)
    onoise = contrib.sum(axis=-1)
    by_kind = {k: np.zeros_like(onoise) for k in set(kinds)}
    for j, k in enumerate(kinds):
        by_kind[k] += contrib[:, :, j]
    return PNoiseBatchResult(f0=f0, deltas=deltas, onoise=onoise,
                             by_kind=by_kind)


def mixer_noise_figure_batched(engine: Engine, bparams, f0: float,
                               xs_pss_b, delta: float, out_eq: int,
                               src_idx: int, sidebands=(1,),
                               ref_eq: int = -1):
    """Monte-Carlo conversion noise figure: every lane's folded pnoise
    total and reference-generator sideband share from ONE batched
    adjoint LPTV solve at IF=delta (the mixer_noise_figure math, lane
    axis added; see that docstring for the Parseval split).  Returns
    (nf_db (B,), onoise (B,), sig (B,))."""
    from .noise import _device_noise_currents
    N = engine.N
    xs_pss_b = jnp.asarray(xs_pss_b)
    K = int(xs_pss_b.shape[1])
    probe = jax.tree.map(lambda x: x[0], bparams)
    pairs, _, _, _ = _device_noise_currents(
        engine, probe, jnp.zeros((N,), engine.dtype))
    if not (0 <= src_idx < len(pairs)):
        raise ValueError(f"src_idx {src_idx} outside the generator "
                         f"catalog (nS={len(pairs)})")
    c = np.zeros(N)
    c[out_eq] = 1.0
    if ref_eq >= 0:
        c[ref_eq] -= 1.0
    lane = make_pac_batched_fn(engine, f0, K, [float(delta)],
                               adjoint_rhs=c)
    Psi = _run_lptv_lane_batched(engine, lane, bparams, xs_pss_b,
                                 "CSIM_PNOISE_LANE_BLOCK")[:, 0]
    # NOTE: make_pac_batched_fn returns the adjoint solve of J^H psi
    # WITHOUT conjugation baked in; |g| quantities below are conj-safe
    psi_e = np.concatenate(
        [Psi, np.zeros(Psi.shape[:2] + (1,), complex)], axis=-1)
    p0 = np.asarray(pairs)[:, 0]
    p1 = np.asarray(pairs)[:, 1]
    g = psi_e[..., p0] - psi_e[..., p1]                  # (B, K, nS)

    def lane_s(p, X):
        per = jax.vmap(
            lambda x: _device_noise_currents(engine, p, x)[1:3])(X)
        return per

    S_w, S_f = jax.jit(jax.vmap(lane_s))(bparams, xs_pss_b)
    s_t = np.asarray(S_w, float) + np.asarray(S_f, float) / float(delta)
    onoise = np.mean(np.abs(g) ** 2 * s_t, axis=1).sum(axis=-1)  # (B,)
    coeff = np.fft.fft(g[:, :, src_idx], axis=1) / K     # (B, K)
    s_src = s_t[:, :, src_idx].mean(axis=1)              # (B,)
    sig = sum(np.abs(coeff[:, m % K]) ** 2 for m in sidebands) * s_src
    bad = sig <= 0.0
    if np.any(bad):
        # a degenerate Monte-Carlo lane (reference generator dead
        # through the requested sidebands) must not abort the whole
        # batch — NaN-mask it and keep the other lanes' results
        import warnings
        warnings.warn(
            f"{int(bad.sum())}/{bad.size} lane(s): the reference "
            f"generator contributes nothing through the requested "
            f"sideband(s); their NF is NaN", stacklevel=2)
        sig = np.where(bad, np.nan, sig)
    with np.errstate(invalid="ignore", divide="ignore"):
        nf_db = 10.0 * np.log10(onoise / sig)
    return nf_db, onoise, sig


def mixer_noise_figure(engine: Engine, params, f0: float, xs_pss,
                       delta: float, out_eq: int, src_idx: int,
                       sidebands=(1,), ref_eq: int = -1):
    """Conversion noise figure of a periodically driven circuit at
    IF = delta: F = total output noise PSD (pnoise, ALL sidebands folded)
    over the part contributed by generator column `src_idx` (the
    reference source, e.g. a source resistor's 4kT/R) through the signal
    sideband(s) only — SSB with sidebands=(1,) (input at f0+delta), DSB
    with sidebands=(1, -1).  Sideband indices follow pac's harmonics
    convention.

    Per-sideband decomposition: the adjoint envelope gain g_j(t) =
    Psi_t·u_j splits by Parseval as mean|g|² = Σ_m |c_m|² with c_m its
    m-th Fourier coefficient, so the source's sideband-m contribution is
    |c_m|²·s_j.  Returns (nf_db, onoise_total, onoise_src_signal)."""
    from .noise import _device_noise_currents
    J0, CI, K, tl = lptv_operator(engine, params, f0, xs_pss)
    N = engine.N
    xs_pss = jnp.asarray(xs_pss)

    per_t = jax.vmap(
        lambda x: _device_noise_currents(engine, params, x)[1:3])(xs_pss)
    s_white_t = np.asarray(per_t[0], float)             # (K, nS)
    s_flick_t = np.asarray(per_t[1], float)
    pairs, _, _, _ = _device_noise_currents(engine, params, xs_pss[0])
    if not (0 <= src_idx < len(pairs)):
        raise ValueError(f"src_idx {src_idx} outside the generator "
                         f"catalog (nS={len(pairs)})")

    c = np.zeros(N, complex)
    c[out_eq] = 1.0
    if ref_eq >= 0:
        c[ref_eq] -= 1.0
    rhs = np.tile(c, K)
    J = _lptv_at(J0, CI, tl, float(delta))
    psi = np.linalg.solve(J.conj().T, rhs).reshape(K, N)
    psi_e = np.concatenate([psi, np.zeros((K, 1), complex)], axis=1)
    g = psi_e[:, pairs[:, 0]] - psi_e[:, pairs[:, 1]]   # (K, nS)
    s_t = s_white_t + s_flick_t / float(delta)
    onoise = float(np.mean(np.abs(g) ** 2 * s_t, axis=0).sum())

    # sideband-resolved contribution of the reference generator (its
    # intensity is cycle-averaged — exact for the stationary 4kT/R case)
    coeff = np.fft.fft(g[:, src_idx]) / K
    s_src = float(s_t[:, src_idx].mean())
    sig = sum(abs(coeff[m % K]) ** 2 for m in sidebands) * s_src
    if sig <= 0.0:
        raise ValueError("the reference generator contributes nothing "
                         "through the requested sideband(s)")
    return 10.0 * np.log10(onoise / sig), onoise, sig
