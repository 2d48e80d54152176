"""Periodic (hot) S-parameters — small-signal scattering of a
periodically driven circuit, including frequency translation between
sidebands (extension; no reference equivalent — the reference's empty
steady-state placeholder, see SURVEY.md 2.13, could never have reached
this.  This is the classic "hot S22" / conversion-matrix analysis of RF
simulators).

Math: around the periodic steady state x*(t) at f0, the circuit seen
from its ports is a linear periodically-time-varying (LPTV) N-port.  A
small incident wave at port j in sideband m_j (physical frequency
m_j*f0 + delta) scatters into reflected waves at EVERY port i and EVERY
sideband m_i (frequency m_i*f0 + delta) — a mixer's port behaves like a
multi-frequency port.  Treating each (port, sideband) pair as one
terminal of an extended multiport, the conversion impedance matrix is

    Z[(i,mi),(j,mj)](delta) = m_i-th envelope Fourier coefficient of the
                              port-i voltage when a unit current
                              e^{j 2 pi (m_j f0 + delta) t} is injected
                              into port j

— one LPTV solve (pac.lptv_operator / _lptv_at, shared with PAC/PNOISE,
so transmission-line delays are exact) per (j, m_j) per offset.  The
scattering matrix w.r.t. the per-port reference impedances is then the
standard bilinear map on the extended port space

    S = F (Z - Z0) (Z + Z0)^{-1} F^{-1},
    Z0 = diag(z0_i per sideband),  F = diag(1/(2 sqrt(z0_i)))

i.e. every (port, sideband) terminal is terminated in its port's z0 at
its own frequency — the textbook conversion-scattering definition.

Sanity anchors (tests/test_psp.py): with an LTI circuit the m=0 block
reduces to the cold `s_parameters` at delta and the m=+1 block to the
cold values at f0+delta, with zero conversion; an ideal-multiplier
up-converter recovers |Z_conv| = R1*R2*A/2 closed-form.

Two paths: periodic_s_parameters solves per offset on the host (KN is
a few hundred for mixer-class circuits; T-line delay blocks exact), and
periodic_s_parameters_batched runs B Monte-Carlo lanes' LPTV solves as
ONE batched TPU program (real 2KN block systems on the MXU; no T-lines)
— the same batch-axis treatment harmonic_balance_batched gives HB.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.assemble import Engine
from .pac import lptv_operator, _lptv_at


@dataclasses.dataclass
class PSPResult:
    f0: float
    deltas: np.ndarray        # (F,) offset frequencies
    harmonics: np.ndarray     # (M,) sideband indices (shared in/out)
    s: np.ndarray             # (F, P, P) complex, P = n_ports * len(harmonics)
    z: np.ndarray             # (F, P, P) conversion impedance matrix
    z0: np.ndarray            # (n_ports,) reference impedances

    def index(self, port: int, m: int) -> int:
        """Flat extended-port index of (port, sideband m)."""
        idx = np.nonzero(self.harmonics == m)[0]
        if len(idx) == 0:
            raise KeyError(f"sideband {m} not in {self.harmonics}")
        return int(idx[0]) * len(self.z0) + port

    def s_at(self, port_out: int, m_out: int, port_in: int, m_in: int):
        """S from (port_in, sideband m_in) to (port_out, m_out): (F,)
        complex — e.g. s_at(1, 1, 0, 0) is the delta -> f0+delta
        up-conversion gain from port 0 into port 1."""
        return self.s[:, self.index(port_out, m_out),
                      self.index(port_in, m_in)]


def periodic_s_parameters(engine: Engine, params, f0: float, xs_pss,
                          port_eqs: Sequence[Tuple[int, int]],
                          z0s: Sequence[float], deltas,
                          n_sidebands: int = 1) -> PSPResult:
    """port_eqs: (eq_p, eq_m) per port, dump-slot convention (ground =
    engine.N) exactly like sparams.s_parameters; z0s: per-port reference
    impedance; deltas: offset frequencies (0 < delta < f0 recommended so
    sideband frequencies stay distinct); n_sidebands: sidebands -M..M
    kept on both the input and output side.

    Like the cold path, the netlist must NOT contain the port
    terminations — matched loading (z0 at every sideband) is implicit in
    the scattering definition."""
    N = engine.N
    n = len(port_eqs)
    M = int(n_sidebands)
    harmonics = np.arange(-M, M + 1)
    nh = len(harmonics)
    P = n * nh
    deltas = np.asarray(deltas, float)
    z0 = np.asarray(z0s, float)

    J0, CI, K, tl = lptv_operator(engine, params, f0, xs_pss)
    H = (K - 1) // 2
    if M > H:
        raise ValueError(f"n_sidebands {M} exceeds the PSS harmonic "
                         f"truncation H={H}; raise n_harm")

    # unit port-current incidence vectors (N,) per port
    u = np.zeros((n, N))
    for j, (p, m) in enumerate(port_eqs):
        if p < N:
            u[j, p] += 1.0
        if m < N:
            u[j, m] -= 1.0

    # extended reference matrices: (port, sideband) terminal j*n+... —
    # flat order is sideband-major (index = mi_idx * n + port) to match
    # PSPResult.index
    z0_ext = np.tile(z0, nh)
    Z0 = np.diag(z0_ext.astype(complex))
    F = np.diag(1.0 / (2.0 * np.sqrt(z0_ext)))
    Finv = np.diag(2.0 * np.sqrt(z0_ext))

    # envelope phase factors of a sideband-m injection on the K samples:
    # i(t) = u_j e^{j 2 pi m f0 t} => sample k carries e^{+2 pi i m k/K}
    kk = np.arange(K)
    phase = np.exp(2j * np.pi * np.outer(harmonics, kk) / K)   # (nh, K)

    S = np.zeros((len(deltas), P, P), complex)
    Z = np.zeros((len(deltas), P, P), complex)
    for idel, d in enumerate(deltas):
        J = _lptv_at(J0, CI, tl, float(d))
        # all (port, sideband) injections as one multi-RHS solve
        rhs = np.zeros((K * N, P), complex)
        for jm, m in enumerate(harmonics):
            for j in range(n):
                col = jm * n + j
                rhs[:, col] = (phase[jm][:, None] * u[j][None, :]).ravel()
        Y = np.linalg.solve(J, rhs)                    # (K*N, P)
        Yk = Y.reshape(K, N, P)
        coeff = np.fft.fft(Yk, axis=0) / K             # e^{+j m w0 t} basis
        # port-i voltage coefficient at sideband mi for every injection
        Vp = np.zeros((P, P), complex)                 # (out, in)
        for im, m in enumerate(harmonics):
            cm = coeff[m % K]                          # (N, P)
            cme = np.concatenate([cm, np.zeros((1, P), complex)], axis=0)
            for i, (p, mm) in enumerate(port_eqs):
                Vp[im * n + i] = cme[p] - cme[mm]
        Z[idel] = Vp
        S[idel] = F @ (Vp - Z0) @ np.linalg.inv(Vp + Z0) @ Finv
    return PSPResult(f0=f0, deltas=deltas, harmonics=harmonics,
                     s=S, z=Z, z0=z0)


# ---------------------------------------------------------------------
# Batched (Monte-Carlo) hot S-parameters — the LPTV solves on the TPU
# ---------------------------------------------------------------------

@dataclasses.dataclass
class PSPBatchResult:
    f0: float
    deltas: np.ndarray        # (F,)
    harmonics: np.ndarray     # (M,)
    s: np.ndarray             # (B, F, P, P) complex
    z: np.ndarray             # (B, F, P, P) complex
    z0: np.ndarray            # (n_ports,)

    def index(self, port: int, m: int) -> int:
        idx = np.nonzero(self.harmonics == m)[0]
        if len(idx) == 0:
            raise KeyError(f"sideband {m} not in {self.harmonics}")
        return int(idx[0]) * len(self.z0) + port

    def s_at(self, port_out: int, m_out: int, port_in: int, m_in: int):
        """(B, F) complex S from (port_in, m_in) to (port_out, m_out)."""
        return self.s[:, :, self.index(port_out, m_out),
                      self.index(port_in, m_in)]


def make_psp_batched_fn(engine: Engine, f0: float, K: int,
                        port_eqs, harmonics, deltas):
    """Jittable per-lane hot-S-param kernel factory (vmapped over the
    Monte-Carlo lane axis by periodic_s_parameters_batched).

    The host path (periodic_s_parameters above) assembles the complex
    LPTV operator J(δ) = J0 + j·2πδ·kron(I,C) per offset and LU-solves
    it with numpy.  Here the SAME math runs traced, one lane at a time
    under vmap, with the complex solve as the equivalent real block
    system  [[J0, −wCI], [wCI, J0]] [Yr; Yi] = [Ur; Ui]  (w = 2πδ) —
    batched dense real linear algebra, exactly the MXU's shape (same
    trick as analysis/ac.solve_ac_real).  Only the port rows of the
    envelope come back to the host (K·n·P complex numbers per offset);
    the FFT/bilinear-map finalization there is O(P³) on tiny matrices.

    Transmission lines ride the same real 2KN block system: the traced
    delay blocks from pac.make_lptv_blocks_fn enter as
    cos(wτ)·B / −sin(wτ)·B in the real/imag parts per delta (r5 —
    previously a NotImplementedError routed T-line decks to the host).
    """
    N = engine.N
    n = len(port_eqs)
    harmonics = np.asarray(harmonics, int)
    nh = len(harmonics)
    P = n * nh
    dtype = engine.dtype
    from .pac import make_lptv_blocks_fn
    blocks = make_lptv_blocks_fn(engine, f0, K)
    kk = np.arange(K)

    # unit port-current incidence (n, N) and port read-out projection
    u = np.zeros((n, N))
    for j, (p, m) in enumerate(port_eqs):
        if p < N:
            u[j, p] += 1.0
        if m < N:
            u[j, m] -= 1.0
    Pm = jnp.asarray(u, dtype)                                # (n, N)

    # injection envelopes: rhs[(k,n), (jm*n+j)] = e^{+2πi m k/K} u_j[n]
    phase = np.exp(2j * np.pi * np.outer(harmonics, kk) / K)  # (nh, K)
    rhs = np.zeros((K * N, P), complex)
    for jm in range(nh):
        for j in range(n):
            rhs[:, jm * n + j] = (phase[jm][:, None] * u[j][None, :]).ravel()
    Ur = jnp.asarray(rhs.real, dtype)
    Ui = jnp.asarray(rhs.imag, dtype)
    omegas = jnp.asarray(2.0 * np.pi * np.asarray(deltas, float), dtype)

    def lane(params, xs_pss):
        # conduction/reactive LPTV blocks, shared with the batched
        # pnoise path (pac.make_lptv_blocks_fn)
        J0, CI, tl = blocks(params, xs_pss)

        def at_delta(w):
            # forward J = J0 + jw CI [+ sum e^{-j w tau} B]
            Mr, Mi = J0, w * CI
            if tl is not None:
                taus, Bb = tl
                th = w * taus
                Mr = Mr + jnp.tensordot(jnp.cos(th), Bb, axes=1)
                Mi = Mi - jnp.tensordot(jnp.sin(th), Bb, axes=1)
            A2 = jnp.concatenate([
                jnp.concatenate([Mr, -Mi], axis=1),
                jnp.concatenate([Mi, Mr], axis=1)], axis=0)
            B2 = jnp.concatenate([Ur, Ui], axis=0)            # (2KN, P)
            Y = jnp.linalg.solve(A2, B2)
            Yr = Y[:K * N].reshape(K, N, P)
            Yi = Y[K * N:].reshape(K, N, P)
            # port branch voltages (K, n, P) via the projection matmul
            vpr = jnp.einsum("in,knp->kip", Pm, Yr)
            vpi = jnp.einsum("in,knp->kip", Pm, Yi)
            return jnp.stack([vpr, vpi], axis=-1)

        return jax.lax.map(at_delta, omegas)   # (F, K, n, P, 2)

    return lane


def periodic_s_parameters_batched(engine: Engine, bparams, f0: float,
                                  xs_pss_b,
                                  port_eqs: Sequence[Tuple[int, int]],
                                  z0s: Sequence[float], deltas,
                                  n_sidebands: int = 1) -> PSPBatchResult:
    """Monte-Carlo hot S-parameters: B lanes of perturbed params (leading
    lane axis, perturb_params) each linearized around their OWN periodic
    steady state xs_pss_b (B, K, N) — e.g. HBBatchResult.xs from
    harmonic_balance_batched.  Every (lane, offset) LPTV solve runs as
    one batched TPU program; the O(P³) scattering finalization stays on
    the host.  Same conventions as periodic_s_parameters."""
    N = engine.N
    n = len(port_eqs)
    M = int(n_sidebands)
    harmonics = np.arange(-M, M + 1)
    nh = len(harmonics)
    P = n * nh
    deltas = np.asarray(deltas, float)
    xs_pss_b = jnp.asarray(xs_pss_b)
    K = int(xs_pss_b.shape[1])
    H = (K - 1) // 2
    if M > H:
        raise ValueError(f"n_sidebands {M} exceeds the PSS harmonic "
                         f"truncation H={H}; raise n_harm")
    z0 = np.asarray(z0s, float)

    lane = make_psp_batched_fn(engine, f0, K, port_eqs, harmonics, deltas)

    def batched(bp, xs_b):
        # full-f32 matmuls: the MXU's default bf16 passes would corrupt
        # the 2KN real-block LPTV solves (see hb.make_hb_batched_fn)
        with jax.default_matmul_precision("highest"):
            return jax.vmap(lane)(bp, xs_b)

    fn = jax.jit(batched)
    # lane blocking: XLA's batched triangular solve blows the 16 MB
    # scoped-VMEM limit on v5e (measured: 18.95M requested at 256 lanes
    # x 88x88) — dispatch the one compiled block program over lane
    # chunks instead
    B_all = int(xs_pss_b.shape[0])
    blk = min(int(os.environ.get("CSIM_PSP_LANE_BLOCK", 128)), B_all)
    if B_all % blk:
        blk = B_all       # ragged batch: single dispatch
    chunks = []
    for lo in range(0, B_all, blk):
        bp_c = jax.tree.map(lambda x: x[lo:lo + blk], bparams)
        chunks.append(np.asarray(fn(bp_c, xs_pss_b[lo:lo + blk])))
    vp = np.concatenate(chunks, axis=0)
    vp = vp[..., 0] + 1j * vp[..., 1]          # (B, F, K, n, P)
    B = vp.shape[0]

    z0_ext = np.tile(z0, nh)
    Z0 = np.diag(z0_ext.astype(complex))
    F = np.diag(1.0 / (2.0 * np.sqrt(z0_ext)))
    Finv = np.diag(2.0 * np.sqrt(z0_ext))

    coeff = np.fft.fft(vp, axis=2) / K         # (B, F, K, n, P)
    S = np.zeros((B, len(deltas), P, P), complex)
    Z = np.zeros((B, len(deltas), P, P), complex)
    for im, m in enumerate(harmonics):
        Z[:, :, im * n:(im + 1) * n, :] = coeff[:, :, m % K]
    for b in range(B):
        for idel in range(len(deltas)):
            Vp = Z[b, idel]
            S[b, idel] = F @ (Vp - Z0) @ np.linalg.inv(Vp + Z0) @ Finv
    return PSPBatchResult(f0=f0, deltas=deltas, harmonics=harmonics,
                          s=S, z=Z, z0=z0)
