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

Cold path like sparams.py: the per-offset complex solves run on the
host (KN is a few hundred for mixer-class circuits).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import numpy as np

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
