"""Envelope noise — time-resolved cyclostationary noise along a
modulated-carrier (envelope) trajectory (extension; no reference
equivalent — the reference's steady-state module is an empty
placeholder, see /root/reference/src/sstateanalysis.cpp and
SURVEY.md 2.13).

At each selected envelope time t1 the circuit is treated as
instantaneously periodic at the envelope state X(t1) — the adiabatic
(quasi-stationary) approximation, valid when the envelope varies
slowly compared to the noise correlation time ~1/delta, i.e.
dt_env * delta >> 1 is NOT required but |dX/dt1| / |X| << delta is.
The output noise PSD at offset delta then comes from the same adjoint
LPTV solve pnoise uses (analysis/pac.py), built around X(t1) instead
of the periodic steady state:

    J(t1, delta)^H Psi = 1_K (x) e_out,
    S_out(t1, delta) = (1/K) sum_k |Psi_k . u_j|^2 s_j(x_k(t1))

with the device noise intensities s_j evaluated at the instantaneous
envelope samples — shot/channel noise therefore tracks the modulation
(a pulsed bias turns a diode's shot noise on and off along t1, with
the full sideband folding of the carrier at every t1).

Limits inherited from pnoise: flicker terms are stationary at the
instantaneous averaged intensity with the 1/delta envelope (no flicker
sideband folding); offsets must be > 0.

Validation (tests/test_envnoise.py): an unmodulated carrier reproduces
pnoise at the PSS for every t1; an LTI deck reproduces the stationary
.NOISE PSD (an LPTV operator of a linear circuit is LTI — no folding);
a bias-switched MOS's channel noise follows the envelope between its
two frozen-bias pnoise levels.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.assemble import Engine
from .envelope import EnvelopeResult


@dataclasses.dataclass
class EnvelopeNoiseResult:
    f0: float
    t1: np.ndarray            # (T1s,) envelope times analysed
    deltas: np.ndarray        # (F,) offset frequencies
    onoise: np.ndarray        # (T1s, F) output noise PSD, V^2/Hz
    by_kind: dict             # device-kind -> (T1s, F) PSD contribution


def envelope_noise(engine: Engine, params, env: EnvelopeResult,
                   deltas, out_eq: int, ref_eq: int = -1,
                   t1_idx=None) -> EnvelopeNoiseResult:
    """Time-resolved output noise PSD at V(out[,ref]) along the envelope
    trajectory `env` (analysis/envelope.envelope_transient).  `deltas`
    are offsets from the carrier grid (like pnoise); `t1_idx` selects
    envelope steps to analyse (default: all of them).  One adjoint
    (K*N)^2 complex solve per (t1, delta) on the host — trim t1_idx for
    long envelopes."""
    from .pac import lptv_operator, _adjoint_psd_at
    from .noise import _device_noise_currents
    deltas = np.asarray(deltas, float)
    if deltas.ndim == 0:
        deltas = deltas[None]
    if np.any(deltas <= 0):
        raise ValueError("envelope_noise offsets must be > 0 (the "
                         "flicker 1/delta envelope diverges at DC), "
                         "like pnoise")
    xs = np.asarray(env.xs)                     # (T1, K, N)
    idx = (np.arange(xs.shape[0]) if t1_idx is None
           else np.atleast_1d(np.asarray(t1_idx, int)))
    N = engine.N
    K = xs.shape[1]
    c = np.zeros(N, complex)
    c[out_eq] = 1.0
    if ref_eq >= 0:
        c[ref_eq] -= 1.0
    rhs = np.tile(c, K)

    per_t = jax.jit(jax.vmap(
        lambda x: _device_noise_currents(engine, params, x)[1:3]))
    pairs, _, _, kinds = _device_noise_currents(
        engine, params, jnp.asarray(xs[idx[0]][0]))
    pairs = np.asarray(pairs)

    onoise = np.zeros((len(idx), len(deltas)))
    by_kind = {k: np.zeros((len(idx), len(deltas))) for k in set(kinds)}
    for a, n in enumerate(idx):
        J0, CI, _, tl = lptv_operator(engine, params, env.f0, xs[n])
        sw, sf = per_t(jnp.asarray(xs[n]))
        s_white_t = np.asarray(sw, float)       # (K, nS)
        s_flick_t = np.asarray(sf, float)
        for i, d in enumerate(deltas):
            contrib = _adjoint_psd_at(J0, CI, tl, d, rhs, K, N, pairs,
                                      s_white_t, s_flick_t)
            onoise[a, i] = contrib.sum()
            for j, k in enumerate(kinds):
                by_kind[k][a, i] += contrib[j]
    return EnvelopeNoiseResult(
        f0=env.f0, t1=np.asarray(env.t1)[idx], deltas=deltas,
        onoise=onoise, by_kind=by_kind)
