"""Vectorized waveform evaluators vs the scalar reference twins
(sim.hpp:75-162)."""

import numpy as np
import jax.numpy as jnp
import pytest

from circuitsimulator_tpu.netlist.circuit import (
    Waveform, SourceSpec, eval_waveform as eval_scalar,
    WAVE_NONE, WAVE_PULSE, WAVE_SIN, WAVE_PWL,
)
from circuitsimulator_tpu.models import sources as S


def pack(waves, dtype=jnp.float64):
    n = len(waves)
    kind = jnp.asarray([w.kind for w in waves])
    pulse = jnp.asarray([[w.v1, w.v2, w.ptd, w.tr, w.tf, w.ton, w.per]
                         for w in waves], dtype)
    sin = jnp.asarray([[w.v0, w.va, w.freq, w.std, w.phi] for w in waves], dtype)
    pmax = max((len(w.pwl_t) for w in waves), default=1) or 1
    pt = np.zeros((n, pmax)); pv = np.zeros((n, pmax)); pn = np.zeros(n, np.int32)
    for i, w in enumerate(waves):
        m = len(w.pwl_t)
        pn[i] = m
        pt[i, :m] = w.pwl_t
        pv[i, :m] = w.pwl_v
    return kind, pulse, sin, jnp.asarray(pt, dtype), jnp.asarray(pv, dtype), jnp.asarray(pn)


WAVES = [
    Waveform(kind=WAVE_NONE),
    Waveform(kind=WAVE_SIN, v0=1.0, va=0.6, freq=900e6, std=0.0),
    Waveform(kind=WAVE_SIN, v0=1.0, va=0.6, freq=900e6, std=180.0),  # huge delay
    Waveform(kind=WAVE_SIN, v0=0.5, va=2.0, freq=1e6, std=1e-7, phi=0.3),
    Waveform(kind=WAVE_PULSE, v1=0.0, v2=3.3, ptd=1e-9, tr=1e-9, tf=2e-9, ton=5e-9, per=0.0),
    Waveform(kind=WAVE_PULSE, v1=-1.0, v2=1.0, ptd=2e-9, tr=1e-9, tf=1e-9, ton=3e-9, per=10e-9),
    Waveform(kind=WAVE_PULSE, v1=0.0, v2=1.0, ptd=0.0, tr=0.0, tf=0.0, ton=1e-9, per=4e-9),
    Waveform(kind=WAVE_PWL, pwl_t=[0.0, 1e-9, 3e-9], pwl_v=[0.0, 1.0, -1.0]),
    Waveform(kind=WAVE_PWL, pwl_t=[1e-9], pwl_v=[2.0]),
    Waveform(kind=WAVE_PWL, pwl_t=[], pwl_v=[]),
]


@pytest.mark.parametrize("t", [0.0, 0.3e-9, 0.9e-9, 1.0e-9, 1.5e-9, 2.5e-9,
                               4e-9, 6e-9, 7.5e-9, 9e-9, 11e-9, 25e-9, 1e-6])
def test_vector_matches_scalar(t):
    packed = pack(WAVES)
    out = np.asarray(S.eval_waveform(*packed, t))
    ref = np.array([eval_scalar(w, t) for w in WAVES])
    np.testing.assert_allclose(out, ref, rtol=1e-14, atol=1e-14)


def test_eval_dc_sin_offset_folded():
    spec = SourceSpec(dc=0.5, wave=WAVES[1])  # SIN with v0=1.0
    packed = pack([WAVES[1]])
    out = S.eval_dc(jnp.asarray([0.5]), packed[0], packed[2], 0.4)
    assert float(out[0]) == pytest.approx(spec.eval_dc(0.4))
    assert float(out[0]) == pytest.approx((0.5 + 1.0) * 0.4)


def test_eval_tran_adds_dc():
    t = 0.25 / 900e6
    spec = SourceSpec(dc=0.25, wave=WAVES[1])
    kind, pulse, sin, pt, pv, pn = pack([WAVES[1]])
    out = S.eval_tran(jnp.asarray([0.25]), kind, pulse, sin, pt, pv, pn, t)
    assert float(out[0]) == pytest.approx(spec.eval_tran(t), rel=1e-14)
