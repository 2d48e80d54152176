"""Timing-jitter analysis over TRNOISE transient-noise lanes.

The classic bench measurement: run N independent noise realizations of
the same deck (parallel/montecarlo.batched_transient with split keys —
one batched solve), extract the interpolated threshold-crossing times
of a probe per lane, and report per-edge statistics:

  - absolute jitter: std of each edge's crossing time across lanes
  - period jitter:   std of the k→k+1 edge spacing

For a clean edge with slew rate SR carrying additive voltage noise of
RMS v_n, the small-noise prediction is t_jitter ≈ v_n / SR — pinned by
the tests.  The reference (one deck per process, no noise sources —
SURVEY.md §2) has no equivalent.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax

from ..ops.assemble import Engine


def _crossings(t: np.ndarray, v: np.ndarray, thr: float,
               rising: bool) -> np.ndarray:
    """Interpolated times of all threshold crossings in one waveform."""
    s = v - thr
    if rising:
        idx = np.flatnonzero((s[:-1] < 0) & (s[1:] >= 0))
    else:
        idx = np.flatnonzero((s[:-1] > 0) & (s[1:] <= 0))
    if len(idx) == 0:
        return np.zeros((0,))
    frac = s[idx] / (s[idx] - s[idx + 1])
    return t[idx] + frac * (t[idx + 1] - t[idx])


def jitter_analysis(engine: Engine, params, tstep, tstop,
                    eq_index: int, threshold: float, key,
                    n_lanes: int = 64, rising: bool = True,
                    t_min: float = 0.0):
    """Per-edge crossing-time statistics over n_lanes independent noise
    realizations.  Returns a dict: edge_times (n_lanes, K), edge_mean /
    edge_jitter (K,), period_jitter (K-1,) or None, n_edges."""
    from ..parallel.montecarlo import broadcast_params, batched_transient
    if not engine.has_trnoise:
        raise ValueError("jitter analysis needs TRNOISE sources")
    bp = broadcast_params(params, n_lanes)
    res = batched_transient(engine, bp, tstep, tstop, save_xs=True,
                            noise_key=key)
    xs = np.asarray(res.xs)                       # (B, T+1, N)
    times = np.asarray(res.times if hasattr(res, "times") else None)
    if times.ndim > 1:                            # batched times
        times = times[0]
    per_lane = []
    for b in range(n_lanes):
        c = _crossings(times, xs[b, :, eq_index], threshold, rising)
        per_lane.append(c[c >= t_min])
    k = min(len(c) for c in per_lane)
    if k == 0:
        raise ValueError("no threshold crossings found on any lane")
    edges = np.stack([c[:k] for c in per_lane])   # (B, K)
    out = {
        "edge_times": edges,
        "edge_mean": edges.mean(axis=0),
        "edge_jitter": edges.std(axis=0),
        "n_edges": k,
    }
    if k > 1:
        periods = np.diff(edges, axis=1)          # (B, K-1)
        out["period_mean"] = periods.mean(axis=0)
        out["period_jitter"] = periods.std(axis=0)
    else:
        out["period_jitter"] = None
    return out
