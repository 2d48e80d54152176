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

Crossing detection shares analysis/measure.py's `_crossings` (the same
edge semantics as `.MEASURE WHEN`).  When the noise is large enough to
double-cross the threshold, pass `hysteresis=h`: a rising edge then
only counts after the signal has dipped below `threshold − h` since the
last accepted edge (Schmitt-trigger debounce), keeping every lane's
edge count aligned with the physical cycles.  Lanes that still
disagree on the count are truncated to the common prefix with a loud
stderr warning — mixed-up edge pairings would silently corrupt the
statistics otherwise.
"""

from __future__ import annotations

import sys
from typing import Optional

import numpy as np
import jax

from ..ops.assemble import Engine
from .measure import _crossings


def _debounced(t: np.ndarray, v: np.ndarray, thr: float, rising: bool,
               h: float, t_min: float) -> np.ndarray:
    """Schmitt-style edge times: a crossing of `thr` only counts after
    the waveform visited the release band (thr−h rising / thr+h
    falling) since the previous accepted edge."""
    edge = "rise" if rising else "fall"
    tc = _crossings(t, v, thr, edge, t_min)
    if h <= 0 or tc.size == 0:
        return tc
    release = _crossings(t, v, thr - h if rising else thr + h,
                         "fall" if rising else "rise", t_min)
    out = []
    armed = True           # armed at t=0 (signal starts on the far side)
    ri = 0
    for time in tc:
        while ri < release.size and release[ri] < time:
            armed = True
            ri += 1
        if armed:
            out.append(time)
            armed = False
    return np.asarray(out)


def jitter_analysis(engine: Engine, params, tstep, tstop,
                    eq_index: int, threshold: float, key,
                    n_lanes: int = 64, rising: bool = True,
                    t_min: float = 0.0, hysteresis: float = 0.0):
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
    per_lane = [_debounced(times, xs[b, :, eq_index], threshold, rising,
                           hysteresis, t_min)
                for b in range(n_lanes)]
    counts = np.asarray([len(c) for c in per_lane])
    k = int(counts.min())
    if k == 0:
        raise ValueError("no threshold crossings found on any lane")
    if counts.max() != k:
        print(f"jitter: lanes disagree on the edge count "
              f"(min {k}, max {int(counts.max())}) — noise is "
              "double-crossing the threshold; statistics use the first "
              f"{k} edges per lane.  Pass hysteresis= (a volt-scale "
              "release band) to debounce.", file=sys.stderr)
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
