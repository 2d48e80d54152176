"""Structured run metadata (SURVEY.md §5: the reference has cout banners
only; we emit machine-readable JSON with Newton-iteration statistics —
iteration-count observability is exactly what the reference's "did not
converge" warnings show is needed)."""

from __future__ import annotations

import json
import platform
from typing import Any, Dict, Optional

import numpy as np


def _iter_stats(newton_iters) -> Dict[str, Any]:
    it = np.asarray(newton_iters)
    if it.size == 0:
        return {"total": 0}
    flat = it.reshape(-1)
    hist_edges = [1, 2, 3, 5, 8, 13, 21, 34, 50]
    hist = {}
    prev = 0
    for e in hist_edges:
        hist[f"<={e}"] = int(np.sum((flat > prev) & (flat <= e)))
        prev = e
    hist[f">{hist_edges[-1]}"] = int(np.sum(flat > hist_edges[-1]))
    return {
        "total": int(flat.sum()),
        "mean_per_step": float(flat.mean()),
        "max": int(flat.max()),
        "min": int(flat.min()),
        "histogram": hist,
    }


def transient_metadata(sim, result, wall_s: Optional[float] = None,
                       extra: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    topo = sim.topo
    meta = {
        "engine": "circuitsimulator_tpu",
        "analysis": "transient_backward_euler",
        "platform": platform.machine(),
        "n_nodes": topo.n_nodes,
        "n_elements": topo.n_elements,
        "n_unknowns": topo.n_unknowns,
        "element_counts": topo.counts,
        "n_steps": result.n_steps,
        "tstep": sim.config.tran.tstep,
        "tstop": sim.config.tran.tstop,
        "solver": {
            "backend": sim.opts.tran_solver,
            "dtype": str(np.dtype(sim.opts.dtype)),
            "tol": sim.opts.tran_tol,
            "alpha": sim.opts.tran_alpha,
            "gmin": sim.opts.tran_gmin,
            "max_newton_iters": sim.opts.tran_max_newton_iters,
        },
        "newton": _iter_stats(result.newton_iters),
        "failed_lanes": int(np.sum(np.asarray(result.failed))),
    }
    if wall_s is not None:
        meta["wall_seconds"] = wall_s
        if result.n_steps:
            meta["timesteps_per_second"] = result.n_steps / wall_s
    if extra:
        meta.update(extra)
    return meta


def write_metadata(path: str, meta: Dict[str, Any]) -> None:
    with open(path, "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)
        f.write("\n")
