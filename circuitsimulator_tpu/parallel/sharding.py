"""Multi-chip scaling via jax.sharding.

The workload is embarrassingly parallel across circuit instances (the
reference has no distributed anything — SURVEY.md §2), so the design is
pure data parallelism: the Monte-Carlo batch axis is sharded across a 1-D
device mesh, XLA partitions the whole jitted sweep with zero inter-chip
communication inside a solve, and the only collectives are final statistic
reductions (psum/pmean over the batch axis) riding ICI.

Works identically on a real multi-chip slice and on the virtual
`--xla_force_host_platform_device_count=N` CPU mesh used by CI.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..analysis.transient import run_transient
from ..ops.assemble import Engine

BATCH_AXIS = "batch"


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = BATCH_AXIS) -> Mesh:
    devices = jax.devices() if devices is None else list(devices)
    return Mesh(np.array(devices), (axis_name,))


def shard_batch(mesh: Mesh, tree, axis_name: str = BATCH_AXIS):
    """Place a batched pytree with its leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(tree, sharding)


def sharded_transient(engine: Engine, mesh: Mesh, bparams,
                      tstep, tstop, save_xs: bool = False):
    """jit-compiled batch transient with the lane axis sharded over `mesh`.

    Returns the TransientResult with every per-lane leaf sharded P("batch").
    Lanes never communicate, so XLA emits no collectives inside the scan —
    each chip simply owns B/n_devices lanes.
    """
    bparams = shard_batch(mesh, bparams)
    fn = jax.jit(
        lambda p: jax.vmap(
            lambda q: run_transient(engine, q, tstep, tstop, save_xs=save_xs)
        )(p))
    return fn(bparams)


def sharded_transient_measures(engine: Engine, mesh: Mesh, bparams,
                               tstep, tstop, measures, topo,
                               axis_name: str = BATCH_AXIS):
    """Multi-chip streaming-measure sweep: the lane axis shards over the
    mesh, each chip runs its shard's transient with the O(1)-memory
    measure accumulators, and only the per-lane measurement results (and
    final states) come home — waveforms never exist anywhere.  This is
    the full deployment shape: lanes x chips, measured in flight."""
    from .montecarlo import batched_transient_measures
    bparams = shard_batch(mesh, bparams, axis_name)
    # batched_transient_measures jits the device part internally and
    # evaluates derived (PARAM=) measures on the host afterwards
    return batched_transient_measures(engine, bparams, tstep, tstop,
                                      measures, topo)


def sweep_statistics(xs_final, mesh: Optional[Mesh] = None):
    """Cross-lane summary statistics of a sweep result (B, N): mean/std/min/
    max per unknown.  Under a sharded input this lowers to ICI all-reduces."""
    return {
        "mean": jnp.mean(xs_final, axis=0),
        "std": jnp.std(xs_final, axis=0),
        "min": jnp.min(xs_final, axis=0),
        "max": jnp.max(xs_final, axis=0),
    }
