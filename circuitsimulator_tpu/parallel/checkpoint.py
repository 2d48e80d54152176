"""Checkpoint / resume for long transients.

The reference keeps all transient state in RAM (tanalisis.cpp:139-180) and a
crash loses the run.  Here the scan carry (x, cap history, inductor
currents, failed flags) is a flat pytree of arrays, so resumable transients
are just "run the scan in chunks and persist the carry":

    runner = ChunkedTransient(engine, params, tstep=1e-13, tstop=5e-9,
                              ckpt_path="run.npz", chunk_steps=5000)
    result = runner.run()     # picks up from run.npz if present

Serialization is plain .npz (portable, no framework dependency).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..analysis.dc import dc_operating_point
from ..analysis.transient import transient_step_fn, n_steps_for
from ..ops.assemble import Engine

def save_carry(path: str, carry, step_done: int) -> None:
    """Serialize whatever state keys the engine produced (vc/ic/il/vl,
    plus e.g. the transmission-line delay ring 'tlw' or the TRNOISE
    noise state when present).  Typed PRNG keys (the 'tn_key' entry)
    are stored as raw key data under a 'k_' prefix."""
    x, state, failed = carry
    arrs = {"x": np.asarray(x), "failed": np.asarray(failed),
            "step_done": np.asarray(step_done)}
    for k in state:
        v = state[k]
        if jnp.issubdtype(getattr(v, "dtype", None), jax.dtypes.prng_key):
            arrs[f"k_{k}"] = np.asarray(jax.random.key_data(v))
        else:
            arrs[f"s_{k}"] = np.asarray(v)
    tmp = path + ".tmp.npz"
    with open(tmp, "wb") as f:
        np.savez(f, **arrs)
    os.replace(tmp, path)


def load_carry(path: str):
    with np.load(path) as z:
        state = {k[2:]: jnp.asarray(z[k]) for k in z.files
                 if k.startswith("s_")}
        for k in z.files:
            if k.startswith("k_"):
                state[k[2:]] = jax.random.wrap_key_data(jnp.asarray(z[k]))
        carry = (jnp.asarray(z["x"]), state, jnp.asarray(z["failed"]))
        return carry, int(z["step_done"])


class ChunkedTransient:
    def __init__(self, engine: Engine, params, tstep: float, tstop: float,
                 ckpt_path: Optional[str] = None, chunk_steps: int = 10000,
                 noise_key=None):
        self.engine = engine
        self.params = params
        self.tstep = float(tstep)
        self.n_steps = n_steps_for(tstep, tstop)
        self.ckpt_path = ckpt_path
        self.chunk_steps = int(chunk_steps)
        self.noise_key = noise_key
        dt = jnp.asarray(tstep, engine.dtype)
        step = transient_step_fn(engine, params, dt)

        def run_chunk(carry, ts):
            def body(c, t):
                c, (_, iters) = step(c, t)
                return c, iters
            return lax.scan(body, carry, ts)

        self._run_chunk = jax.jit(run_chunk)

    def initial_carry(self):
        x0 = dc_operating_point(self.engine, self.params)
        state = self.engine.init_state(x0, self.params, self.tstep,
                                       noise_key=self.noise_key)
        failed = jnp.zeros(x0.shape[:-1], dtype=bool)
        return (x0, state, failed)

    def run(self):
        """Run to completion, checkpointing every chunk; resumes if a
        checkpoint exists.  Returns (final carry, total newton iters)."""
        start = 0
        if self.ckpt_path and os.path.exists(self.ckpt_path):
            carry, start = load_carry(self.ckpt_path)
        else:
            carry = self.initial_carry()
        total_iters = 0
        dtype = self.engine.dtype
        while start < self.n_steps:
            hi = min(start + self.chunk_steps, self.n_steps)
            ts = (jnp.arange(start + 1, hi + 1, dtype=dtype)
                  * jnp.asarray(self.tstep, dtype))
            carry, iters = self._run_chunk(carry, ts)
            total_iters += int(jnp.sum(iters))
            start = hi
            if self.ckpt_path:
                save_carry(self.ckpt_path, jax.device_get(carry), start)
        return carry, total_iters
