"""DC sensitivity analysis (`.SENS` — extension, JAX-native).

Computes the gradient of a DC output V(out[, ref]) with respect to EVERY
circuit parameter at once, by implicit differentiation at the converged
operating point instead of differentiating through the damped-Newton
iteration (whose `lax.while_loop` is not reverse-differentiable):

    KCL residual  r(x, p) = A(x, p) x - b(x, p) = 0  at the solution
    MNA Newton IS Newton on r, so  dr/dx = A(x, p)  (the stamped Jacobian)
    y = c^T x  =>  dy/dp = -lambda^T dr/dp   with   A^T lambda = c

One adjoint linear solve plus one `jax.vjp` of the assembly yields the
full parameter gradient — O(cost of a single Newton iteration), for any
number of parameters.  Because the assembly is a pure jnp function of the
params pytree, the gradient covers every device class (R/C-as-open/L/V/I,
MOS, diode, BJT, controlled sources) **and** the thermal voltage, i.e.
temperature sensitivity comes for free.

The operating point is first polished with a few undamped Newton steps at
gmin = 0 so the residual is zero to machine precision at the point of
linearization (the reference's ramped solve leaves a gmin-scale leak).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.assemble import Engine
from ..ops.lu import lu_solve
from .dc import dc_operating_point


def dc_residual(engine: Engine, params, x):
    """Exact KCL residual r(x, p) (N,) with gmin = 0 — differentiable in
    params (pure assembly, no iteration)."""
    N = engine.N
    G_s, I_s = engine.dc_static(params, jnp.ones((), engine.dtype))
    G, I = engine.assemble_dc_iter(G_s, I_s, params, x, 0.0)
    return jnp.einsum("...ij,...j->...i", G[..., :N, :N], x) - I[..., :N]


def _polish(engine: Engine, params, x, iters: int = 3):
    """Undamped Newton refinements at gmin = 0 (fixed unrolled count)."""
    N = engine.N
    G_s, I_s = engine.dc_static(params, jnp.ones((), engine.dtype))
    for _ in range(iters):
        G, I = engine.assemble_dc_iter(G_s, I_s, params, x, 0.0)
        x_new = lu_solve(G[..., :N, :N], I[..., :N],
                         engine.opts.lu_pivot_floor)
        x = jnp.where(jnp.all(jnp.isfinite(x_new), axis=-1,
                              keepdims=True), x_new, x)
    return x


def dc_sensitivity(engine: Engine, params, out_eq: int, ref_eq: int = -1,
                   x: Optional[Any] = None, polish_iters: int = 3):
    """d V(out,ref) / d p for every leaf of `params`.

    Returns (grads, x, residual_norm): a pytree matching params (integer
    leaves get zero cotangents), the polished operating point, and the
    final |r| as a quality check."""
    if x is None:
        x = dc_operating_point(engine, params)
    x = _polish(engine, params, x, polish_iters)
    N = engine.N
    G_s, I_s = engine.dc_static(params, jnp.ones((), engine.dtype))
    G, _ = engine.assemble_dc_iter(G_s, I_s, params, x, 0.0)
    J = G[..., :N, :N]

    c = jnp.zeros((N,), engine.dtype).at[out_eq].set(1.0)
    if ref_eq >= 0:
        c = c.at[ref_eq].add(-1.0)
    lam = lu_solve(jnp.swapaxes(J, -1, -2), c, engine.opts.lu_pivot_floor)

    _, vjp = jax.vjp(lambda p: dc_residual(engine, p, x), params)
    (grads,) = vjp(-lam)
    rnorm = jnp.linalg.norm(dc_residual(engine, params, x))
    return grads, x, rnorm


# params-key -> (circuit element kind, parameter label)
_PARAM_LABELS = {
    "res_r": ("R", "R"), "cap_c": ("C", "C"), "ind_l": ("L", "L"),
    "mut_k": ("K", "K"),
    "jf_vto": ("J", "VTO"), "jf_beta": ("J", "BETA"), "jf_lam": ("J", "LAMBDA"),
    "sw_ron": ("S", "RON"), "sw_roff": ("S", "ROFF"), "sw_vt": ("S", "VT"),
    "vs_dc": ("V", "DC"), "is_dc": ("I", "DC"),
    "mos_vth": ("M", "VT"), "mos_k": ("M", "K"), "mos_lam": ("M", "LAMBDA"),
    "mos_cj0": ("M", "CJ0"), "mos_gamma": ("M", "GAMMA"),
    "dio_is": ("D", "IS"), "dio_n": ("D", "N"),
    "bjt_is": ("Q", "IS"), "bjt_bf": ("Q", "BF"), "bjt_br": ("Q", "BR"),
    "bjt_vaf": ("Q", "VAF"), "bjt_cje": ("Q", "CJE"),
    "bjt_cjc": ("Q", "CJC"),
    "res_tc1": ("R", "TC1"), "res_tc2": ("R", "TC2"),
    "vcvs_gain": ("E", "GAIN"), "vccs_g": ("G", "GM"),
    "cccs_gain": ("F", "GAIN"), "ccvs_r": ("H", "R"),
}


def sensitivity_report(circuit, grads: Dict[str, Any],
                       normalize_params: Optional[Dict[str, Any]] = None):
    """[(label, dV/dp [, p*dV/dp])] rows for every per-element parameter,
    labeled `d/d<PARAM>(<element>)`, sorted by |sensitivity| descending.
    With normalize_params the per-decade sensitivity p*dy/dp is added."""
    names = {}
    for e in circuit.elements:
        names.setdefault(e.kind, []).append(e.name)
    rows = []
    for key, (kind, label) in _PARAM_LABELS.items():
        g = grads.get(key)
        if g is None or not hasattr(g, "shape") or g.size == 0:
            continue
        g = np.asarray(g)
        for i, name in enumerate(names.get(kind, [])):
            if i >= g.shape[-1]:
                break
            row = [f"d/d{label}({name})", float(g[..., i])]
            if normalize_params is not None:
                p = float(np.asarray(normalize_params[key])[..., i])
                row.append(p * float(g[..., i]))
            rows.append(tuple(row))
    if "vt_thermal" in grads and hasattr(grads["vt_thermal"], "shape"):
        g = float(np.asarray(grads["vt_thermal"]))
        row = ["d/dVt(thermal)", g]
        if normalize_params is not None:
            row.append(float(np.asarray(normalize_params["vt_thermal"])) * g)
        rows.append(tuple(row))
    rows.sort(key=lambda r: -abs(r[1]))
    return rows


def unit_tangent(params, key: str, idx=None):
    """A params-shaped tangent pytree: 1.0 at params[key][idx], zero
    elsewhere (float0 for integer leaves, as jax.jvp requires)."""
    def zero(leaf):
        arr = jnp.asarray(leaf)
        if not jnp.issubdtype(arr.dtype, jnp.floating):
            return np.zeros(arr.shape, jax.dtypes.float0)
        return jnp.zeros_like(arr)

    t = jax.tree_util.tree_map(zero, dict(params))
    t[key] = t[key].at[idx if idx is not None else ()].set(1.0)
    return t


def transient_sensitivity(engine: Engine, params, tangent, tstep, tstop,
                          **tran_kw):
    """Waveform sensitivity d x(t) / d p in the direction `tangent` (a
    params pytree, e.g. from unit_tangent) via forward-mode JVP through the
    whole DC-init + timestepping pipeline — `lax.while_loop` is forward-
    differentiable, so no custom adjoint is needed.  Returns
    (TransientResult, dxs) with dxs of shape xs.

    One linearization per direction; vmap over tangents for batches of
    parameters.  (Reverse-mode over all parameters at once needs the
    adjoint-in-time machinery — future work.)"""
    from .transient import run_transient

    def f(p):
        return run_transient(engine, p, tstep, tstop, save_xs=True).xs

    xs, dxs = jax.jvp(f, (dict(params),), (tangent,))
    return xs, dxs
