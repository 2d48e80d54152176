"""DC transfer function (`.TF` — extension, JAX-native).

The reference parses no `.TF` card and implements no small-signal DC
analysis; this is the standard SPICE `.TF output input_source` card:
linearize the circuit at the DC operating point and report

  * the small-signal DC gain  d out / d in,
  * the input resistance seen by the input source,
  * the output resistance at the output probe (voltage outputs only).

All three come from the same stamped Jacobian J = dr/dx used by `.SENS`
(analysis/sensitivity.py): with the operating point polished to a
machine-precision residual,

    gain = c^T J^{-1} b_in            (one forward solve)
    Rout = c^T J^{-1} c_inj           (one forward solve, V outputs)
    Rin  = from the same forward solve's branch-current / terminal rows

where b_in is the RHS derivative w.r.t. the input source value
(e_branch for a V source — its branch row reads V(p)-V(m) = Vin; and
-e_p + e_m for an I source, matching the reference's RHS convention
`I(eqP) -= Ival; I(eqM) += Ival`, element.cpp:60-65) and c is the output
selector (e_out - e_ref for V(out,ref), e_branch for I(Vxxx)).

Sign conventions (validated in tests/test_tf.py against voltage dividers
and finite differences):

  * V-source input: the MNA branch unknown i_br is the current flowing
    from the + terminal *into* the source, so the current the source
    delivers into the circuit is -i_br and
        Rin = -1 / (d i_br / d Vin).
  * I-source input: positive Iin pulls current out of node p (reference
    RHS convention above), so the resistance looking into the (p, m)
    terminals is
        Rin = d (V(m) - V(p)) / d Iin  >= 0 for passive circuits.
  * Rout injects a unit test current into the output pair (out, ref)
    with the input's small-signal contribution zero:
        Rout = c^T J^{-1} (e_out - e_ref).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax.numpy as jnp

from ..ops.assemble import Engine
from ..ops.lu import lu_solve
from .dc import dc_operating_point
from .sensitivity import _polish


@dataclasses.dataclass
class TFResult:
    gain: Any          # d out / d input-source-value
    r_in: Any          # input resistance seen by the input source (ohm)
    r_out: Any         # output resistance at the probe; None for I(..) out
    x_op: Any          # polished DC operating point used for linearization


def _unit_row(N: int, eq: int, dtype) -> jnp.ndarray:
    """e_eq as a length-N vector; ground (eq < 0 or eq >= N) contributes 0."""
    v = jnp.zeros((N,), dtype)
    if 0 <= eq < N:
        v = v.at[eq].set(1.0)
    return v


def dc_transfer_function(engine: Engine, params,
                         out_kind: str, out_a: int, out_b: int,
                         input_ref, x: Optional[Any] = None,
                         polish_iters: int = 3) -> TFResult:
    """Small-signal DC transfer function.

    out_kind: "v" -> output is V(eq=out_a) - V(eq=out_b if >=0 else gnd);
              "i" -> output is the branch current x[out_a] (out_b unused).
    input_ref: ("v", branch_eq) for a V-source input or
               ("i", ep, em) for an I-source input (node eq indices, the
               dump-slot convention of ir/lower.py is accepted).
    """
    if x is None:
        x = dc_operating_point(engine, params)
    x = _polish(engine, params, x, polish_iters)
    N = engine.N
    dtype = engine.dtype
    G_s, I_s = engine.dc_static(params, jnp.ones((), dtype))
    G, _ = engine.assemble_dc_iter(G_s, I_s, params, x, 0.0)
    J = G[..., :N, :N]

    # RHS derivative w.r.t. the input source value
    if input_ref[0] == "v":
        br = int(input_ref[1])
        b_in = _unit_row(N, br, dtype)
    else:
        _, ep, em = input_ref
        b_in = _unit_row(N, int(em), dtype) - _unit_row(N, int(ep), dtype)

    dx = lu_solve(J, b_in, engine.opts.lu_pivot_floor)  # d x / d Vin|Iin

    # output selector
    c = _unit_row(N, int(out_a), dtype)
    if out_kind == "v" and int(out_b) >= 0:
        c = c - _unit_row(N, int(out_b), dtype)
    gain = jnp.dot(c, dx)

    # input resistance
    if input_ref[0] == "v":
        di_br = dx[int(input_ref[1])]
        r_in = -1.0 / di_br
    else:
        _, ep, em = input_ref
        dv_m = dx[int(em)] if 0 <= int(em) < N else jnp.zeros((), dtype)
        dv_p = dx[int(ep)] if 0 <= int(ep) < N else jnp.zeros((), dtype)
        r_in = dv_m - dv_p

    # output resistance (voltage outputs only): unit test current into the
    # (out, ref) pair with the input small-signal off
    r_out = None
    if out_kind == "v":
        c_inj = c
        dx_t = lu_solve(J, c_inj, engine.opts.lu_pivot_floor)
        r_out = jnp.dot(c, dx_t)

    return TFResult(gain=gain, r_in=r_in, r_out=r_out, x_op=x)


def tf_report(result: TFResult, out_label: str, input_name: str) -> str:
    r_in = float(result.r_in)
    r_in_txt = "inf" if not math.isfinite(r_in) else f"{r_in: .6e}"
    lines = [
        f"==== Transfer function ====",
        f"d{out_label}/d{input_name} = {float(result.gain): .6e}",
        f"input resistance at {input_name} = {r_in_txt}",
    ]
    if result.r_out is not None:
        lines.append(
            f"output resistance at {out_label} = {float(result.r_out): .6e}")
    return "\n".join(lines)
