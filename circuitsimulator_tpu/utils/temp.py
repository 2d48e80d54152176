"""Temperature scaling of junction saturation currents (extension).

Standard SPICE form, written in terms of the thermal voltage so it batches
over Monte-Carlo temperature lanes:

    IS(T) = IS * (vt/vt0)^(xti/n) * exp( (eg/n) * (1/vt0 - 1/vt) )

with vt = kT/q, vt0 the nominal (27 C) thermal voltage.  Opt-in per model:
EG/XTI default to 0 here (no scaling), so `.TEMP` without them keeps the
reference's vt-only semantics — give EG=1.11 XTI=3 for full silicon
behavior (IS roughly doubles every ~5 C).  Applied to diodes (per-device
EG/XTI keys) and BJTs (.MODEL EG/XTI).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

VT_NOMINAL = 0.025852   # models/diode.py VT_THERMAL (27 C-equivalent)


def has_is_temp(params) -> bool:
    """True when any device opts into IS(T) scaling (host-side, static)."""
    return bool(np.any(np.asarray(params["dio_eg"]))
                or np.any(np.asarray(params["dio_xti"]))
                or np.any(np.asarray(params["bjt_eg"]))
                or np.any(np.asarray(params["bjt_xti"])))


def apply_is_temp(params):
    """Return a params dict with dio_is / bjt_is scaled to the temperature
    implied by params["vt_thermal"].  Pure jnp — safe under vmap/.STEP
    batching.  Call only when has_is_temp(params) (keeps EG/XTI-free decks
    structurally identical)."""
    p = dict(params)
    vt = p["vt_thermal"]
    inv_d = 1.0 / VT_NOMINAL - 1.0 / vt

    def scale(i_s, n, eg, xti):
        ratio = vt / VT_NOMINAL
        return i_s * ratio ** (xti / n) * jnp.exp(eg / n * inv_d)

    if p["dio_is"].shape[-1]:
        p["dio_is"] = scale(p["dio_is"], p["dio_n"],
                            p["dio_eg"], p["dio_xti"])
    if p["bjt_is"].shape[-1]:
        p["bjt_is"] = scale(p["bjt_is"], 1.0, p["bjt_eg"], p["bjt_xti"])
    return p
