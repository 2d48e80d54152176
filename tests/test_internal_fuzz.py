"""Internal differential fuzzing: for random circuits (including extension
devices the reference lacks), independent solve paths must agree —
LU-vs-Woodbury backends, BE-vs-trapezoidal consistency in the dt->0 sense is
out of scope here; this checks exact backend equivalence."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from circuitsimulator_tpu.api import Simulator
from circuitsimulator_tpu.utils.options import DEFAULT_OPTIONS


def gen(rng: random.Random) -> str:
    n_nodes = rng.randint(3, 7)
    nodes = [str(i) for i in range(1, n_nodes + 1)]
    lines = [f"V1 1 0 SIN {round(rng.uniform(1, 3), 2)} "
             f"{round(rng.uniform(0.1, 0.5), 2)} 1e7"]
    for i, n in enumerate(nodes):
        prev = rng.choice(["0"] + nodes[:i]) if i else "0"
        lines.append(f"Rt{n} {n} {prev} {round(10 ** rng.uniform(1.5, 3.5), 1)}")
    lines.append(".MODEL 2 VT 0.5 MU 1e-2 COX 1e-3 LAMBDA 0.05 CJ0 2e-14")
    # exercise the opt-in physics half the time (VAF/CJE/CJC, diode BV)
    if rng.random() < 0.5:
        lines.append(".MODEL qn NPN IS=1e-15 BF=90 BR=1.5 "
                     "VAF=60 CJE=0.2p CJC=0.1p")
    else:
        lines.append(".MODEL qn NPN IS=1e-15 BF=90 BR=1.5")
    lines.append(".MODEL jn NJF VTO=-1.5 BETA=5e-4")
    eid = 0
    for _ in range(rng.randint(2, 5)):
        eid += 1
        a, b = rng.sample(nodes + ["0"], 2)
        r = rng.random()
        if r < 0.3:
            lines.append(f"Cx{eid} {a} {b} {rng.choice(['0.1p', '1p'])}")
        elif r < 0.45:
            lines.append(f"Lx{eid} {a} {b} 1n")
        elif r < 0.65:
            d, g, s = (rng.choice(nodes + ["0"]) for _ in range(3))
            lines.append(f"Mx{eid} {d} {g} {s} n 10e-6 1e-6 2")
        elif r < 0.78:
            bv = " BV=4 IBV=1m" if rng.random() < 0.5 else ""
            lines.append(f"Dx{eid} {a} {b} IS=1e-14{bv}")
        elif r < 0.88:
            d, g, s = (rng.choice(nodes + ["0"]) for _ in range(3))
            lines.append(f"Jx{eid} {d} {g} {s} jn")
        else:
            c, bb, e = (rng.choice(nodes + ["0"]) for _ in range(3))
            lines.append(f"Qx{eid} {c} {bb} {e} qn")
    lines.append(".TRAN 1e-10 1e-8")
    return "\n".join(lines) + "\n"


@pytest.mark.parametrize("seed", range(6))
def test_backends_agree_on_random_circuits(seed):
    text = gen(random.Random(7000 + seed))
    o_lu = DEFAULT_OPTIONS.replace(dtype=jnp.float64, tran_solver="lu")
    o_wb = DEFAULT_OPTIONS.replace(dtype=jnp.float64, tran_solver="woodbury")
    s_lu = Simulator.from_text(text, opts=o_lu)
    s_wb = Simulator.from_text(text, opts=o_wb)
    x_lu = np.asarray(s_lu.dc())
    x_wb = np.asarray(s_wb.dc())
    np.testing.assert_array_equal(x_lu, x_wb)  # DC path identical
    if not np.all(np.isfinite(x_lu)):
        pytest.skip("degenerate random circuit (singular DC)")
    r_lu = s_lu.transient()
    r_wb = s_wb.transient()
    scale = max(np.abs(np.asarray(r_lu.xs)).max(), 1.0)
    np.testing.assert_allclose(np.asarray(r_wb.xs), np.asarray(r_lu.xs),
                               atol=1e-9 * scale)
