"""Monte-Carlo oscillator yield walkthrough: frequency pull + jitter.

A van der Pol LC oscillator with 2% L/C and 5% loss tolerances must hit
its band (5.03 MHz +/- 1.5%) and keep period jitter under a budget.
Every Monte-Carlo lane solves its OWN autonomous-HB limit cycle and
fundamental in one batched program, then a second batched program
extracts each lane's perturbation-projection vector (PPV) and Demir
phase-diffusion constant — no per-lane host work at all
(analysis/hbosc.oscillator_hb_batched / oscillator_phase_noise_hb_batched).

Run:  python examples/osc_yield.py [lanes]      (default 64, CPU ok)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np                               # noqa: E402

from circuitsimulator_tpu import Simulator       # noqa: E402

DECK = """* van der pol lc oscillator w/ tolerances
L1 a 0 1u DEV=2%
C1 a 0 1n DEV=2%
Rl a 0 2k DEV=5%
Bneg a 0 I=-2m*v(a) + 0.5m*v(a)**3
.op
"""

F_NOM = 5.03e6
F_TOL = 0.015            # +/- 1.5% band
JITTER_BUDGET = 2e-14    # s rms per period


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    sim = Simulator.from_text(DECK)
    bp, res = sim.monte_carlo_oscillator_phase_noise(
        n, offsets=[10e3], f0_guess=5e6, anchor_node="a", seed=0)
    conv = np.asarray(res.converged)
    f0 = np.asarray(res.f0)
    jit = np.asarray(res.period_jitter)
    print(f"lanes: {n}, converged: {conv.sum()}/{n}")
    print(f"f0: mean {f0.mean()/1e6:.4f} MHz, "
          f"sigma {f0.std()/f0.mean():.3%} "
          f"(spec band +/-{F_TOL:.1%} around {F_NOM/1e6:.2f} MHz)")
    in_band = conv & (np.abs(f0 / F_NOM - 1.0) < F_TOL)
    low_jit = conv & (jit < JITTER_BUDGET)
    print(f"frequency yield: {in_band.mean():.1%}   "
          f"jitter yield (< {JITTER_BUDGET:.0e} s): {low_jit.mean():.1%}")
    print(f"L(10 kHz): mean {res.L_dbc[:, 0].mean():.1f} dBc/Hz, "
          f"worst {res.L_dbc[conv, 0].max():.1f} dBc/Hz")
    print(f"overall yield: {(in_band & low_jit).mean():.1%}")


if __name__ == "__main__":
    main()
