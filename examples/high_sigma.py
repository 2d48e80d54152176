"""High-sigma verification walkthrough: the three yield estimators.

A Level-1 MOS inverter driving a load cap must pull its output below
1.27 V within 3.5 ns of the input step.  Threshold-voltage mismatch
(sigma = 30 mV on VT) makes slow corners rare — far too rare for plain
Monte Carlo to see — so this script runs the production flow:

  1. plain batched Monte Carlo        (bulk statistics, Wilson CI)
  2. scaled-sigma importance sampling (first tail look, no gradients)
  3. FORM worst-case search           (beta, the exact worst corner)
  4. MPP-centered mean-shift IS       (final unbiased tail estimate)

Run:  python examples/high_sigma.py [batch]     (default 1024, CPU ok)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from circuitsimulator_tpu import Simulator  # noqa: E402

DECK = """* inverter settle-time yield
.MODEL mn VT 0.7 MU 5e-2 COX 2e-3
VDD vdd 0 3
VIN in 0 PULSE(0 3 1n 0.8n 0.8n 20n 40n)
RD vdd out 20k
M1 out in 0 0 mn W=0.8u L=1u
CL out 0 150f
.TRAN 5e-11 8e-9
.MEASURE TRAN vset FIND V(out) AT=3.5e-9
.end
"""

V_SPEC = 1.27            # output must be below this at 3.5 ns
SIGMA = {"mos_vth": 0.043}   # ~30 mV on VT=0.7 (lognormal, relative)


def main(batch: int = 1024):
    sim = Simulator.from_text(DECK)
    specs = {"vset": (None, V_SPEC)}

    print(f"== plain Monte Carlo ({batch} lanes, LHS) ==")
    plain = sim.yield_analysis(jax.random.key(0), batch, SIGMA, specs,
                               sampler="lhs")
    print(f"   yield {plain['yield']:.6f}   Wilson 95% CI "
          f"[{plain['ci95'][0]:.6f}, {plain['ci95'][1]:.6f}]")
    print(f"   failures seen: {int((~plain['pass']).sum())} "
          f"(tail too rare for this batch)")

    print(f"== scaled-sigma IS (s=2.5) ==")
    scaled = sim.yield_analysis(jax.random.key(1), batch, SIGMA, specs,
                                sigma_scale=2.5)
    print(f"   p_fail {scaled['p_fail']:.3e} +- {scaled['p_fail_se']:.1e}"
          f"   n_eff {scaled['n_eff']:.0f}")

    print("== FORM worst-case search ==")
    form = sim.worst_case(SIGMA, probe="out", at=3.5e-9, high=V_SPEC)
    vt_star = float(form["params_star"]["mos_vth"][0])
    print(f"   beta {form['beta']:.3f} sigma   FORM p_fail "
          f"{form['p_fail']:.3e}   ({form['n_iter']} gradient steps)")
    print(f"   worst-case VT = {vt_star * 1e3:.1f} mV "
          f"(nominal 700.0 mV)")

    print("== MPP-centered mean-shift IS (the production estimate) ==")
    shifted = sim.yield_analysis(jax.random.key(2), batch, SIGMA, specs,
                                 shift=form["z_star"])
    frac = float((~shifted["pass"]).mean())
    print(f"   p_fail {shifted['p_fail']:.3e} +- "
          f"{shifted['p_fail_se']:.1e}   n_eff {shifted['n_eff']:.0f}")
    print(f"   {frac * 100:.0f}% of lanes landed in the failure region")
    sig_eq = -_ndtri(shifted["p_fail"])
    print(f"   equivalent spec margin: {sig_eq:.2f} sigma")

    print("== design centering: recover a 4-sigma margin ==")
    centered, hist = sim.center_design(
        SIGMA, [{"probe": "out", "at": 3.5e-9, "high": V_SPEC}],
        ["mos_k"], target_beta=4.0, steps=8, lr=0.08)
    k0 = float(sim.params["mos_k"][0])
    k1 = float(centered["mos_k"][0])
    print(f"   beta {hist[0]['betas'][0]:.2f} -> "
          f"{hist[-1]['betas'][0]:.2f} in {len(hist)} FORM iterations")
    print(f"   MOS K (drive strength) {k0:.3e} -> {k1:.3e} "
          f"({(k1 / k0 - 1) * 100:+.0f}%)")


def _ndtri(p):
    from scipy.stats import norm
    return float(norm.ppf(p))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
