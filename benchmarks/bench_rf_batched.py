#!/usr/bin/env python
"""Batched RF stack throughput on one TPU chip (VERDICT r2 item 4):
Monte-Carlo hot S-parameters (periodic_s_parameters_batched), one-
dispatch LSSP power sweeps (lssp_batched), and the Monte-Carlo envelope
(envelope_transient_batched) — lanes/s for the three analyses that used
to solve per-lane on the host.

Prints one JSON line.  Env: BENCH_PSP_B (default 1024), BENCH_LSSP_B
(128 MC lanes x 8 powers x 2 ports), BENCH_ENV_B (256),
BENCH_PLATFORM=cpu to force CPU.  The reference has no RF analyses at
all (empty src/sstateanalysis.cpp) — these are capability numbers, not
baselines to beat.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

F0 = 10e6

MIXER = f"""* up-converter (tests/test_psp.py closed-form deck)
VLO lo 0 SIN 0 0.4 {F0}
RLO lo 0 1k
R1 rf 0 100 DEV=5%
R2 if 0 130 DEV=5%
B1 0 if I=v(rf)*v(lo)
.hb {F0} 5
"""

LSSP = f"""* compressive two-port
V1 s1 0 SIN 0 1 {F0}
RS1 s1 p1 50
V2 s2 0 SIN 0 1 {F0}
RS2 s2 p2 50
R3 p1 p2 100 DEV=5%
RL p2 0 200 DEV=5%
C2 p2 0 1n
B1 p2 0 I=0.5*v(p2)^3
.hb {F0} 6
"""

ENV = f"""* AM step into RC
Vc carr 0 SIN 0 1 1e6
Rc carr 0 1k
Vb base 0 PULSE(0.5 1.0 0 1e-9 1e-9 1 1)
Rb base 0 1k
Bm m 0 V=v(base)*v(carr)
Rr m out 1k DEV=5%
Cc out 0 159.15e-12 DEV=5%
.op
"""


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    plat = os.environ.get("BENCH_PLATFORM")
    import jax
    if plat:
        jax.config.update("jax_platforms", plat)
    import numpy as np
    cache_dir = os.environ.get("BENCH_CACHE", "/tmp/jax_bench_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass
    from circuitsimulator_tpu import Simulator

    log(f"device: {jax.devices()[0]}")
    out = {"metric": "batched_rf_lanes_per_sec", "unit": "lanes/s/chip"}

    # ---- Monte-Carlo hot S-params ----
    B = int(os.environ.get("BENCH_PSP_B", 1024))
    sim = Simulator.from_text(MIXER)
    ports = [("rf", None, 50.0), ("if", None, 50.0)]
    deltas = [1.3e5, 2.3e5, 3.1e5, 4.7e5]
    t0 = time.time()
    bp, res = sim.monte_carlo_psp(B, ports, deltas=deltas, seed=0,
                                  tol=1e-6)
    t1 = time.time()
    ok = np.isfinite(res.s).all()
    # warm second call (jit cache persists within the process)
    t2 = time.time()
    bp, res = sim.monte_carlo_psp(B, ports, deltas=deltas, seed=1,
                                  tol=1e-6)
    t3 = time.time()
    rate = B / (t3 - t2)
    log(f"[psp] B={B} F={len(deltas)} KN={11 * sim.engine.N}: cold "
        f"{t1 - t0:.1f}s, warm {t3 - t2:.2f}s -> {rate:,.0f} MC-PSP "
        f"lanes/s (finite={ok})")
    out["mc_psp"] = {"B": B, "n_deltas": len(deltas),
                     "cold_s": round(t1 - t0, 2),
                     "warm_s": round(t3 - t2, 3),
                     "lanes_per_sec": round(rate, 1)}

    # ---- one-dispatch LSSP power sweep ----
    Bl = int(os.environ.get("BENCH_LSSP_B", 128))
    sim2 = Simulator.from_text(LSSP)
    lports = [("V1", "p1", 50.0), ("V2", "p2", 50.0)]
    powers = np.logspace(-7, -1.5, 8)
    t0 = time.time()
    bp2, r2 = sim2.monte_carlo_lssp(Bl, lports, powers=powers, seed=0,
                                    tol=1e-6)
    t1 = time.time()
    t2 = time.time()
    bp2, r2 = sim2.monte_carlo_lssp(Bl, lports, powers=powers, seed=1,
                                    tol=1e-6)
    t3 = time.time()
    hb_lanes = Bl * len(powers) * len(lports)
    rate2 = hb_lanes / (t3 - t2)
    conv = float(np.asarray(r2["converged"]).mean())
    log(f"[lssp] {Bl} MC x {len(powers)} powers x {len(lports)} ports = "
        f"{hb_lanes} HB lanes: cold {t1 - t0:.1f}s, warm {t3 - t2:.2f}s "
        f"-> {rate2:,.0f} HB lanes/s (conv {conv:.2f})")
    out["mc_lssp"] = {"B_mc": Bl, "n_powers": len(powers),
                      "hb_lanes": hb_lanes,
                      "cold_s": round(t1 - t0, 2),
                      "warm_s": round(t3 - t2, 3),
                      "hb_lanes_per_sec": round(rate2, 1),
                      "converged_frac": conv}

    # ---- Monte-Carlo envelope ----
    Be = int(os.environ.get("BENCH_ENV_B", 256))
    sim3 = Simulator.from_text(ENV)
    t0 = time.time()
    bp3, r3 = sim3.monte_carlo_envelope(Be, t_stop=2e-6, dt_env=5e-8,
                                        f0=1e6, n_harm=3, seed=0,
                                        tol=1e-6)
    t1 = time.time()
    t2 = time.time()
    bp3, r3 = sim3.monte_carlo_envelope(Be, t_stop=2e-6, dt_env=5e-8,
                                        f0=1e6, n_harm=3, seed=1,
                                        tol=1e-6)
    t3 = time.time()
    n_env = len(r3.t1) - 1
    rate3 = Be * n_env / (t3 - t2)
    log(f"[env] B={Be} x {n_env} envelope steps: cold {t1 - t0:.1f}s, "
        f"warm {t3 - t2:.2f}s -> {rate3:,.0f} envelope lane-steps/s "
        f"(conv {float(r3.converged.mean()):.2f})")
    out["mc_envelope"] = {"B": Be, "env_steps": n_env,
                          "cold_s": round(t1 - t0, 2),
                          "warm_s": round(t3 - t2, 3),
                          "lane_steps_per_sec": round(rate3, 1),
                          "converged_frac": float(r3.converged.mean())}

    # ---- Monte-Carlo periodic noise (adjoint LPTV, r4) ----
    Bn = int(os.environ.get("BENCH_PNOISE_B", 1024))
    simn = Simulator.from_text(MIXER)
    t0 = time.time()
    bpn, rn = simn.monte_carlo_pnoise(Bn, deltas=deltas, out_node="if",
                                      seed=0, tol=1e-6)
    t1 = time.time()
    t2 = time.time()
    bpn, rn = simn.monte_carlo_pnoise(Bn, deltas=deltas, out_node="if",
                                      seed=1, tol=1e-6)
    t3 = time.time()
    okn = bool(np.isfinite(rn.onoise).all() and (rn.onoise > 0).all())
    rate4 = Bn / (t3 - t2)
    log(f"[pnoise] B={Bn} F={len(deltas)}: cold {t1 - t0:.1f}s, warm "
        f"{t3 - t2:.2f}s -> {rate4:,.0f} MC-pnoise lanes/s "
        f"(finite+positive={okn})")
    out["mc_pnoise"] = {"B": Bn, "n_deltas": len(deltas),
                        "cold_s": round(t1 - t0, 2),
                        "warm_s": round(t3 - t2, 3),
                        "lanes_per_sec": round(rate4, 1), "ok": okn}

    # ---- Monte-Carlo oscillator phase noise (r4) ----
    Bo = int(os.environ.get("BENCH_OSCPN_B", 256))
    simo = Simulator.from_text("""* van der pol lc oscillator
L1 a 0 1u DEV=2%
C1 a 0 1n DEV=2%
Rl a 0 2k DEV=5%
Bneg a 0 I=-2m*v(a) + 0.5m*v(a)**3
.op
""")
    t0 = time.time()
    bpo, ro = simo.monte_carlo_oscillator_phase_noise(
        Bo, offsets=[10e3], f0_guess=5e6, anchor_node="a", seed=0)
    t1 = time.time()
    t2 = time.time()
    bpo, ro = simo.monte_carlo_oscillator_phase_noise(
        Bo, offsets=[10e3], f0_guess=5e6, anchor_node="a", seed=1)
    t3 = time.time()
    convo = float(np.asarray(ro.converged).mean())
    rate5 = Bo / (t3 - t2)
    f0s = np.asarray(ro.f0)
    log(f"[oscpn] B={Bo}: cold {t1 - t0:.1f}s, warm {t3 - t2:.2f}s -> "
        f"{rate5:,.0f} MC-oscillator lanes/s (conv {convo:.2f}, "
        f"f0 pull sigma {np.std(f0s) / np.mean(f0s):.3%})")
    out["mc_oscpn"] = {"B": Bo, "cold_s": round(t1 - t0, 2),
                       "warm_s": round(t3 - t2, 3),
                       "lanes_per_sec": round(rate5, 1),
                       "converged_frac": convo,
                       "f0_pull_rel_sigma": float(np.std(f0s)
                                                  / np.mean(f0s))}

    out["value"] = out["mc_psp"]["lanes_per_sec"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
