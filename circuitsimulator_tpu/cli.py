"""Command-line driver, mirroring the reference CLI (src/main.cpp):

    mysim <netlist.sp> [tran_out.csv]

prints the circuit summary, DC node-voltage/branch-current tables, then runs
the Backward-Euler transient if a .TRAN card is present (output defaults to
tran_out.csv).  Extra options (beyond the reference) select the platform,
precision, and analyses.
"""

from __future__ import annotations

import argparse
import os
import sys


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="mysim",
        description="TPU-native SPICE-class circuit simulator")
    p.add_argument("netlist", help="SPICE netlist file (.sp)")
    p.add_argument("tran_out", nargs="?", default="tran_out.csv",
                   help="transient CSV output path (default: tran_out.csv)")
    p.add_argument("--engine", choices=["auto", "jax", "native"],
                   default="auto",
                   help="solver engine: 'native' = the C++ reference-scope "
                        "tier (native/csim_solver.cpp — whole buffer.sp run "
                        "in ~16 ms, bitwise-matching the reference CSV); "
                        "'jax' = the full TPU engine; 'auto' (default) "
                        "tries native for plain .op/.tran invocations and "
                        "falls back to jax for anything outside its scope")
    p.add_argument("--platform", choices=["cpu", "tpu", "default"],
                   default="cpu",
                   help="JAX platform (default cpu; single-circuit runs "
                        "compile and run fastest on host)")
    p.add_argument("--f32", action="store_true",
                   help="run in float32 (default float64 for reference "
                        "parity)")
    p.add_argument("--no-tran", action="store_true",
                   help="skip the transient analysis even if .TRAN present")
    p.add_argument("--probes-only", action="store_true",
                   help="restrict the transient CSV to the columns named by "
                        ".PLOTNV/.PLOTNC/.PRINT cards (the reference parses "
                        "these cards but always writes every column)")
    p.add_argument("--connectivity", action="store_true",
                   help="print the node connectivity table")
    p.add_argument("--adaptive", action="store_true",
                   help="LTE-controlled adaptive timestep refinement "
                        "(dyadic dt ladder; output stays on the .TRAN grid)")
    p.add_argument("--method", choices=["be", "trap"], default="be",
                   help="transient integration: Backward Euler (reference "
                        "behavior, default) or trapezoidal (2nd order)")
    p.add_argument("--run-mc", metavar="N", type=int, default=None,
                   help="Monte-Carlo over the netlist's DEV=/LOT= "
                        "tolerances: N lanes, one batched solve")
    p.add_argument("--run-mc-out", metavar="CSV", default="mc_out.csv",
                   help="per-lane Monte-Carlo results CSV "
                        "(default mc_out.csv)")
    p.add_argument("--mc-sampler", default="mc",
                   choices=["mc", "lhs", "sobol", "antithetic"],
                   help="Monte-Carlo sampling plan: independent draws "
                        "(mc, default), Latin hypercube, scrambled "
                        "Sobol, or antithetic pairs — the stratified "
                        "plans cut estimator variance at the same N")
    p.add_argument("--raw", metavar="RAWFILE", default=None,
                   help="also write results as an ngspice ASCII rawfile "
                        "(transient/AC/DC-sweep plots appended in order)")
    p.add_argument("--profile", metavar="DIR", default=None,
                   help="capture a jax.profiler trace of the transient "
                        "into DIR (view with TensorBoard / Perfetto)")
    p.add_argument("--stats", metavar="JSON", default=None,
                   help="write structured run metadata (Newton iteration "
                        "histogram, timings) to a JSON file")
    p.add_argument("--frontend", choices=["python", "native", "auto"],
                   default="auto",
                   help="netlist frontend: the C++ parser (native) or the "
                        "pure-Python one (default: auto = native if built)")
    # analyses beyond the reference executable (it parses these cards but
    # never runs them; off by default to keep CLI output parity)
    p.add_argument("--run-ac", metavar="CSV", nargs="?", const="ac_out.csv",
                   help="run the .AC small-signal sweep, write mag/phase CSV")
    p.add_argument("--run-dc-sweep", metavar="CSV", nargs="?",
                   const="dcsweep_out.csv",
                   help="run the .DC sweep card(s), write CSV")
    p.add_argument("--run-noise", metavar="CSV", nargs="?",
                   const="noise_out.csv", default=None,
                   help="run the .NOISE small-signal noise sweep and write "
                        "PSD columns to CSV")
    p.add_argument("--run-step", metavar="CSV", nargs="?",
                   const="step_out.csv",
                   help="run the .STEP sweep as one vmapped batch; CSV has "
                        "one row per step value (.MEASURE columns for "
                        "transient steps, node voltages for .OP steps)")
    p.add_argument("--run-loop-gain", metavar="E_SOURCE", default=None,
                   help="loop-gain (Bode return ratio) of the named "
                        "VCVS over the .AC sweep: prints phase/gain "
                        "margins, writes loopgain.csv (f, |T| dB, deg)")
    p.add_argument("--run-noise-figure", metavar="RESISTOR", default=None,
                   help="noise figure referred to the named source "
                        "resistor over the .NOISE/.AC sweep: prints the "
                        "flat-band NF, writes nf.csv")
    p.add_argument("--run-group-delay", metavar="NODE", default=None,
                   help="exact group delay of V(NODE) over the .AC "
                        "sweep (gradient through the solve), writes "
                        "groupdelay.csv")
    p.add_argument("--run-hb", metavar="CSV", nargs="?", const="hb_out.csv",
                   help="run .hb periodic steady state, write one period "
                        "CSV and print the harmonic table")
    p.add_argument("--hb-method", choices=["shooting", "hb"],
                   default="shooting",
                   help="steady-state algorithm: time-domain Newton "
                        "shooting or frequency-domain harmonic balance")
    p.add_argument("--hb-solver", choices=["dense", "gmres"],
                   default="dense",
                   help="HB linear solver (--hb-method hb, single tone): "
                        "dense (K·N)² Jacobian, or matrix-free "
                        "preconditioned GMRES for large harmonic-count × "
                        "node-count products")
    p.add_argument("--run-osc", metavar="F0:NODE[:CSV]", default=None,
                   help="free-running oscillator steady state: guess "
                        "frequency + anchor node, e.g. '5e6:a' or "
                        "'5e6:a:osc.csv'; prints the solved f0 and the "
                        "harmonic table, writes one period "
                        "(default osc_out.csv)")
    p.add_argument("--osc-method", choices=["auto", "shooting", "hb"],
                   default="auto",
                   help="oscillator solver: time-domain shooting or "
                        "autonomous harmonic balance (auto = hb when the "
                        "deck has transmission lines, else shooting)")
    p.add_argument("--run-sparams", metavar="PORTS", default=None,
                   help="S-parameter extraction over the .AC sweep: "
                        "comma-separated ports 'p[:m][@z0]', e.g. "
                        "'in,out' or 'in:0@50,out:0@75' (m defaults to "
                        "ground, z0 to 50); writes Touchstone .sNp")
    p.add_argument("--sparams-out", metavar="FILE", default=None,
                   help="Touchstone output path (default sparams.s<N>p)")
    p.add_argument("--run-envelope", metavar="TSTOP:DT[:CSV]", default=None,
                   help="envelope-following transient at the .hb carrier: "
                        "slow-axis step DT to TSTOP, e.g. '5e-6:1e-7' or "
                        "'5e-6:1e-7:env.csv'; writes per-node fundamental-"
                        "envelope magnitude/phase columns "
                        "(default env_out.csv)")
    p.add_argument("--env-order", type=int, choices=[1, 2], default=1,
                   help="envelope integrator: 1 = backward Euler, "
                        "2 = trapezoidal")
    p.add_argument("--run-hot-sparams", metavar="PORTS", default=None,
                   help="periodic (hot) S-parameters around the .hb PSS: "
                        "same port grammar as --run-sparams; offset "
                        "frequencies from --psp-deltas; writes the "
                        "conversion scattering entries "
                        "(default hot_sparams.csv)")
    p.add_argument("--psp-deltas", metavar="D1,D2,...", default=None,
                   help="offset frequencies for --run-hot-sparams")
    p.add_argument("--psp-sidebands", type=int, default=1,
                   help="sidebands -M..M kept in --run-hot-sparams")
    p.add_argument("--hot-sparams-out", metavar="CSV", default=None,
                   help="CSV path for --run-hot-sparams "
                        "(default hot_sparams.csv)")
    p.add_argument("--pss-stability", action="store_true",
                   help="with --run-hb (shooting method): also compute "
                        "the Floquet multipliers of the periodic "
                        "solution and report attractor/repellor")
    p.add_argument("--run-lock", metavar="F0:ANCHOR:INJ:AMP",
                   default=None,
                   help="oscillator injection-locking range: shooting "
                        "guess frequency, anchor node, injection node, "
                        "injected current amplitude (A), e.g. "
                        "'5e6:a:a:1e-3'; prints the solved f0 and the "
                        "one-sided Adler lock range")
    p.add_argument("--run-subharmonic-lock", metavar="F0:ANCHOR:INJ:AMP:M",
                   default=None,
                   help="subharmonic injection-locking window "
                        "(f_osc = M*f_inj, injection near f0/M) by "
                        "driven-HB fold search, e.g. '5e6:a:a:10m:2'; "
                        "prints the locked frequency window")
    p.add_argument("--run-lssp", metavar="PORTS", default=None,
                   help="large-signal S-parameters on the .hb carrier: "
                        "comma-separated Thevenin ports 'SRC:NODE[@z0]' "
                        "(V source + series z0 resistor in the deck), "
                        "driven at --lssp-power; prints the S matrix")
    p.add_argument("--lssp-power", type=float, default=1e-3,
                   help="available drive power in watts for --run-lssp")
    p.add_argument("--lssp-powers", metavar="P1,P2,...", default=None,
                   help="power SWEEP for --run-lssp: comma-separated "
                        "available powers in watts, the whole "
                        "compression curve solved as ONE batched HB "
                        "dispatch (Simulator.lssp_batched); prints "
                        "|Sij| per power")
    p.add_argument("--mc-rf", metavar="N", type=int, default=None,
                   help="Monte-Carlo lanes for the RF analyses: with "
                        "--run-hot-sparams runs monte_carlo_psp, with "
                        "--run-lssp runs monte_carlo_lssp (honors "
                        "--lssp-powers), with --run-envelope runs "
                        "monte_carlo_envelope — each as one batched "
                        "program over the netlist's DEV=/LOT= "
                        "tolerances; prints mean/std summaries "
                        "(--mc-sampler selects the sampling plan)")
    return p


def _raw_mode(args) -> str:
    """First --raw write truncates, later plots append (multi-plot
    rawfiles are standard ngspice)."""
    mode = "a" if getattr(args, "_raw_written", False) else "w"
    args._raw_written = True
    return mode


def main(argv=None) -> int:
    parser = build_argparser()
    args = parser.parse_args(argv)

    # Native solver tier: a plain `mysim <deck> [out.csv]` invocation of a
    # reference-scope deck runs the C++ binary — whole-run latency in the
    # reference binary's own class (~16 ms for buffer.sp vs its 24 ms)
    # instead of paying the Python/JAX startup.  Exit code 3 = deck
    # outside the native scope -> fall through to the JAX engine.  Any
    # non-default flag (other than --engine itself) forces jax.
    if args.engine in ("auto", "native"):
        plain = all(
            getattr(args, a.dest) == a.default
            for a in parser._actions
            if a.dest not in ("help", "netlist", "tran_out", "engine"))
        if plain or args.engine == "native":
            from .native import solver_binary
            binp = solver_binary()
            if binp is not None:
                import subprocess
                # relay through Python's stdio objects (not the raw fds)
                # so redirection/capture of sys.stdout sees the output
                r = subprocess.run([binp, args.netlist, args.tran_out],
                                   capture_output=True, text=True)
                if r.returncode != 3:
                    sys.stdout.write(r.stdout)
                    sys.stderr.write(r.stderr)
                    return r.returncode
            elif args.engine == "native":
                print("native solver unavailable (g++ build failed)",
                      file=sys.stderr)
                return 1

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    elif args.platform == "tpu":
        pass  # leave the environment's TPU platform in place
    if not args.f32:
        jax.config.update("jax_enable_x64", True)
    # Persistent compilation cache: the reference runs buffer.sp end-to-end
    # in 24 ms (main.cpp:15-112); a cold jitted CLI run is compile-dominated
    # (tens of seconds).  Caching compiled executables across invocations
    # cuts warm runs to trace+load time.  CSIM_CACHE=0 disables;
    # bench.py shares the same default dir.
    cache_dir = os.environ.get("CSIM_CACHE", "/tmp/jax_bench_cache")
    if cache_dir and cache_dir != "0":
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              0.2)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        except Exception:  # noqa: BLE001 — older jax without the knobs
            pass

    from .api import Simulator
    from .utils.options import DEFAULT_OPTIONS

    opts = None
    if args.method != "be":
        import jax.numpy as jnp
        opts = DEFAULT_OPTIONS.replace(
            dtype=jnp.float64 if not args.f32 else jnp.float32,
            tran_method=args.method)

    print(f"Reading netlist: {args.netlist}")
    try:
        sim = Simulator.from_file(args.netlist, opts=opts,
                                  frontend=args.frontend)
    except FileNotFoundError:
        print("parseNetlist() failed.", file=sys.stderr)
        return 1

    print(sim.summary())
    if args.connectivity:
        print()
        print(sim.circuit.connectivity_report())
    print("\nRunning DC operating point...")
    try:
        x = sim.dc()
    except Exception as e:  # noqa: BLE001 — mirror reference's catch-all
        print(f"DC solve failed: {e}", file=sys.stderr)
        return 1
    print(sim.dc_report(x))
    print("\nDC analysis finished.")

    tran = sim.config.tran
    if tran.enabled and not args.no_tran:
        print("\nRunning transient analysis (Backward Euler)...")
        print(f"  .TRAN: tstep={tran.tstep:.6e}, tstop={tran.tstop:.6e}, "
              f"tstart={tran.tstart:.6e}")
        print(f"  output file: {args.tran_out}")
        n = int(tran.tstop / tran.tstep + 1e-12)
        print(f"[TRAN] tstep={tran.tstep:.6e}, tstop={tran.tstop:.6e}, "
              f"tstart={tran.tstart:.6e}")
        print(f"[TRAN] total steps = {n}")
        try:
            import contextlib
            import time
            prof = (jax.profiler.trace(args.profile)
                    if args.profile else contextlib.nullcontext())
            t0 = time.time()
            with prof:
                res = sim.transient(adaptive=args.adaptive)
                res.x_final.block_until_ready()
            wall = time.time() - t0
            if args.profile:
                print(f"Profiler trace written to '{args.profile}'.")
            sim.write_transient_csv(args.tran_out, res,
                                    probes_only=args.probes_only)
            if args.raw:
                sim.write_raw(args.raw, res, mode=_raw_mode(args))
        except Exception as e:  # noqa: BLE001
            print(f"Transient failed: {e}", file=sys.stderr)
            return 1
        print("Transient analysis (Backward Euler) finished. "
              f"Results written to '{args.tran_out}'.")
        if any(m.analysis == "tran" for m in sim.config.measures):
            from .analysis.measure import measure_report
            try:
                print()
                print(measure_report(sim.measure(res)))
            except Exception as e:  # noqa: BLE001
                print(f".MEASURE failed: {e}", file=sys.stderr)
        if sim.config.four.enabled:
            from .analysis.fourier import fourier_table
            try:
                print()
                print(fourier_table(sim.fourier(res)))
            except Exception as e:  # noqa: BLE001
                print(f".FOUR analysis failed: {e}", file=sys.stderr)
        if args.stats:
            from .io.metadata import transient_metadata, write_metadata
            write_metadata(args.stats,
                           transient_metadata(sim, res, wall_s=wall,
                                              extra={"netlist": args.netlist}))
            print(f"Run metadata written to '{args.stats}'.")
    else:
        print("\nNo .TRAN card; transient analysis skipped.")

    if args.run_ac:
        from .analysis.ac import write_ac_csv
        print("\nRunning AC small-signal sweep...")
        try:
            acres = sim.ac(x_op=x)
            ac_sel = None
            if args.probes_only:
                from .io.csvout import probe_selection
                ac_sel = probe_selection(sim.topo, sim.config.print_commands,
                                         analysis="ac") or None
            write_ac_csv(args.run_ac, sim.topo, acres, selection=ac_sel)
            if args.raw:
                sim.write_raw(args.raw, acres, mode=_raw_mode(args))
            print(f"AC sweep finished ({len(acres.freqs)} points). "
                  f"Results written to '{args.run_ac}'.")
            if any(m.analysis == "ac" for m in sim.config.measures):
                from .analysis.measure import measure_report
                print()
                print(measure_report(sim.measure(acres, analysis="ac")))
        except Exception as e:  # noqa: BLE001
            print(f"AC failed: {e}", file=sys.stderr)
            return 1

    if sim.config.pz.enabled:
        try:
            from .analysis.pz import pz_table
            print()
            print(pz_table(sim.pole_zero(x_op=x)))
        except Exception as e:  # noqa: BLE001
            print(f".PZ failed: {e}", file=sys.stderr)

    if sim.config.sens.enabled:
        try:
            _, rows = sim.sensitivity(x_op=x)
            out = sim.config.sens.out_node
            ref = sim.config.sens.ref_node
            probe = f"V({out},{ref})" if ref else f"V({out})"
            print(f"\n==== DC sensitivities of {probe} ====")
            for label, g, gn in rows[:15]:
                print(f"{label:>24s} = {g: .6e}   (p*dV/dp = {gn: .6e})")
        except Exception as e:  # noqa: BLE001
            print(f".SENS failed: {e}", file=sys.stderr)

    if sim.config.tf.enabled:
        try:
            from .analysis.tf import tf_report
            cfg = sim.config.tf
            if cfg.out_kind == "v":
                out_label = (f"V({cfg.out_node},{cfg.ref_node})"
                             if cfg.ref_node else f"V({cfg.out_node})")
            else:
                out_label = f"I({cfg.out_element})"
            print()
            print(tf_report(sim.tf(x_op=x), out_label, cfg.input_source))
        except Exception as e:  # noqa: BLE001
            print(f".TF failed: {e}", file=sys.stderr)

    if args.run_noise:
        from .analysis.noise import write_noise_csv
        print("\nRunning noise analysis...")
        try:
            nres = sim.noise(x_op=x)
            write_noise_csv(args.run_noise, nres)
            print(f"noise sweep finished ({len(nres.freqs)} points). "
                  f"Results written to '{args.run_noise}'.")
        except Exception as e:  # noqa: BLE001
            print(f"noise analysis failed: {e}", file=sys.stderr)
            return 1

    if args.run_dc_sweep:
        from .analysis.sweep import write_sweep_csv
        print("\nRunning DC sweep...")
        try:
            swres = sim.dc_sweep()
            write_sweep_csv(args.run_dc_sweep, sim.topo, swres)
            if args.raw:
                sim.write_raw(args.raw, swres, mode=_raw_mode(args))
            print(f"DC sweep of {swres.source} finished "
                  f"({len(swres.values)} points). "
                  f"Results written to '{args.run_dc_sweep}'.")
            if any(m.analysis == "dc" for m in sim.config.measures):
                from .analysis.measure import measure_report
                print()
                print(measure_report(sim.measure(swres, analysis="dc")))
        except Exception as e:  # noqa: BLE001
            print(f"DC sweep failed: {e}", file=sys.stderr)
            return 1

    if args.run_loop_gain:
        import numpy as _np
        try:
            lg = sim.loop_gain(args.run_loop_gain)
            T = lg["T"]
            with open("loopgain.csv", "w") as f:
                f.write("freq,mag_db,phase_deg\n")
                for fr, t in zip(_np.asarray(lg["freqs"]), T):
                    f.write(f"{fr:.9e},{20 * _np.log10(abs(t)):.6f},"
                            f"{_np.degrees(_np.angle(t)):.6f}\n")
            pm = lg["phase_margin_deg"]
            gm = lg["gain_margin_db"]
            print(f"\nLoop gain of {args.run_loop_gain}: "
                  f"|T(0)| = {20 * _np.log10(abs(T[0])):.2f} dB")
            print(f"  unity crossover: "
                  + (f"{lg['f_unity']:.4g} Hz, phase margin {pm:.2f} deg"
                     if pm is not None else "not reached in sweep"))
            print(f"  gain margin: "
                  + (f"{gm:.2f} dB at {lg['f_180']:.4g} Hz"
                     if gm is not None else "no -180 deg crossing"))
            print("  written to 'loopgain.csv'.")
        except Exception as e:  # noqa: BLE001
            print(f"loop-gain analysis failed: {e}", file=sys.stderr)
            return 1

    if args.run_noise_figure:
        import numpy as _np
        try:
            fr, nf = sim.noise_figure(args.run_noise_figure)
            with open("nf.csv", "w") as f:
                f.write("freq,nf_db\n")
                for a, b in zip(fr, nf):
                    f.write(f"{a:.9e},{b:.6f}\n")
            print(f"\nNoise figure (ref {args.run_noise_figure}): "
                  f"{nf.min():.3f} .. {nf.max():.3f} dB; "
                  "written to 'nf.csv'.")
        except Exception as e:  # noqa: BLE001
            print(f"noise-figure analysis failed: {e}", file=sys.stderr)
            return 1

    if args.run_group_delay:
        import numpy as _np
        try:
            fr, tau = sim.group_delay(args.run_group_delay)
            with open("groupdelay.csv", "w") as f:
                f.write("freq,tau_s\n")
                for a, b in zip(fr, tau):
                    f.write(f"{a:.9e},{b:.9e}\n")
            print(f"\nGroup delay of V({args.run_group_delay}): "
                  f"{tau.max() * 1e9:.4g} ns max; "
                  "written to 'groupdelay.csv'.")
        except Exception as e:  # noqa: BLE001
            print(f"group-delay analysis failed: {e}", file=sys.stderr)
            return 1

    if args.run_mc:
        import numpy as _np
        n = args.run_mc
        print(f"\nRunning Monte-Carlo ({n} lanes, one batched solve)...")
        try:
            _, out = sim.monte_carlo(n, sampler=args.mc_sampler)
            if isinstance(out, dict):
                names = list(out)
                cols = [_np.asarray(out[k]).ravel() for k in names]
                with open(args.run_mc_out, "w") as f:
                    f.write("lane," + ",".join(names) + "\n")
                    for i in range(n):
                        f.write(f"{i}," + ",".join(f"{c[i]:.9e}"
                                                   for c in cols) + "\n")
                print("\n==== Monte-Carlo measure statistics ====")
                for k, c in zip(names, cols):
                    print(f"  {k:>16s}: mean={c.mean():.6g} "
                          f"std={c.std():.6g} min={c.min():.6g} "
                          f"max={c.max():.6g}")
            else:
                xs = _np.asarray(out)
                eqs = _np.asarray(sim.topo.volt_col_eqs, int)
                names = [f"V({nm})" for nm in sim.topo.volt_col_names]
                with open(args.run_mc_out, "w") as f:
                    f.write("lane," + ",".join(names) + "\n")
                    for i in range(n):
                        f.write(f"{i}," + ",".join(
                            f"{v:.9e}" for v in xs[i, eqs]) + "\n")
                print("\n==== Monte-Carlo DC statistics ====")
                for j, nm in enumerate(names):
                    c = xs[:, eqs[j]]
                    print(f"  {nm:>16s}: mean={c.mean():.6g} "
                          f"std={c.std():.6g}")
            print(f"Monte-Carlo finished. Per-lane results written to "
                  f"'{args.run_mc_out}'.")
        except Exception as e:  # noqa: BLE001
            print(f"Monte-Carlo failed: {e}", file=sys.stderr)
            return 1

    if args.run_step:
        from .analysis.step import write_step_csv
        print("\nRunning .STEP sweep (vmapped batch)...")
        try:
            sres = sim.step()
            write_step_csv(args.run_step, sim.topo, sres)
            print(f".STEP {sres.kind} {sres.name} finished "
                  f"({len(sres.values)} values, analysis={sres.analysis}). "
                  f"Results written to '{args.run_step}'.")
        except Exception as e:  # noqa: BLE001
            print(f".STEP failed: {e}", file=sys.stderr)
            return 1

    if args.run_hb:
        from .analysis.sstate import harmonic_table
        from .io.csvout import write_transient_csv
        print(f"\nRunning periodic steady state ({args.hb_method})...")
        try:
            multi_card = bool(getattr(sim.config.hb, "extra_tones", []))
            if multi_card and args.hb_method != "hb":
                print("multi-tone .hb card: using the MPDE harmonic-balance "
                      "solver (shooting is single-tone only)")
            if multi_card:
                hbres = sim.harmonic_balance()
            elif args.hb_method == "hb":
                hbres = sim.harmonic_balance(solver=args.hb_solver)
            else:
                hbres = sim.steady_state()
            from .analysis.hbmulti import HBMultiResult
            if isinstance(hbres, HBMultiResult):
                # multi-tone card: write the reconstructed quasi-periodic
                # waveform over one period of the slowest tone
                from .analysis.hbmulti import evaluate
                import numpy as _np
                f_min = min(f for f, _ in hbres.tones)
                ts = _np.linspace(0.0, 1.0 / f_min, 512, endpoint=False)
                xs = evaluate(hbres, ts)
                write_transient_csv(args.run_hb, sim.topo, ts, xs)
                print(f"multi-tone steady state: tones={hbres.tones}, "
                      f"residual={float(hbres.residual):.3e}, "
                      f"converged={bool(hbres.converged)}")
            else:
                write_transient_csv(args.run_hb, sim.topo,
                                    hbres.times, hbres.xs)
                print(f"steady state: residual={float(hbres.residual):.3e}, "
                      f"newton_iters={hbres.newton_iters}, "
                      f"converged={bool(hbres.converged)}")
                print(harmonic_table(sim.topo, hbres))
                if args.pss_stability and getattr(hbres, "s", None) is None:
                    print("--pss-stability needs the shooting method "
                          "(--hb-method shooting); skipped",
                          file=sys.stderr)
                elif args.pss_stability:
                    st = sim.pss_stability(ss=hbres)
                    tag = ("stable (attractor)" if st.stable else
                           "UNSTABLE — the transient flow cannot settle "
                           "on this solution")
                    print(f"Floquet: |lambda|_max = {st.lambda_max:.6f} "
                          f"-> {tag}")
            print(f"One period written to '{args.run_hb}'.")
        except Exception as e:  # noqa: BLE001
            print(f"Steady state failed: {e}", file=sys.stderr)
            return 1

    if args.run_osc:
        from .analysis.sstate import harmonic_table
        from .io.csvout import write_transient_csv
        from .utils.numbers import parse_spice_number
        import numpy as _np
        try:
            parts = args.run_osc.split(":")
            if len(parts) < 2:
                raise ValueError("--run-osc needs F0:NODE[:CSV]")
            f0g = float(parse_spice_number(parts[0]))
            node = parts[1]
            out = parts[2] if len(parts) > 2 else "osc_out.csv"
            method = args.osc_method
            if method == "auto":
                method = "hb" if sim.engine.n_tl else "shooting"
            print(f"\nRunning oscillator steady state ({method})...")
            osc = (sim.oscillator_hb(f0g, node, solver=args.hb_solver)
                   if method == "hb" else sim.oscillator(f0g, node))
            print(f"oscillator: f0={float(osc.f0):.9e} Hz, "
                  f"residual={float(osc.residual):.3e}, "
                  f"newton_iters={osc.newton_iters}, "
                  f"converged={bool(osc.converged)}")
            write_transient_csv(out, sim.topo, osc.times, osc.xs)
            if hasattr(osc, "spectrum"):
                print(harmonic_table(sim.topo, osc))
            else:
                # shooting result: one-sided spectrum from the uniform
                # period samples (last row repeats the first)
                xs_p = _np.asarray(osc.xs)[:-1]
                K = xs_p.shape[0]
                co = _np.fft.rfft(xs_p, axis=0) / K * 2.0
                co[0] /= 2.0
                co = co[:11]          # table up to the 10th harmonic
                tbl = type("S", (), {})()
                tbl.spectrum = co
                tbl.freqs = _np.arange(co.shape[0]) * float(osc.f0)
                print(harmonic_table(sim.topo, tbl))
            print(f"One period written to '{out}'.")
        except Exception as e:  # noqa: BLE001
            print(f"Oscillator failed: {e}", file=sys.stderr)
            return 1

    if args.run_sparams:
        from .analysis.sparams import write_touchstone
        print("\nRunning S-parameter extraction...")
        try:
            ports = []
            for spec in args.run_sparams.split(","):
                spec = spec.strip()
                z0 = 50.0
                if "@" in spec:
                    spec, z0txt = spec.split("@", 1)
                    z0 = float(z0txt)
                pm = spec.split(":", 1)
                node_p = pm[0]
                node_m = pm[1] if len(pm) > 1 else None
                ports.append((node_p, node_m, z0))
            sres = sim.sparams(ports, x_op=x)
            out = args.sparams_out or f"sparams.s{len(ports)}p"
            write_touchstone(out, sres)
            print(f"S-parameters ({len(ports)} ports, "
                  f"{len(sres.freqs)} points) written to '{out}'.")
        except Exception as e:  # noqa: BLE001
            print(f"S-parameter extraction failed: {e}", file=sys.stderr)
            return 1

    if args.run_envelope:
        import numpy as _np
        print("\nRunning envelope transient...")
        try:
            parts = args.run_envelope.split(":")
            if len(parts) < 2:
                raise ValueError("--run-envelope wants TSTOP:DT[:CSV]")
            t_stop, dt_env = float(parts[0]), float(parts[1])
            out = parts[2] if len(parts) > 2 else "env_out.csv"
            env = sim.envelope(t_stop, dt_env, order=args.env_order)
            names = list(sim.topo.volt_col_names)
            eqs = list(sim.topo.volt_col_eqs)
            with open(out, "w") as fh:
                cols = ["time"]
                for n in names:
                    cols += [f"|V({n})@f0|", f"argV({n})@f0(deg)"]
                fh.write(",".join(cols) + "\n")
                for i, t in enumerate(env.t1):
                    row = [t]
                    for eq in eqs:
                        c = env.coeffs[i, 1, eq]
                        row += [abs(c), _np.degrees(_np.angle(c))]
                    fh.write(",".join(f"{v:.9e}" for v in row) + "\n")
            ok = int(env.converged.sum())
            print(f"Envelope: {len(env.t1)} steps ({ok} converged), "
                  f"fundamental envelopes written to '{out}'.")
            if ok < len(env.t1):
                print(f"warning: {len(env.t1) - ok} envelope steps did "
                      "not converge", file=sys.stderr)
            if args.mc_rf:
                _, benv = sim.monte_carlo_envelope(
                    args.mc_rf, t_stop, dt_env, sampler=args.mc_sampler)
                fin = _np.abs(benv.coeffs[:, -1, 1, :])   # (B, N)
                print(f"==== Monte-Carlo envelope spread "
                      f"({args.mc_rf} lanes, {args.mc_sampler}; "
                      f"|Y1| at t1={benv.t1[-1]:g}) ====")
                for nm, eq in zip(names, eqs):
                    print(f"  V({nm}): {fin[:, eq].mean():.6e} "
                          f"+/- {fin[:, eq].std():.3e}")
        except Exception as e:  # noqa: BLE001
            print(f"Envelope transient failed: {e}", file=sys.stderr)
            return 1

    if args.run_hot_sparams:
        import numpy as _np
        print("\nRunning periodic (hot) S-parameter extraction...")
        try:
            if not args.psp_deltas:
                raise ValueError("--run-hot-sparams needs --psp-deltas")
            deltas = [float(v) for v in args.psp_deltas.split(",")]
            ports = []
            for spec in args.run_hot_sparams.split(","):
                spec = spec.strip()
                z0 = 50.0
                if "@" in spec:
                    spec, z0txt = spec.split("@", 1)
                    z0 = float(z0txt)
                pm = spec.split(":", 1)
                ports.append((pm[0], pm[1] if len(pm) > 1 else None, z0))
            res = sim.hot_sparams(ports, deltas,
                                  n_sidebands=args.psp_sidebands)
            out = args.hot_sparams_out or "hot_sparams.csv"
            n = len(ports)
            hs = list(res.harmonics)
            with open(out, "w") as fh:
                cols = ["delta"]
                for mi in hs:
                    for i in range(n):
                        for mj in hs:
                            for j in range(n):
                                tag = f"{i + 1}@{mi:+d};{j + 1}@{mj:+d}"
                                cols += [f"|S({tag})|", f"argS({tag})deg"]
                fh.write(",".join(cols) + "\n")
                for k, d in enumerate(res.deltas):
                    row = [d]
                    for mi in hs:
                        for i in range(n):
                            for mj in hs:
                                for j in range(n):
                                    s = res.s[k, res.index(i, mi),
                                              res.index(j, mj)]
                                    row += [abs(s),
                                            _np.degrees(_np.angle(s))]
                    fh.write(",".join(f"{v:.9e}" for v in row) + "\n")
            print(f"Hot S-parameters ({n} ports x sidebands "
                  f"{hs[0]}..{hs[-1]}, {len(res.deltas)} offsets) "
                  f"written to '{out}'.")
            if args.mc_rf:
                _, bres = sim.monte_carlo_psp(
                    args.mc_rf, ports, deltas=deltas,
                    n_sidebands=args.psp_sidebands,
                    sampler=args.mc_sampler)
                mag = _np.abs(bres.s)              # (B, F, P, P)
                print(f"==== Monte-Carlo hot-S spread "
                      f"({args.mc_rf} lanes, {args.mc_sampler}) ====")
                for k, d in enumerate(bres.deltas):
                    st = mag[:, k].std(axis=0)
                    mn = mag[:, k].mean(axis=0)
                    ij = _np.unravel_index(_np.argmax(st), st.shape)
                    print(f"  delta={d:g}: widest entry "
                          f"S[{ij[0]},{ij[1]}] = {mn[ij]:.6f} "
                          f"+/- {st[ij]:.3e}")
        except Exception as e:  # noqa: BLE001
            print(f"Hot S-parameter extraction failed: {e}",
                  file=sys.stderr)
            return 1

    if args.run_lock:
        print("\nRunning injection-lock analysis...")
        try:
            parts = args.run_lock.split(":")
            if len(parts) != 4:
                raise ValueError("--run-lock wants F0:ANCHOR:INJ:AMP")
            from .utils.numbers import parse_spice_number
            f0g = parse_spice_number(parts[0])
            amp = parse_spice_number(parts[3])
            il = sim.injection_lock(parts[2], amp, f0_guess=f0g,
                                    anchor_node=parts[1])
            print(f"Free-running f0 = {il.f0:.6e} Hz")
            print(f"Injection {amp:g} A at '{parts[2]}': one-sided lock "
                  f"range = {il.lock_range_hz:.4e} Hz "
                  f"({il.k_per_amp:.4e} Hz/A)")
        except Exception as e:  # noqa: BLE001
            print(f"Injection-lock analysis failed: {e}", file=sys.stderr)
            return 1

    if args.run_subharmonic_lock:
        print("\nRunning subharmonic injection-lock analysis...")
        try:
            parts = args.run_subharmonic_lock.split(":")
            if len(parts) != 5:
                raise ValueError("--run-subharmonic-lock wants "
                                 "F0:ANCHOR:INJ:AMP:M")
            from .utils.numbers import parse_spice_number
            f0g = parse_spice_number(parts[0])
            amp = parse_spice_number(parts[3])
            m = int(parts[4])
            sl = sim.subharmonic_lock(parts[2], amp, m=m, f0_guess=f0g,
                                      anchor_node=parts[1])
            print(f"Free-running f0 = {sl.f0:.6e} Hz")
            print(f"Injection {amp:g} A at '{parts[2]}', order m={m}: "
                  f"locked for f_inj in [{sl.f_lo:.6e}, {sl.f_hi:.6e}] "
                  f"Hz (one-sided {sl.lock_range_hz:.4e} Hz)")
        except Exception as e:  # noqa: BLE001
            print(f"Subharmonic-lock analysis failed: {e}",
                  file=sys.stderr)
            return 1

    if args.run_lssp:
        import numpy as _np
        print("\nRunning large-signal S-parameter extraction...")
        try:
            ports = []
            for spec in args.run_lssp.split(","):
                spec = spec.strip()
                z0 = 50.0
                if "@" in spec:
                    spec, z0txt = spec.split("@", 1)
                    z0 = float(z0txt)
                sn = spec.split(":", 1)
                if len(sn) != 2:
                    raise ValueError("--run-lssp port wants 'SRC:NODE"
                                     "[@z0]'")
                ports.append((sn[0], sn[1], z0))
            n = len(ports)
            powers = ([float(v) for v in args.lssp_powers.split(",")]
                      if args.lssp_powers else [args.lssp_power])
            if args.mc_rf or len(powers) > 1:
                # one batched dispatch over (lanes x powers x ports)
                if args.mc_rf:
                    _, out = sim.monte_carlo_lssp(
                        args.mc_rf, ports, powers=powers,
                        sampler=args.mc_sampler)
                else:
                    out = sim.lssp_batched(ports, powers=powers)
                S = _np.abs(out["s"])              # (B, Pw, n, n)
                tag = (f"{S.shape[0]} MC lanes, " if args.mc_rf else "")
                print(f"==== Large-signal S-parameters "
                      f"({tag}{len(powers)} powers, one dispatch) ====")
                for ip, pw in enumerate(powers):
                    cells = [f"P={pw:g}W"]
                    for i in range(n):
                        for j in range(n):
                            m = S[:, ip, i, j].mean()
                            sd = S[:, ip, i, j].std()
                            cells.append(
                                f"|S{i + 1}{j + 1}|={m:.6f}"
                                + (f"+/-{sd:.2e}" if args.mc_rf else ""))
                    print("  ".join(cells))
            else:
                res = sim.lssp(ports, power=args.lssp_power)
                print(f"==== Large-signal S-parameters "
                      f"(P = {args.lssp_power:g} W) ====")
                for i in range(n):
                    cells = []
                    for j in range(n):
                        s = res["s"][i, j]
                        cells.append(f"S{i + 1}{j + 1} = {abs(s):.6f} "
                                     f"/{_np.degrees(_np.angle(s)):7.2f}deg")
                    print("  ".join(cells))
        except Exception as e:  # noqa: BLE001
            print(f"Large-signal S-parameter extraction failed: {e}",
                  file=sys.stderr)
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
