* diode ring-style single-balanced mixer core (PAC/PNOISE demo):
*   python - <<'PY'
*   from circuitsimulator_tpu import Simulator
*   sim = Simulator.from_file("examples/mixer_rf.sp")
*   res = sim.pac(deltas=[1e5])       # conversion gains to every sideband
*   pn  = sim.pnoise([1e5], out_node="if")   # folded output noise
*   PY
Vlo lo 0 SIN 0.4 0.6 1e7
Rlo lo a 50
Vrf rf 0 DC 0 AC 1
Rrf rf a 50
D1 a if IS=1e-9
Rl if 0 500
Cl if 0 100p
.hb 1e7 10
