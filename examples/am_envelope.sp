* AM modulator into an RC load — envelope-following transient demo.
* The 10 MHz carrier is amplitude-modulated by a slow PWL ramp through a
* behavioral multiplier; the brute-force transient needs ~100 steps per
* carrier cycle while the envelope analysis steps the harmonic envelopes
* directly on the modulation time scale:
*   python -m circuitsimulator_tpu examples/am_envelope.sp out.csv \
*       --run-envelope 5e-6:1e-7:env.csv --env-order 2
* Columns of env.csv: per-node fundamental-envelope magnitude/phase.
* Also a hot S-parameter demo port pair (rf drives the multiplier too):
*   --run-hot-sparams m --psp-deltas 1e5
Vc carr 0 SIN 0 1 10e6
Rc carr 0 1k
Vb base 0 PWL(0 0.1 5e-6 1.0)
Rb base 0 1k
Bm m 0 V=v(base)*v(carr)
Rr m out 1k
Cc out 0 0.159n
.hb 10e6 5
.TRAN 10n 2u
.end
