* Two-pole feedback loop with an ESR zero — loop-gain / margin demo
* Run:  python -m circuitsimulator_tpu examples/feedback_loop.sp out.csv \
*           --run-loop-gain E1 --run-group-delay out
* The error amp (E1, 80 dB) drives a dominant pole at 16 Hz; the load
* pole sits at 16 kHz and the ESR resistor adds a stabilizing zero at
* 160 kHz.  The CLI prints the unity-gain crossover and phase margin
* and writes loopgain.csv / groupdelay.csv for plotting.
Vref in 0 DC 1 AC 1
E1 a 0 in out 10k
Rdom a b 100k
Cdom b 0 100n
EB1 c 0 b 0 1
Rload c out 1k
Cload out esr 10n
Resr esr 0 100
.AC DEC 20 0.1 10e6
.end
