* delay-line oscillator: inverting saturating amp + matched 50-ohm line.
* round-trip phase pi at w*TD  =>  f0 ~ 1/(2 TD) = 100 MHz (pulled low by
* the smoothing pole at node a).  run:
*   python -m circuitsimulator_tpu examples/delay_osc.sp --run-osc 1e8:a
* (auto-selects autonomous harmonic balance: the shooting path cannot
* trace a dt-dependent delay ring through the period unknown)
Bamp b 0 V=-3.0*v(a)+0.5*v(a)^3
Rb b bl 50
T1 bl 0 a 0 Z0=50 TD=5n
Ra a 0 50
Ca a 0 2p
.op
