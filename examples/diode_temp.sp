* diode turn-on across temperature
V1 in 0 DC 0
R1 in a 1k
D1 a 0 IS=1e-14
.DC V1 0 2 0.02
.STEP TEMP LIST -40 27 125
.MEASURE DC von WHEN V(a)=0.6 RISE=1
.op
