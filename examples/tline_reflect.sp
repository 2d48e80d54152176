* step into a 50-ohm line with an open end: watch the 2x reflection
V1 src 0 PULSE(0 1 0 1p 1p 1 2)
Rs src in 50
T1 in 0 out 0 Z0=50 TD=10n
Ropen out 0 1e9
.MEASURE TRAN arrival WHEN V(out)=0.5 RISE=1
.MEASURE TRAN vpeak MAX V(out)
.TRAN 0.1n 60n
