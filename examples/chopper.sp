* switch demo: S chops a rail at 1 MHz; W senses the load current
.MODEL swm SW RON=0.1 ROFF=1e9 VT=0.5 VH=0.1
.MODEL cswm CSW RON=10 ROFF=1e9 IT=8m IH=1m
Vc c 0 PULSE(0 1 0 1n 1n 0.5u 1u)
Vdd in 0 DC 5
S1 in out c 0 swm
Vsen out mid 0
Rl mid 0 500
W1 mid 0 Vsen cswm
.MEASURE TRAN vrms RMS V(mid) FROM=0 TO=3u
.TRAN 5n 3u
