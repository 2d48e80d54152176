* RC step response; .STEP the resistance, measure the rise time per step
.PARAM rr=1k tau={rr*1n}
V1 in 0 PULSE(0 1 0 1n 1n 1 2)
R1 in out {rr}
C1 out 0 1n
.STEP PARAM rr LIST 500 1k 2k 4k
.MEASURE TRAN t63 WHEN V(out)=0.632 RISE=1
.MEASURE TRAN t90 WHEN V(out)=0.9 RISE=1
.TRAN 10n 20u
