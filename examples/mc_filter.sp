* Sallen-Key-ish RC filter with manufacturing tolerances
* shows: DEV=/LOT= Monte-Carlo tolerances, .FUNC, --run-mc N
* run: python -m circuitsimulator_tpu examples/mc_filter.sp out.csv --run-mc 1024
.FUNC fc(r,c) {1/(2*pi*r*c)}
.PARAM rnom=1.59k
V1 in 0 PULSE(0 1 0 1u 1u 1 1)
R1 in mid {rnom} DEV=5% LOT=2%
C1 mid 0 100n DEV=10%
R2 mid out {rnom} DEV=5% LOT=2%
C2 out 0 100n DEV=10%
.TRAN 2e-5 5e-3
.MEASURE TRAN settle WHEN V(out)=0.9 RISE=1
.MEASURE TRAN vfinal FIND V(out) AT=4e-3
.end
