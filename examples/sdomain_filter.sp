* Behavioral s-domain filter chain: anti-alias lowpass + notch
* shows: E LAPLACE transfer-function sources with {.PARAM} coefficients,
*        .FUNC, .MEASURE AC corner extraction
* run: python -m circuitsimulator_tpu examples/sdomain_filter.sp out.csv \
*        --run-ac ac.csv
.PARAM f0=10k w0={2*pi*f0}
.PARAM fn=50 wn={2*pi*fn}
.FUNC invsq(x) {1/(x*x)}
Vin in 0 AC 1 SIN 0 1 1k
* 2nd-order Butterworth lowpass at f0
E1 lp 0 LAPLACE in 0 1 / 1 {sqrt(2)/w0} {invsq(w0)}
* 50 Hz notch (Q = 10) cascaded after it
E2 out 0 LAPLACE lp 0 1 0 {invsq(wn)} / 1 {1/(10*wn)} {invsq(wn)}
Rl out 0 10k
.AC dec 10 1 1e6
.TRAN 2e-5 5e-3
.MEASURE AC f3db WHEN VDB(out)=-3 FALL=LAST
.MEASURE AC notch MIN_AT VM(out) FROM=10 TO=500
.end
