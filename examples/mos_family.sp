* NMOS output characteristics: Id vs Vds for stepped Vgs
* shows: nested two-source .DC sweep (one batched grid solve), rawfile out
* run: python -m circuitsimulator_tpu examples/mos_family.sp out.csv \
*        --run-dc-sweep family.csv --raw family.raw
.MODEL mn VT 0.7 MU 350u COX 2.3m LAMBDA 0.02
Vds d 0 DC 0
Vgs g 0 DC 0
M1 d g 0 n 10e-6 1e-6 mn
.DC Vds 0 5 0.1 Vgs 1 3 0.5
.end
