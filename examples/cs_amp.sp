* MOS common-source amplifier: .TF / .SENS / .AC / .MEASURE AC
.MODEL nm1 vt 0.7 mu 350u cox 2.3m lambda 0.02
Vdd vdd 0 DC 5
Vin g 0 DC 1.5 AC 1
Rd vdd d 10k
Cl d 0 10p
M1 d g 0 nm1 1000u 1u
.TF V(d) Vin
.SENS V(d)
.AC dec 20 1e3 1e9
.MEASURE AC f3db WHEN VDB(d)=13.1 FALL=1
.op
