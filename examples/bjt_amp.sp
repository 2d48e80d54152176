* BJT common-emitter amplifier: Early voltage + junction caps
* shows: NPN model (IS/BF/VAF/CJE/CJC), .TF, .AC Miller rolloff, .NOISE
.MODEL qn NPN IS=1e-15 BF=150 VAF=80 CJE=4p CJC=2p
Vcc vcc 0 DC 12
* note: the SIN v0 offset folds into the DC value (reference quirk), so
* the bias lives in v0 and DC stays 0
Vin in 0 DC 0 AC 1 SIN 0.935 0.002 10k
Rs in b 600
Rc vcc c 2.2k
Re e 0 100
Q1 c b e qn
.TF V(c) Vin
.AC dec 10 1e2 1e9
.NOISE V(c) Vin dec 5 1e2 1e6
.TRAN 2e-6 5e-4
.MEASURE TRAN vout_pp PP V(c)
.MEASURE AC f3db WHEN VDB(c)=-3 FALL=1
.end
