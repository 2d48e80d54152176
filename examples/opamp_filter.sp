* Parameterized-subcircuit demo: two-stage Sallen-Key lowpass built from
* a reusable gain-block subckt; corner frequency and Q set per instance
* through PARAMS: expressions (docs/netlist_reference.md, subckt section).
.PARAM fc=10k q=0.707

* unity-gain buffer as a VCVS opamp model (gain set per instance)
.SUBCKT buf inp out PARAMS: av=1e5
Eamp out 0 inp out {av}
.ENDS

* Sallen-Key 2nd-order lowpass: r/c from the requested corner
.SUBCKT sklp in out PARAMS: f=1k qq=0.707 r=10k
.PARAM c1={qq/(pi*f*r)}
.PARAM c2={1/(4*pi*f*r*qq)}
R1 in a {r}
R2 a b {r}
C1 a out {c1}
C2 b 0 {c2}
X1 b out buf
.ENDS

Vin in 0 DC 0 AC 1 SIN 0 1 1k
* two cascaded sections; the second takes its corner from the global .PARAM
X1 in m1 sklp f=50k qq=1.2
X2 m1 out sklp f={fc} qq={q}
RL out 0 1meg

.AC DEC 40 10 1meg
.MEASURE AC f3db WHEN VDB(out)=-3 FALL=1
.MEASURE AC g0 FIND VM(out) AT=10
.TRAN 10u 5m
.PRINT TRAN V(in) V(out)
.end
