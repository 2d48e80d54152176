* 3-op-amp instrumentation amplifier — 22-MOS analog cell
* Purpose: a REAL analog block whose Woodbury rank (k = 22) exceeds the
* round-3 fused-kernel gate (k <= 16); testbed for the widened fused
* Pallas eligibility envelope (ops/pallas_step.py supported()).
* Each op-amp is a two-stage Miller OTA: NMOS diff pair (M*1/M*2),
* PMOS mirror load (M*3 diode / M*4 mirror), NMOS tail (M*5), PMOS
* common-source second stage (M*6) with NMOS sink (M*7), Cc+Rz Miller
* compensation.  One shared bias leg (RB + diode-connected MB).
* Gain = (1 + 2*R1/RG) * (R3/R2) = 3 on (vin1 - vin2).

VDD 100 0 DC 3
VIN1 201 0 SIN 1.5 0.01 1e6
VIN2 202 0 DC 1.5
VREF 203 0 DC 1.5

* shared bias: Vb ~ 1.03 V, Ib ~ 7.7 uA
RB 100 10 120k
MB 10 10 0 n 30e-6 0.35e-6 2

* --- op-amp A1 (non-inv input 201, inv input = node 31 feedback) ---
MA5 11 10 0   n 30e-6  0.35e-6 2
MA1 12 31  11 n 30e-6  0.35e-6 2
MA2 13 201 11 n 30e-6  0.35e-6 2
MA3 12 12 100 p 60e-6  0.35e-6 1
MA4 13 12 100 p 60e-6  0.35e-6 1
MA6 14 13 100 p 250e-6 0.35e-6 1
MA7 14 10 0   n 60e-6  0.35e-6 2
CCA 13 15 1p
RZA 15 14 10k

* --- op-amp A2 (non-inv input 202, inv input = node 32 feedback) ---
MB5 21 10 0   n 30e-6  0.35e-6 2
MB1 22 32  21 n 30e-6  0.35e-6 2
MB2 23 202 21 n 30e-6  0.35e-6 2
MB3 22 22 100 p 60e-6  0.35e-6 1
MB4 23 22 100 p 60e-6  0.35e-6 1
MB6 24 23 100 p 250e-6 0.35e-6 1
MB7 24 10 0   n 60e-6  0.35e-6 2
CCB 23 25 1p
RZB 25 24 10k

* gain-set network: A1.out 14 -- R1 -- 31 -- RG -- 32 -- R1 -- A2.out 24
R1A 14 31 20k
RG  31 32 20k
R1B 32 24 20k

* --- op-amp A3 (difference amp; non-inv 42, inv 41) ---
MC5 51 10 0   n 30e-6  0.35e-6 2
MC1 52 41 51  n 30e-6  0.35e-6 2
MC2 53 42 51  n 30e-6  0.35e-6 2
MC3 52 52 100 p 60e-6  0.35e-6 1
MC4 53 52 100 p 60e-6  0.35e-6 1
MC6 54 53 100 p 250e-6 0.35e-6 1
MC7 54 10 0   n 60e-6  0.35e-6 2
CCC 53 55 1p
RZC 55 54 10k

R2A 14 41 20k
R3A 41 54 20k
R2B 24 42 20k
R3B 42 203 20k

* gain-taming loads (keep the reference's fixed-alpha Newton convergent)
RLA 14 203 50k
RLB 24 203 50k
RLC 54 203 50k

* output load
CL 54 0 2p

.MODEL 1 VT -0.75 MU 5e-2 COX 0.3e-4 LAMBDA 0.05 CJ0 4.0e-14
.MODEL 2 VT 0.83 MU 1.5e-1 COX 0.3e-4 LAMBDA 0.05 CJ0 4.0e-14

* Newton aid for the reference-parity fixed-alpha ramp (extension card):
* approximate hand-computed bias; DC converges to the true point from here.
.NODESET V(10)=1.11 V(11)=0.45 V(21)=0.45 V(51)=0.45
.NODESET V(12)=2.0 V(13)=2.0 V(22)=2.0 V(23)=2.0 V(52)=2.0 V(53)=2.0
.NODESET V(14)=1.5 V(24)=1.5 V(54)=1.5 V(15)=1.5 V(25)=1.5 V(55)=1.5
.NODESET V(31)=1.5 V(32)=1.5 V(41)=1.5 V(42)=1.5

.PLOTNV 54
.TRAN 1e-9 2000e-9
.end
