* 1:2 transformer (k=0.98): transient + AC voltage ratio
V1 src 0 SIN 0 1 1e5 AC 1
Rs src p 10
L1 p 0 1m
L2 s 0 4m
K1 L1 L2 0.98
Rl s 0 1e5
.TRAN 1e-8 5e-5
.AC dec 10 1e3 1e7
