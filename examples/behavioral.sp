* behavioral sources: multiplier, soft limiter, POLY form
V1 a 0 SIN 0 1 1e6
V2 b 0 SIN 0 1 1.1e6
Bmul mul 0 V=v(a)*v(b)
Rmul mul 0 1k
Blim lim 0 V=tanh(3*v(a))
Rlim lim 0 1k
Epoly sq 0 POLY(1) a 0 0 0 1
Rsq sq 0 1k
.MEASURE TRAN mulpp PP V(mul)
.TRAN 2n 10u
