"""Kernels: MNA assembly, batched LU, Gauss-Seidel, Pallas."""
