"""Small fixed-size linear algebra, unrolled for TPU.

XLA lowers batched ``cholesky``/``triangular_solve`` to column loops with
dynamic slices — slow on TPU for the tiny (nq×nq) systems this engine solves
per env. These unrolled routines index statically, so under vmap every
operation is a fused (batch,)-vector op on the VPU with no gather/scatter.
"""
from __future__ import annotations

import jax.numpy as jnp


def solve_psd(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b for symmetric positive-definite A (n, n), n static and
    small (<= ~16). Unrolled Cholesky + back-substitution."""
    n = A.shape[-1]
    # Cholesky: A = L Lᵀ, statically unrolled
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                L[i][j] = s / L[j][j]
    # forward substitution L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution Lᵀ x = y
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)
