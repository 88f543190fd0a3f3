"""Small fixed-size linear algebra, unrolled for TPU.

XLA lowers batched ``cholesky``/``triangular_solve`` to column loops with
dynamic slices — slow on TPU for the tiny (nq×nq) systems this engine solves
per env. These unrolled routines index statically, so under vmap every
operation is a fused (batch,)-vector op on the VPU with no gather/scatter.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def solve_psd(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b for symmetric positive-definite A (..., n, n), n static
    and small (<= ~16).

    Column-vectorized Cholesky: the factor is held as a list of column slices
    (no scatters, no dynamic indexing), every op is an O(n)-length vector op
    over the batch — ~n ops per phase instead of O(n^2) scalar ops.
    """
    n = A.shape[-1]
    # cols[j] = L[j:, j], shape (..., n-j); col_j = s / sqrt(s[0]) where
    # s = A[j:, j] - sum_k L[j:, k] * L[j, k]
    cols = []
    for j in range(n):
        s = A[..., j:, j]
        for k in range(j):
            ck = cols[k]
            s = s - ck[..., j - k :] * ck[..., j - k : j - k + 1]
        s0 = jnp.maximum(s[..., :1], 1e-12)
        cols.append(s * jax.lax.rsqrt(s0))
    # forward substitution L y = b, residual form
    r = b
    y = []
    for j in range(n):
        yj = r[..., 0] / cols[j][..., 0]
        y.append(yj)
        r = r[..., 1:] - cols[j][..., 1:] * yj[..., None]
    # back substitution Lᵀ x = y
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        if i < n - 1:
            xi_tail = jnp.stack(x[i + 1 :], axis=-1)  # (..., n-1-i)
            s = s - jnp.sum(cols[i][..., 1:] * xi_tail, axis=-1)
        x[i] = s / cols[i][..., 0]
    return jnp.stack(x, axis=-1)


def solve_psd_pair(A: jnp.ndarray, b1: jnp.ndarray, b2: jnp.ndarray):
    """Solve A x = b for TWO right-hand sides sharing one Cholesky
    factorization (the split-impulse integrator's velocity/position passes:
    factorization dominates, the second back-substitution is nearly free)."""
    n = A.shape[-1]
    cols = []
    for j in range(n):
        s = A[..., j:, j]
        for k in range(j):
            ck = cols[k]
            s = s - ck[..., j - k :] * ck[..., j - k : j - k + 1]
        s0 = jnp.maximum(s[..., :1], 1e-12)
        cols.append(s * jax.lax.rsqrt(s0))
    b = jnp.stack([b1, b2], axis=-1)  # (..., n, 2)
    r = b
    y = []
    for j in range(n):
        yj = r[..., 0, :] / cols[j][..., 0, None]
        y.append(yj)
        r = r[..., 1:, :] - cols[j][..., 1:, None] * yj[..., None, :]
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        if i < n - 1:
            xi_tail = jnp.stack(x[i + 1 :], axis=-2)  # (..., n-1-i, 2)
            s = s - jnp.sum(cols[i][..., 1:, None] * xi_tail, axis=-2)
        x[i] = s / cols[i][..., 0, None]
    out = jnp.stack(x, axis=-2)  # (..., n, 2)
    return out[..., 0], out[..., 1]
