"""Pallas TPU kernels for the solver hot blocks.

First of the BASELINE.json "contact-QP/Riccati blocks as Pallas kernels":
a batched small-PSD solve (the per-env ``(M + hD) qacc = rhs`` system) that
keeps the whole factor/solve in VMEM for a block of envs.

Layout is **env-last** ("SIMT" style): every scalar of the computation is a
``(1, BLOCK)`` lane-vector, so the VPU runs at full width — the env-first
``(BLOCK, n)`` layout pads every n-slice to 128 lanes (7% utilization, VMEM
OOM at useful block sizes). This is the layout the round-2 mega-kernel
substep standardizes on (PLAN.md).

Math mirrors ``linalg.solve_psd`` (column Cholesky, factor as column
slices), so the two paths cross-validate.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _solve_kernel(n: int, a_ref, b_ref, out_ref):
    """Solve PSD systems for one env block.

    a_ref: (n*n, BLOCK) where row j*n+i holds A[i, j] (column-major rows —
    the per-column slices A[j:, j] are then contiguous row ranges);
    b_ref: (n, BLOCK); out_ref: (n, BLOCK).
    """
    # column Cholesky: cols[j] = L[j:, j] as (n-j, BLOCK)
    cols = []
    for j in range(n):
        s = a_ref[j * n + j : (j + 1) * n, :]
        for k in range(j):
            ck = cols[k]
            s = s - ck[j - k :, :] * ck[j - k : j - k + 1, :]
        s0 = jnp.maximum(s[:1, :], 1e-12)
        cols.append(s * jax.lax.rsqrt(s0))
    # forward substitution L y = b (residual form)
    r = b_ref[:]
    y = []
    for j in range(n):
        yj = r[:1, :] / cols[j][:1, :]  # (1, BLOCK)
        y.append(yj)
        if j < n - 1:  # Mosaic rejects zero-width slices
            r = r[1:, :] - cols[j][1:, :] * yj
    # back substitution Lᵀ x = y
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            s = s - cols[i][k - i : k - i + 1, :] * x[k]
        x[i] = s / cols[i][:1, :]
    out_ref[:] = jnp.concatenate(x, axis=0)


@functools.partial(jax.jit, static_argnames=("block",))
def solve_psd_pallas(A: jnp.ndarray, b: jnp.ndarray, block: int = 1024):
    """Solve batched PSD systems A x = b with a Pallas kernel.

    A: (K, n, n), b: (K, n); K must be a multiple of ``block``. Returns
    (K, n). Transposes to the env-last kernel layout at the boundary (a
    fused producer would emit that layout directly).
    """
    K, n, _ = A.shape
    assert K % block == 0, (K, block)
    At = A.transpose(2, 1, 0).reshape(n * n, K)  # row j*n+i = A[:, i, j]
    bt = b.T  # (n, K)
    grid = (K // block,)
    out = pl.pallas_call(
        functools.partial(_solve_kernel, n),
        out_shape=jax.ShapeDtypeStruct((n, K), A.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n * n, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(At, bt)
    return out.T
