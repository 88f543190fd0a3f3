"""Pallas kernel tests (interpret mode on CPU; real kernel on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_solve_psd_pallas_matches_reference():
    from maniskill_tpu.physics.linalg import solve_psd
    from maniskill_tpu.physics import pallas_kernels as pk
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(0)
    K, n = 256, 9
    X = rng.randn(K, n, n).astype(np.float32)
    A = X @ X.transpose(0, 2, 1) + n * np.eye(n, dtype=np.float32)
    b = rng.randn(K, n).astype(np.float32)

    if jax.default_backend() == "cpu":
        # interpreter mode (no Mosaic on CPU), env-last kernel layout
        At = jnp.asarray(A).transpose(2, 1, 0).reshape(n * n, K)
        bt = jnp.asarray(b).T
        out = pl.pallas_call(
            functools.partial(pk._solve_kernel, n),
            out_shape=jax.ShapeDtypeStruct((n, K), jnp.float32),
            grid=(1,),
            in_specs=[
                pl.BlockSpec((n * n, K), lambda i: (0, i)),
                pl.BlockSpec((n, K), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((n, K), lambda i: (0, i)),
            interpret=True,
        )(At, bt).T
    else:
        out = pk.solve_psd_pallas(jnp.asarray(A), jnp.asarray(b), block=256)
    ref = jax.vmap(solve_psd)(jnp.asarray(A), jnp.asarray(b))
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
