"""Reward shaping utilities.

JAX port of the reference's dm_control-style helpers
(``mani_skill/envs/utils/rewards/common.py``): ``tolerance`` returns 1 inside
[lower, upper] and decays sigmoidally outside with the chosen profile.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def tolerance(
    x,
    lower: float = 0.0,
    upper: float = 0.0,
    margin: float = 0.0,
    sigmoid: str = "gaussian",
    value_at_margin: float = 0.1,
):
    x = jnp.asarray(x)
    in_bounds = (lower <= x) & (x <= upper)
    if margin == 0:
        return in_bounds.astype(jnp.float32)
    d = jnp.where(x < lower, lower - x, x - upper) / margin
    if sigmoid == "gaussian":
        scale = np.sqrt(-2 * np.log(value_at_margin))
        value = jnp.exp(-0.5 * (d * scale) ** 2)
    elif sigmoid == "hyperbolic":
        scale = np.arccosh(1 / value_at_margin)
        value = 1.0 / (1.0 + jnp.exp(d * scale))
    elif sigmoid == "quadratic":
        scale = np.sqrt(1 - value_at_margin)
        sd = d * scale
        value = jnp.where(jnp.abs(sd) < 1, 1 - sd**2, 0.0)
    elif sigmoid == "linear":
        scale = 1 - value_at_margin
        sd = d * scale
        value = jnp.where(jnp.abs(sd) < 1, 1 - sd, 0.0)
    elif sigmoid == "long_tail":
        scale = np.sqrt(1 / value_at_margin - 1)
        value = 1.0 / ((d * scale) ** 2 + 1)
    elif sigmoid == "cosine":
        scale = np.arccos(2 * value_at_margin - 1) / np.pi
        sd = d * scale
        value = jnp.where(jnp.abs(sd) < 1, (1 + jnp.cos(np.pi * sd)) / 2, 0.0)
    else:
        raise ValueError(f"Unknown sigmoid type {sigmoid!r}")
    return jnp.where(in_bounds, 1.0, value).astype(jnp.float32)
