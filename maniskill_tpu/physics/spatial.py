"""Spatial (6D) vector algebra in world-frame Plücker coordinates.

Motion vectors are ``[ω(3); v(3)]`` (angular first), force vectors are
``[τ(3); f(3)]`` (moment first), both expressed at a common world reference
point. Using one fixed Plücker frame for the whole mechanism makes the dynamics
pipeline pure batched linear algebra (mass matrix ``M = Σ JᵀIJ`` and bias via a
single jvp), which maps onto the TPU MXU far better than a link-by-link
articulated-body recursion. This replaces the functionality the reference gets
from PhysX's internal Featherstone solver (see SURVEY.md §2.9).

All functions broadcast over leading batch dims.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..math.rotations import quat_to_matrix, skew


def motion_cross(v: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Spatial motion cross product v × m for motion vectors."""
    w, vo = v[..., :3], v[..., 3:]
    mw, mv = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, mw), jnp.cross(w, mv) + jnp.cross(vo, mw)], axis=-1
    )


def force_cross(v: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Spatial force cross product v ×* f (dual), for bias force v ×* I v."""
    w, vo = v[..., :3], v[..., 3:]
    ft, ff = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, ft) + jnp.cross(vo, ff), jnp.cross(w, ff)], axis=-1
    )


def spatial_inertia_at_ref(
    mass: jnp.ndarray,
    com_world: jnp.ndarray,
    inertia_com_world: jnp.ndarray,
) -> jnp.ndarray:
    """6x6 spatial inertia expressed at the (world) Plücker reference point.

    Args:
      mass: (...,) body mass
      com_world: (..., 3) CoM position relative to the Plücker reference
      inertia_com_world: (..., 3, 3) rotational inertia about the CoM in world
        axes.

    Returns (..., 6, 6):  [[I_c + m c̃ c̃ᵀ,  m c̃],
                           [m c̃ᵀ,          m E]]
    """
    c = com_world
    cx = skew(c)
    m = mass[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3), cx.shape)
    top_left = inertia_com_world + m * (cx @ cx.swapaxes(-1, -2))
    top_right = m * cx
    bottom_left = m * cx.swapaxes(-1, -2)
    bottom_right = m * eye
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bottom = jnp.concatenate([bottom_left, bottom_right], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def rotate_inertia(quat: jnp.ndarray, inertia_body: jnp.ndarray) -> jnp.ndarray:
    """Rotate a body-frame CoM inertia tensor into world axes: R I Rᵀ."""
    R = quat_to_matrix(quat)
    return R @ inertia_body @ R.swapaxes(-1, -2)


def point_force_to_wrench(point: jnp.ndarray, force: jnp.ndarray) -> jnp.ndarray:
    """Cartesian force at a world point -> spatial force at the Plücker ref.
    ``point`` is relative to the reference point."""
    return jnp.concatenate([jnp.cross(point, force), force], axis=-1)


def point_velocity(v_spatial: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
    """Linear velocity of a body-fixed point (relative to Plücker ref) given
    the body's spatial velocity: v_p = v_O + ω × p."""
    return v_spatial[..., 3:] + jnp.cross(v_spatial[..., :3], point)
