"""Quaternion and rotation math for batched rigid-body computation on TPU.

Semantics match the reference framework's rotation conventions
(``mani_skill/utils/geometry/rotation_conversions.py``: wxyz quaternion order,
right-handed frames) but are implemented from scratch as pure JAX functions that
vmap/jit cleanly. All functions broadcast over arbitrary leading batch dims.

Quaternions are ``(..., 4)`` arrays in ``(w, x, y, z)`` order, unit-norm unless
stated otherwise.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Quaternion ops
# ---------------------------------------------------------------------------


def quat_identity(shape=()) -> jnp.ndarray:
    """Identity quaternion(s) with the given leading batch shape."""
    q = jnp.zeros(shape + (4,))
    return q.at[..., 0].set(1.0)


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(eps)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b, wxyz order. Matches reference
    ``rotation_conversions.py:quaternion_raw_multiply`` semantics."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_inv(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a unit quaternion (= conjugate)."""
    return quat_conjugate(q)


def quat_apply(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by unit quaternion(s) q.

    Uses the 2-cross-product formulation (cheaper than matrix conversion):
    v' = v + 2 * w * (u x v) + 2 * u x (u x v), u = q.xyz
    """
    u = q[..., 1:]
    w = q[..., :1]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_rotate_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return quat_apply(quat_conjugate(q), v)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> (..., 3, 3) rotation matrix.
    Matches reference ``rotation_conversions.py:quaternion_to_matrix``."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    tx, ty, tz = 2.0 * x, 2.0 * y, 2.0 * z
    twx, twy, twz = tx * w, ty * w, tz * w
    txx, txy, txz = tx * x, ty * x, tz * x
    tyy, tyz, tzz = ty * y, tz * y, tz * z
    m = jnp.stack(
        [
            1.0 - (tyy + tzz), txy - twz, txz + twy,
            txy + twz, 1.0 - (txx + tzz), tyz - twx,
            txz - twy, tyz + twx, 1.0 - (txx + tyy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation matrix -> unit quaternion (wxyz), branch-free.

    Uses the standard 4-candidate construction selected by the largest
    diagonal element (Shepperd's method), implemented with jnp.where so it
    jits with no data-dependent control flow.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate quaternions (un-normalized), one per branch.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    cond0 = tr > 0.0
    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q = jnp.where(
        cond0[..., None], qw,
        jnp.where(cond1[..., None], qx, jnp.where(cond2[..., None], qy, qz)),
    )
    q = quat_normalize(q)
    # canonical sign: w >= 0
    return jnp.where(q[..., :1] < 0.0, -q, q)


def quat_from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Unit axis (..., 3) + angle (...,) -> quaternion."""
    half = 0.5 * angle
    w = jnp.cos(half)
    xyz = axis * jnp.sin(half)[..., None]
    return jnp.concatenate([w[..., None], xyz], axis=-1)


def quat_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Exponential map: rotation vector (..., 3) -> quaternion.

    Value- AND gradient-safe at w=0 (a bare ``norm`` has a NaN gradient at
    zero which a ``where`` does not block — it would poison every
    ``jax.grad``/``jacfwd`` through the integrator, e.g. iLQR)."""
    sq = jnp.sum(w * w, axis=-1, keepdims=True)
    angle = jnp.sqrt(sq + 1e-18)
    half = 0.5 * angle
    k = jnp.sin(half) / angle
    return jnp.concatenate([jnp.cos(half), w * k], axis=-1)


def quat_log(q: jnp.ndarray) -> jnp.ndarray:
    """Log map: unit quaternion -> rotation vector (..., 3). Value- and
    gradient-safe near identity."""
    q = jnp.where(q[..., :1] < 0.0, -q, q)  # shortest arc
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    v = q[..., 1:]
    s = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + 1e-18)
    angle = 2.0 * jnp.arctan2(s, w)
    return v * (angle / s)


def quat_from_euler(rpy: jnp.ndarray) -> jnp.ndarray:
    """Intrinsic XYZ (roll, pitch, yaw) Euler angles -> quaternion.
    Matches URDF <origin rpy> convention (fixed-axis XYZ = R_z R_y R_x? no —
    URDF rpy is extrinsic X-Y-Z i.e. R = Rz(y) Ry(p) Rx(r))."""
    r, p, y = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cr, sr = jnp.cos(r * 0.5), jnp.sin(r * 0.5)
    cp, sp = jnp.cos(p * 0.5), jnp.sin(p * 0.5)
    cy, sy = jnp.cos(y * 0.5), jnp.sin(y * 0.5)
    return jnp.stack(
        [
            cy * cp * cr + sy * sp * sr,
            cy * cp * sr - sy * sp * cr,
            cy * sp * cr + sy * cp * sr,
            sy * cp * cr - cy * sp * sr,
        ],
        axis=-1,
    )


def random_quaternion(key, shape=(), lock_x: bool = False, lock_y: bool = False,
                      lock_z: bool = False) -> jnp.ndarray:
    """Uniform random quaternions; with lock flags, restrict rotation like the
    reference ``envs/utils/randomization/pose.py:random_quaternions``
    (lock_x & lock_y -> yaw-only rotations)."""
    if lock_x and lock_y and not lock_z:
        ang = jax.random.uniform(key, shape, minval=-jnp.pi, maxval=jnp.pi)
        axis = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), shape + (3,))
        return quat_from_axis_angle(axis, ang)
    if lock_x and lock_y and lock_z:
        return quat_identity(shape)
    # general: Shoemake uniform quaternion
    u = jax.random.uniform(key, shape + (3,))
    u1, u2, u3 = u[..., 0], u[..., 1], u[..., 2]
    a, b = jnp.sqrt(1.0 - u1), jnp.sqrt(u1)
    q = jnp.stack(
        [
            a * jnp.sin(2 * jnp.pi * u2),
            a * jnp.cos(2 * jnp.pi * u2),
            b * jnp.sin(2 * jnp.pi * u3),
            b * jnp.cos(2 * jnp.pi * u3),
        ],
        axis=-1,
    )
    return q


def angle_between(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Angle (radians) between batched vectors. Mirrors reference
    ``utils/common.py:compute_angle_between``. Gradient-safe at zero vectors
    and at parallel vectors (clip keeps arccos off its infinite-slope ends
    only in value; inputs are nudged off +-1)."""
    na = a / jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True) + eps * eps)
    nb = b / jnp.sqrt(jnp.sum(b * b, axis=-1, keepdims=True) + eps * eps)
    return jnp.arccos(jnp.clip(jnp.sum(na * nb, axis=-1), -1.0 + 1e-7, 1.0 - 1e-7))


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [zero, -z, y, z, zero, -x, -y, x, zero], axis=-1
    ).reshape(v.shape[:-1] + (3, 3))
