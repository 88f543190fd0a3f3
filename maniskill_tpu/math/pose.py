"""Batched rigid-body ``Pose`` pytree.

Re-implements the semantics of the reference batched pose struct
(``mani_skill/utils/structs/pose.py``: 7-dim raw pose ``[p(3), q(4 wxyz)]``,
``__mul__`` composition, ``inv``, transformation matrices, auto-broadcast of
batch dims) as an immutable JAX pytree that works under jit/vmap/grad.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .rotations import (
    quat_apply,
    quat_conjugate,
    quat_identity,
    quat_mul,
    quat_normalize,
    quat_to_matrix,
)


@jax.tree_util.register_pytree_node_class
class Pose:
    """Batched pose: position ``p`` (..., 3) and wxyz quaternion ``q`` (..., 4)."""

    __slots__ = ("p", "q")

    def __init__(self, p: jnp.ndarray, q: jnp.ndarray):
        self.p = p
        self.q = q

    # -- constructors -------------------------------------------------------
    @staticmethod
    def identity(shape=()) -> "Pose":
        return Pose(jnp.zeros(shape + (3,)), quat_identity(shape))

    @staticmethod
    def create(p=None, q=None) -> "Pose":
        """Build from optional p/q with auto-broadcast of batch dims,
        mirroring reference ``Pose.create_from_pq`` (pose.py:87)."""
        if p is None and q is None:
            return Pose.identity()
        if p is not None:
            p = jnp.asarray(p, dtype=jnp.float32)
            if p.shape[-1] != 3:
                raise ValueError(f"p must have last dim 3, got {p.shape}")
        if q is not None:
            q = jnp.asarray(q, dtype=jnp.float32)
            if q.shape[-1] != 4:
                raise ValueError(f"q must have last dim 4, got {q.shape}")
        if p is None:
            p = jnp.zeros(q.shape[:-1] + (3,))
        if q is None:
            q = quat_identity(p.shape[:-1])
        # broadcast batch dims against each other
        batch = jnp.broadcast_shapes(p.shape[:-1], q.shape[:-1])
        p = jnp.broadcast_to(p, batch + (3,))
        q = jnp.broadcast_to(q, batch + (4,))
        return Pose(p, q)

    @staticmethod
    def from_raw(raw: jnp.ndarray) -> "Pose":
        """From 7-dim raw pose [p, q] (reference ``raw_pose`` layout)."""
        return Pose(raw[..., :3], raw[..., 3:7])

    @staticmethod
    def from_matrix(m: jnp.ndarray) -> "Pose":
        from .rotations import matrix_to_quat

        return Pose(m[..., :3, 3], matrix_to_quat(m[..., :3, :3]))

    # -- core ops -----------------------------------------------------------
    @property
    def raw(self) -> jnp.ndarray:
        """7-dim [p, q] array — the reference's ``raw_pose``."""
        return jnp.concatenate([self.p, self.q], axis=-1)

    @property
    def batch_shape(self) -> Tuple[int, ...]:
        return self.p.shape[:-1]

    def __mul__(self, other: "Pose") -> "Pose":
        """Compose: self ∘ other (apply other first in self's frame),
        matching reference ``Pose.__mul__`` (pose.py:187)."""
        return Pose(self.p + quat_apply(self.q, other.p), quat_mul(self.q, other.q))

    def inv(self) -> "Pose":
        qi = quat_conjugate(self.q)
        return Pose(-quat_apply(qi, self.p), qi)

    def apply(self, points: jnp.ndarray) -> jnp.ndarray:
        """Transform points (..., 3) from local into this pose's frame."""
        return self.p + quat_apply(self.q, points)

    def apply_inv(self, points: jnp.ndarray) -> jnp.ndarray:
        return quat_apply(quat_conjugate(self.q), points - self.p)

    def to_matrix(self) -> jnp.ndarray:
        """(..., 4, 4) homogeneous transformation matrix
        (reference ``to_transformation_matrix``, pose.py:231)."""
        batch = self.batch_shape
        m = jnp.zeros(batch + (4, 4), dtype=self.p.dtype)
        m = m.at[..., :3, :3].set(quat_to_matrix(self.q))
        m = m.at[..., :3, 3].set(self.p)
        m = m.at[..., 3, 3].set(1.0)
        return m

    def normalize(self) -> "Pose":
        return Pose(self.p, quat_normalize(self.q))

    def __getitem__(self, idx) -> "Pose":
        return Pose(self.p[idx], self.q[idx])

    def __repr__(self):
        return f"Pose(batch={self.batch_shape})"

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        return (self.p, self.q), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def look_at(eye, target, up=(0.0, 0.0, 1.0)) -> Pose:
    """Camera/viewer pose: forward = +x, matching reference
    ``utils/sapien_utils.py:look_at`` (OpenGL-free, ROS-style frame)."""
    eye = jnp.asarray(eye, dtype=jnp.float32)
    target = jnp.asarray(target, dtype=jnp.float32)
    up = jnp.asarray(up, dtype=jnp.float32)
    fwd = target - eye
    fwd = fwd / jnp.linalg.norm(fwd).clip(1e-8)
    left = jnp.cross(up, fwd)
    left = left / jnp.linalg.norm(left).clip(1e-8)
    up2 = jnp.cross(fwd, left)
    rot = jnp.stack([fwd, left, up2], axis=-1)
    from .rotations import matrix_to_quat

    return Pose(eye, matrix_to_quat(rot))
