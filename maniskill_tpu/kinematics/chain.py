"""Kinematic chain operations: FK, frame poses, Jacobians, damped-LS IK.

TPU-native replacement for the reference's kinematics stack (CPU Pinocchio +
GPU pytorch_kinematics, ``mani_skill/agents/controllers/utils/kinematics.py``):
pure JAX functions over a static :class:`RobotSpec`, vmappable and
differentiable. The FK is a ``lax.scan`` over topologically-sorted bodies so
the per-body computation compiles once.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..math.rotations import (
    quat_apply,
    quat_from_axis_angle,
    quat_mul,
)
from .urdf import JOINT_REVOLUTE, RobotSpec


# set True to always use the unrolled FK (required when differentiating
# through the step on CPU: jacfwd through the scan formulation trips an XLA
# lowering bug on batched tangents — see planners/ilqr.py)
FORCE_UNROLLED = False


def fk(spec: RobotSpec, base_pose: jnp.ndarray, qpos: jnp.ndarray):
    """Forward kinematics. Returns (body_pos (nb,3), body_quat (nb,4),
    axis_w (nb,3)).

    Two lowerings of the same math:
      * TPU: unrolled over bodies with *static* parent indexing — the scan
        formulation's per-body dynamic gather/scatter (dynamic-update-slice)
        dominated the whole physics substep on TPU. Extra XLA compile time is
        amortized by the persistent compilation cache.
      * CPU (dev/test): lax.scan with dynamic parent gather — compiles ~10x
        faster and runs fine there.
    """
    if jax.default_backend() == "cpu" and not FORCE_UNROLLED:
        return _fk_scan(spec, base_pose, qpos)
    return _fk_unrolled(spec, base_pose, qpos)


def _fk_unrolled(spec: RobotSpec, base_pose: jnp.ndarray, qpos: jnp.ndarray):
    base_p = base_pose[..., :3]
    base_q = base_pose[..., 3:7]
    # precompose the constant joint-frame quaternion with the joint axis:
    # jq ∘ aa(axis, q) = cos(q/2)·jq + sin(q/2)·(jq ∘ [0, axis]) — one fused
    # multiply-add instead of a second quaternion product per body
    import numpy as _np

    cache = getattr(spec, "_fk_quat_cache", None)
    if cache is None:
        from .urdf import _quat_mul as _qm

        A, B = [], []
        for i in range(spec.nb):
            jq = spec.joint_quat[i]
            ax = spec.axis[i]
            A.append(jq)
            B.append(_qm(jq, _np.concatenate([[0.0], ax])))
        cache = (
            _np.stack(A).astype(_np.float32),
            _np.stack(B).astype(_np.float32),
        )
        object.__setattr__(spec, "_fk_quat_cache", cache)
    Aq, Bq = cache

    pos_list, quat_list, axis_list = [], [], []
    for i in range(spec.nb):
        par = int(spec.parent[i])
        pp = base_p if par < 0 else pos_list[par]
        pq = base_q if par < 0 else quat_list[par]
        jp = jnp.asarray(spec.joint_pos[i], dtype=jnp.float32)
        ax = jnp.asarray(spec.axis[i], dtype=jnp.float32)
        fp = pp + quat_apply(pq, jp)  # joint frame origin in world
        if int(spec.joint_type[i]) == JOINT_REVOLUTE:
            half = 0.5 * qpos[i]
            m = jnp.cos(half) * jnp.asarray(Aq[i]) + jnp.sin(half) * jnp.asarray(Bq[i])
            bq = quat_mul(pq, m)
            bp = fp
            axis_list.append(quat_apply(bq, ax))  # axis invariant under own rot
        else:  # prismatic
            bq = quat_mul(pq, jnp.asarray(Aq[i]))
            axis_w = quat_apply(bq, ax)
            bp = fp + axis_w * qpos[i]
            axis_list.append(axis_w)
        pos_list.append(bp)
        quat_list.append(bq)
    return (
        jnp.stack(pos_list, axis=-2),
        jnp.stack(quat_list, axis=-2),
        jnp.stack(axis_list, axis=-2),
    )


def frame_pose(
    spec: RobotSpec, base_pose: jnp.ndarray, body_pos, body_quat, frame_name: str
):
    """World pose (p, q) of a named movable link or fused fixed frame."""
    idx, off_p, off_q = spec.frame_of(frame_name)
    off_p = jnp.asarray(off_p, dtype=jnp.float32)
    off_q = jnp.asarray(off_q, dtype=jnp.float32)
    if idx < 0:
        bp, bq = base_pose[..., :3], base_pose[..., 3:7]
    else:
        bp, bq = body_pos[idx], body_quat[idx]
    return bp + quat_apply(bq, off_p), quat_mul(bq, off_q)


def point_jacobian(
    spec: RobotSpec,
    body_pos: jnp.ndarray,
    axis_w: jnp.ndarray,
    point_w: jnp.ndarray,
    body_idx: int,
    joint_indices: np.ndarray,
    ancestor_mask: np.ndarray,
) -> jnp.ndarray:
    """6×k Jacobian ([ang; lin] rows) of a world point fixed to ``body_idx``
    w.r.t. the selected dofs."""
    is_rev = (spec.joint_type == JOINT_REVOLUTE).astype(np.float32)[:, None]
    is_rev = jnp.asarray(is_rev)
    ang = is_rev * axis_w  # (nq, 3)
    # revolute: v_point = a_j × (point − anchor_j); prismatic: a_j
    lin = is_rev * jnp.cross(axis_w, point_w - body_pos) + (1.0 - is_rev) * axis_w
    mask = jnp.asarray(ancestor_mask[body_idx][:, None])  # (nq, 1)
    ang = ang * mask
    lin = lin * mask
    J = jnp.concatenate([ang, lin], axis=-1).T  # (6, nq) rows [ang(3); lin(3)]
    return J[:, joint_indices]


def dls_ik_delta(
    J: jnp.ndarray, dx: jnp.ndarray, damping: float = 0.05
) -> jnp.ndarray:
    """One damped-least-squares IK step: Δq = Jᵀ (J Jᵀ + λ²I)⁻¹ Δx.

    The differentiable GPU analogue of the reference's delta-IK path
    (``kinematics.py:157-172``: q += pinv(J) Δx)."""
    m = J.shape[0]
    JJt = J @ J.T + (damping**2) * jnp.eye(m)
    return J.T @ jnp.linalg.solve(JJt, dx)


def _fk_scan(spec: RobotSpec, base_pose: jnp.ndarray, qpos: jnp.ndarray):
    nb = spec.nb
    base_p = base_pose[..., :3]
    base_q = base_pose[..., 3:7]
    xs = (
        jnp.asarray(spec.joint_pos, dtype=jnp.float32),
        jnp.asarray(spec.joint_quat, dtype=jnp.float32),
        jnp.asarray(spec.axis, dtype=jnp.float32),
        jnp.asarray(spec.joint_type == JOINT_REVOLUTE, dtype=jnp.float32),
        jnp.asarray(spec.parent + 1, dtype=jnp.int32),  # slot 0 = base
        qpos,
        jnp.arange(1, nb + 1, dtype=jnp.int32),
    )
    pos0 = jnp.zeros((nb + 1, 3)).at[0].set(base_p)
    quat0 = jnp.zeros((nb + 1, 4)).at[0].set(base_q)

    def body(carry, x):
        pos, quat = carry
        jp, jq, ax, is_rev, par, q, idx = x
        pp = pos[par]
        pq = quat[par]
        fp = pp + quat_apply(pq, jp)
        fq = quat_mul(pq, jq)
        bq = jnp.where(is_rev > 0, quat_mul(fq, quat_from_axis_angle(ax, q)), fq)
        bp = jnp.where(is_rev > 0, fp, fp + quat_apply(fq, ax * q))
        axis_w = quat_apply(fq, ax)
        return (pos.at[idx].set(bp), quat.at[idx].set(bq)), axis_w

    (pos, quat), axis_w = jax.lax.scan(body, (pos0, quat0), xs)
    return pos[1:], quat[1:], axis_w
