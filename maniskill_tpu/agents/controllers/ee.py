"""Task-space (end-effector) delta controllers via damped-least-squares IK.

Re-implements the reference PDEEPos/PDEEPose controllers
(``mani_skill/agents/controllers/pd_ee_pose.py``) in their GPU form: a single
delta-IK step ``Δq = DLS(J) Δx`` per control step (reference
``kinematics.py:157-172``), with frames restricted to ``root_translation`` /
``root_aligned_body_rotation`` exactly like the reference GPU path
(pd_ee_pose.py:29-32). The Jacobian comes from the same FK used by the
dynamics engine, so there is no separate kinematics library to keep in sync.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...kinematics import chain
from ...math.rotations import quat_apply, quat_rotate_inv
from .base import (
    ControllerState,
    PDEEPosControllerConfig,
    PDEEPoseControllerConfig,
    clip_and_scale_action,
)


class EEController:
    """pd_ee_delta_pos / pd_ee_delta_pose controller."""

    def __init__(self, cfg: PDEEPosControllerConfig, agent):
        self.config = cfg
        self.spec = agent.robot_spec
        self.joint_indices = np.asarray(cfg.joint_indices, dtype=np.int32)
        self.nj = len(self.joint_indices)
        self.with_rot = isinstance(cfg, PDEEPoseControllerConfig)
        self.action_dim = 6 if self.with_rot else 3
        self.mimic = False
        self.normalize_action = cfg.normalize_action

        lo = np.full(3, cfg.pos_lower, dtype=np.float32)
        hi = np.full(3, cfg.pos_upper, dtype=np.float32)
        if self.with_rot:
            lo = np.concatenate([lo, np.full(3, cfg.rot_lower, dtype=np.float32)])
            hi = np.concatenate([hi, np.full(3, cfg.rot_upper, dtype=np.float32)])
        self.raw_low, self.raw_high = lo, hi

        ee = cfg.ee_link
        self.ee_body, self.ee_off_p, self.ee_off_q = self.spec.frame_of(ee)
        # ancestor mask over all dofs (for the point jacobian)
        anc = np.zeros((self.spec.nb, self.spec.nb), dtype=np.float32)
        for b in range(self.spec.nb):
            j = b
            while j >= 0:
                anc[b, j] = 1.0
                j = int(self.spec.parent[j])
        self.ancestor_mask = anc
        self.qlim = self.spec.qlim[self.joint_indices].astype(np.float32)

        self.kp = np.broadcast_to(
            np.asarray(cfg.stiffness, np.float32), (self.nj,)
        ).copy()
        self.kd = np.broadcast_to(np.asarray(cfg.damping, np.float32), (self.nj,)).copy()
        self.force_limit = np.broadcast_to(
            np.asarray(cfg.force_limit, np.float32), (self.nj,)
        ).copy()

    def reset(self, qpos: jnp.ndarray) -> ControllerState:
        q = qpos[self.joint_indices]
        return ControllerState(target_qpos=q, target_qvel=jnp.zeros(self.nj))

    def set_action(self, cstate, qpos, action, aux=None) -> ControllerState:
        """aux must be (base_pose(7,), body_pos, body_quat, axis_w) from the
        env's FK of the current qpos."""
        assert aux is not None, "EEController needs FK context"
        base_pose, body_pos, body_quat, axis_w = aux
        # scenes with articulated OBJECTS append passive links after the
        # robot's (the robot is tree 0 of the merged forest) — the env FK
        # then covers MORE bodies than this controller's spec; slice to the
        # robot's own links so the point jacobian shapes stay consistent
        nb = self.spec.nb
        body_pos = body_pos[:nb]
        body_quat = body_quat[:nb]
        axis_w = axis_w[:nb]
        if self.normalize_action:
            a = clip_and_scale_action(
                action, jnp.asarray(self.raw_low), jnp.asarray(self.raw_high)
            )
        else:
            a = action
        base_q = base_pose[3:7]
        dx_pos = quat_apply(base_q, a[:3])  # root_translation frame
        ee_p = (
            body_pos[self.ee_body] + quat_apply(body_quat[self.ee_body], jnp.asarray(self.ee_off_p, jnp.float32))
            if self.ee_body >= 0
            else base_pose[:3]
        )
        J = chain.point_jacobian(
            self.spec, body_pos, axis_w, ee_p, self.ee_body,
            self.joint_indices, self.ancestor_mask,
        )  # (6, nj) rows [ang; lin]
        if self.with_rot:
            dx_rot = quat_apply(base_q, a[3:6])  # root-aligned rotation delta
            dx = jnp.concatenate([dx_rot, dx_pos])
            dq = chain.dls_ik_delta(J, dx, self.config.ik_damping)
        else:
            dq = chain.dls_ik_delta(J[3:], dx_pos, self.config.ik_damping)
        tgt = jnp.clip(
            qpos[self.joint_indices] + dq, self.qlim[:, 0], self.qlim[:, 1]
        )
        return cstate.replace(target_qpos=tgt, target_qvel=jnp.zeros(self.nj))
