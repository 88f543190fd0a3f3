"""Controller framework: pure-function controllers over a ControllerState pytree.

Re-implements the reference controller stack
(``mani_skill/agents/controllers/base_controller.py``) functionally:

  * a ``ControllerConfig`` dataclass family mirroring the reference configs
    (PDJointPosControllerConfig etc., same fields & defaults),
  * each controller exposes ``action_dim``, ``action_low/high`` (the raw
    action space), optional ``[-1,1]`` normalization
    (base_controller.py:154-169), a ``reset`` producing its state, and
    ``set_action(state, qpos, action) -> (state', DriveCmd contribution)``,
  * a ``CompositeController`` concatenates sub-controllers (arm + gripper)
    into one flat Box action space exactly like the reference's
    ``CombinedController`` (base_controller.py:287).

Controller state (e.g. ``target_qpos`` for use_target/delta modes) is part of
the env state pytree, so checkpoints include it — matching the reference's
``controller.get_state()`` contract (pd_joint_pos.py:100-107).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple, Union
import numpy as _np

import jax.numpy as jnp
import numpy as np
from flax import struct


def clip_and_scale_action(action, low, high):
    """[-1,1] -> [low, high], mirroring reference
    ``utils/gym_utils.py:clip_and_scale_action``."""
    action = jnp.clip(action, -1.0, 1.0)
    return 0.5 * (high + low) + 0.5 * (high - low) * action


@struct.dataclass
class ControllerState:
    """Generic controller state: drive targets in joint space."""

    target_qpos: jnp.ndarray  # (n_ctrl_joints,)
    target_qvel: jnp.ndarray  # (n_ctrl_joints,)


@dataclass
class ControllerConfig:
    joint_names: Sequence[str] = ()
    # resolved by the agent layer:
    joint_indices: np.ndarray = None  # indices into the articulation dofs


@dataclass
class PDJointPosControllerConfig(ControllerConfig):
    """Mirrors reference PDJointPosControllerConfig (pd_joint_pos.py:110-125)."""

    lower: Union[None, float, Sequence[float]] = None
    upper: Union[None, float, Sequence[float]] = None
    stiffness: Union[float, Sequence[float]] = 100.0
    damping: Union[float, Sequence[float]] = 10.0
    force_limit: Union[float, Sequence[float]] = 1e10
    friction: Union[float, Sequence[float]] = 0.0
    use_delta: bool = False
    use_target: bool = False
    interpolate: bool = False
    normalize_action: bool = True
    mimic: bool = False  # PDJointPosMimicController: one action, all joints


@dataclass
class PDJointPosVelControllerConfig(PDJointPosControllerConfig):
    """Mirrors reference PDJointPosVelControllerConfig
    (pd_joint_pos_vel.py:66-69): action = [qpos targets (nj), qvel targets
    (nj)]; the position half keeps PDJointPos delta/target semantics, the
    velocity half sets drive velocity targets scaled to
    [vel_lower, vel_upper]."""

    vel_lower: Union[float, Sequence[float]] = -1.0
    vel_upper: Union[float, Sequence[float]] = 1.0


@dataclass
class PDJointVelControllerConfig(ControllerConfig):
    lower: Union[None, float, Sequence[float]] = -1.0
    upper: Union[None, float, Sequence[float]] = 1.0
    damping: Union[float, Sequence[float]] = 10.0
    force_limit: Union[float, Sequence[float]] = 1e10
    friction: Union[float, Sequence[float]] = 0.0
    normalize_action: bool = True


@dataclass
class PassiveControllerConfig(ControllerConfig):
    """Reference ``PassiveControllerConfig`` (passive_controller.py): the
    joints take no actions and no drive; optional damping/friction."""

    damping: Union[float, Sequence[float]] = 0.0
    friction: Union[float, Sequence[float]] = 0.0


@dataclass
class PDBaseForwardVelControllerConfig(ControllerConfig):
    """Ego-centric mobile-base velocity control (reference
    ``pd_base_vel.py:PDBaseForwardVelController``): 2 actions
    (forward velocity, rotation velocity) mapped onto root x/y/θ joints."""

    lower: float = -0.5
    upper: float = 0.5
    damping: Union[float, Sequence[float]] = 1e3
    force_limit: Union[float, Sequence[float]] = 1e10
    normalize_action: bool = True


@dataclass
class TorqueControllerConfig(ControllerConfig):
    """Direct joint torque control (dm_control-style MJCF ``<motor>``
    actuators: τ = gear · a with a clipped to ctrlrange). Used by the
    control-suite locomotion tasks (reference envs/tasks/control/*.py
    passive-controller + qf path)."""

    gear: Union[float, Sequence[float]] = 1.0
    ctrlrange: Tuple[float, float] = (-1.0, 1.0)


@dataclass
class PDEEPosControllerConfig(ControllerConfig):
    """Task-space delta-position control via damped-least-squares IK
    (reference pd_ee_pose.py / kinematics.py)."""

    pos_lower: Union[None, float] = -0.1
    pos_upper: Union[None, float] = 0.1
    stiffness: Union[float, Sequence[float]] = 100.0
    damping: Union[float, Sequence[float]] = 10.0
    force_limit: Union[float, Sequence[float]] = 1e10
    friction: Union[float, Sequence[float]] = 0.0
    ee_link: str = ""
    frame: str = "root_translation"  # reference pd_ee_pose.py:29-32 GPU path
    use_delta: bool = True
    use_target: bool = False
    normalize_action: bool = True
    ik_damping: float = 0.05


@dataclass
class PDEEPoseControllerConfig(PDEEPosControllerConfig):
    rot_lower: float = -0.1
    rot_upper: float = 0.1
    frame: str = "root_translation:root_aligned_body_rotation"


class JointController:
    """Resolved per-joint PD controller (position or velocity flavor)."""

    def __init__(self, config, qlim: np.ndarray, n_dofs: int):
        self.config = config
        idx = np.asarray(config.joint_indices, dtype=np.int32)
        self.joint_indices = idx
        self.nj = len(idx)

        if isinstance(config, PDBaseForwardVelControllerConfig):
            # joints must be ordered (root_x, root_y, root_theta)
            assert self.nj == 3
            self._mode = "base_vel"
            self.use_delta = self.use_target = self.mimic = False
            self.action_dim = 2
            self.raw_low = np.full(2, config.lower, np.float32)
            self.raw_high = np.full(2, config.upper, np.float32)
            self.normalize_action = config.normalize_action
            self.qlim = qlim[idx].astype(np.float32)
            self.kp = np.zeros(self.nj, np.float32)
            self.kd = np.broadcast_to(
                np.asarray(config.damping, np.float32), (self.nj,)
            ).copy()
            self.force_limit = np.broadcast_to(
                np.asarray(config.force_limit, np.float32), (self.nj,)
            ).copy()
            return
        if isinstance(config, PassiveControllerConfig):
            self._mode = "passive"
            self.use_delta = self.use_target = self.mimic = False
            self.action_dim = 0
            self.raw_low = np.zeros(0, np.float32)
            self.raw_high = np.zeros(0, np.float32)
            self.normalize_action = False
            self.qlim = qlim[idx].astype(np.float32)
            self.kp = np.zeros(self.nj, np.float32)
            self.kd = np.broadcast_to(
                np.asarray(config.damping, np.float32), (self.nj,)
            ).copy()
            self.force_limit = np.full(self.nj, 1e10, np.float32)
            return
        if isinstance(config, PDJointPosControllerConfig):
            lo = qlim[idx, 0].copy()
            hi = qlim[idx, 1].copy()
            if config.lower is not None:
                lo[:] = config.lower
            if config.upper is not None:
                hi[:] = config.upper
            self._mode = "pos"
            self.use_delta = config.use_delta
            self.use_target = config.use_target
            self.mimic = config.mimic
            if isinstance(config, PDJointPosVelControllerConfig):
                # action = [pos targets, vel targets] (reference
                # pd_joint_pos_vel.py:38-62)
                assert not self.mimic, "pos_vel + mimic unsupported"
                self._mode = "pos_vel"
                vlo = np.broadcast_to(
                    np.asarray(config.vel_lower, np.float32), (self.nj,))
                vhi = np.broadcast_to(
                    np.asarray(config.vel_upper, np.float32), (self.nj,))
                lo = np.concatenate([lo, vlo])
                hi = np.concatenate([hi, vhi])
        elif isinstance(config, PDJointVelControllerConfig):
            lo = np.broadcast_to(np.asarray(config.lower, np.float32), (self.nj,)).copy()
            hi = np.broadcast_to(np.asarray(config.upper, np.float32), (self.nj,)).copy()
            self._mode = "vel"
            self.use_delta = False
            self.use_target = False
            self.mimic = False
        else:
            raise TypeError(config)
        if self.mimic:
            # one shared action for coupled joints (reference
            # PDJointPosMimicController, pd_joint_pos.py:126-133)
            assert np.allclose(lo, lo[0]) and np.allclose(hi, hi[0])
            self.action_dim = 1
        elif self._mode == "pos_vel":
            self.action_dim = 2 * self.nj
        else:
            self.action_dim = self.nj
        self.raw_low = lo.astype(np.float32)
        self.raw_high = hi.astype(np.float32)
        self.normalize_action = config.normalize_action
        self.qlim = qlim[idx].astype(np.float32)

        # drive gains for the physics engine (broadcast to controlled joints)
        stiff = getattr(config, "stiffness", 0.0)
        self.kp = np.broadcast_to(np.asarray(stiff, np.float32), (self.nj,)).copy()
        self.kd = np.broadcast_to(
            np.asarray(config.damping, np.float32), (self.nj,)
        ).copy()
        self.force_limit = np.broadcast_to(
            np.asarray(config.force_limit, np.float32), (self.nj,)
        ).copy()

    def reset(self, qpos: jnp.ndarray) -> ControllerState:
        """Controller state from current qpos (reference
        pd_joint_pos.py:51-66 reset semantics)."""
        q = qpos[self.joint_indices]
        return ControllerState(target_qpos=q, target_qvel=jnp.zeros(self.nj))

    def _scale(self, action):
        if self.normalize_action:
            full = len(self.raw_low) == self.action_dim
            lo = jnp.asarray(self.raw_low if full else self.raw_low[:1])
            hi = jnp.asarray(self.raw_high if full else self.raw_high[:1])
            return clip_and_scale_action(action, lo, hi)
        return action

    def set_action(
        self, cstate: ControllerState, qpos: jnp.ndarray, action: jnp.ndarray
    ) -> ControllerState:
        """Compute new drive targets from an action
        (reference pd_joint_pos.py:73-90 / pd_joint_vel.py)."""
        if self._mode == "passive":
            return cstate
        if self._mode == "base_vel":
            # ego-centric (forward, rotation) -> world-frame (vx, vy, ω)
            # (reference pd_base_vel.py:48-66)
            a = self._scale(action)
            ori = qpos[self.joint_indices[2]]
            vx = a[0] * jnp.cos(ori)
            vy = a[0] * jnp.sin(ori)
            return cstate.replace(
                target_qvel=jnp.stack([vx, vy, a[1]]),
                target_qpos=qpos[self.joint_indices],
            )
        a = self._scale(action)
        if self.mimic:
            a = jnp.broadcast_to(a, (self.nj,))
        q = qpos[self.joint_indices]
        if self._mode == "vel":
            return cstate.replace(target_qvel=a, target_qpos=q)
        if self._mode == "pos_vel":
            a, tv = a[: self.nj], a[self.nj:]
            if self.use_delta:
                base = cstate.target_qpos if self.use_target else q
                tgt = base + a
            else:
                tgt = a
            tgt = jnp.clip(tgt, self.qlim[:, 0], self.qlim[:, 1])
            return cstate.replace(target_qpos=tgt, target_qvel=tv)
        if self.use_delta:
            base = cstate.target_qpos if self.use_target else q
            tgt = base + a
        else:
            tgt = jnp.broadcast_to(a, (self.nj,))
        # clamp targets to joint limits like PhysX drive targets effectively do
        tgt = jnp.clip(tgt, self.qlim[:, 0], self.qlim[:, 1])
        return cstate.replace(target_qpos=tgt, target_qvel=jnp.zeros(self.nj))


class TorqueController:
    """Composite-compatible controller writing ``DriveCmd.qf`` directly
    (zero PD gains). See TorqueControllerConfig."""

    def __init__(self, cfg: TorqueControllerConfig):
        self.cfg = cfg
        self.joint_indices = np.asarray(cfg.joint_indices, dtype=np.int32)
        nj = len(self.joint_indices)
        self.action_dim = nj
        self.gear = np.broadcast_to(
            np.asarray(cfg.gear, np.float32), (nj,)
        ).copy()
        self.raw_low = np.full(nj, cfg.ctrlrange[0], np.float32)
        self.raw_high = np.full(nj, cfg.ctrlrange[1], np.float32)
        self.normalize_action = False  # ctrlrange is the action space
        self.mimic = False
        self.kp = np.zeros(nj, np.float32)
        self.kd = np.zeros(nj, np.float32)
        self.force_limit = np.full(nj, 1e10, np.float32)

    def set_action(self, sub_state, qpos, action):
        nj = len(self.joint_indices)
        return ControllerState(
            target_qpos=qpos[self.joint_indices],
            target_qvel=jnp.zeros(nj),
        )

    def compute_qf(self, qpos, action):
        a = jnp.clip(action, jnp.asarray(self.raw_low),
                     jnp.asarray(self.raw_high))
        return jnp.asarray(self.gear) * a
