"""Composite (multi-part) controller: arm + gripper in one flat action space.

Functional analogue of the reference ``CombinedController``
(``mani_skill/agents/controllers/base_controller.py:271-316``): sub-controllers
are concatenated in insertion order, the action vector is split by action_dim,
and each sub-controller writes drive targets for its joint indices into the
full (nq,) target arrays consumed by the physics engine.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from ...physics.model import DriveCmd
from .base import ControllerState, JointController


class CompositeController:
    def __init__(self, controllers: Dict[str, JointController], nq: int):
        self.controllers = controllers
        self.nq = nq
        self.action_dim = sum(c.action_dim for c in controllers.values())

        # raw (unnormalized) action-space bounds, concatenated
        lows, highs = [], []
        for c in controllers.values():
            lo = c.raw_low if not c.mimic else c.raw_low[:1]
            hi = c.raw_high if not c.mimic else c.raw_high[:1]
            if c.normalize_action:
                lows.append(-np.ones_like(lo))
                highs.append(np.ones_like(hi))
            else:
                lows.append(lo)
                highs.append(hi)
        self.action_low = np.concatenate(lows).astype(np.float32)
        self.action_high = np.concatenate(highs).astype(np.float32)

        # task-space sub-controllers need FK context at set_action time;
        # joint-space ones don't (lets the env skip one FK per control step)
        self.needs_fk_aux = any(_takes_aux(c) for c in controllers.values())

        # full-dof drive gain arrays for the scene model
        self.kp = np.zeros(nq, dtype=np.float32)
        self.kd = np.zeros(nq, dtype=np.float32)
        self.force_limit = np.full(nq, 1e10, dtype=np.float32)
        for c in controllers.values():
            self.kp[c.joint_indices] = c.kp
            self.kd[c.joint_indices] = c.kd
            self.force_limit[c.joint_indices] = c.force_limit

    def reset(self, qpos: jnp.ndarray) -> DriveCmd:
        """Drive command from current qpos (all sub-controllers hold).
        Gains are materialized per env so they can be changed at runtime
        (BaseEnv.set_drive_properties — the reference's
        ``ArticulationJoint.set_drive_property``); a reset restores the
        controller-config values."""
        tq = jnp.asarray(qpos)
        # the scene qpos may extend past the robot's nq (articulated objects
        # are merged after the robot in the forest, model.py merge order):
        # those joints are undriven (kp=kd=0)
        # (self.nq may have been widened to the scene nq post-merge, so pad
        # relative to the gain arrays' own robot-sized length)
        extra = tq.shape[-1] - len(self.kp)
        kp = np.concatenate([self.kp, np.zeros(extra, np.float32)])
        kd = np.concatenate([self.kd, np.zeros(extra, np.float32)])
        fl = np.concatenate(
            [self.force_limit, np.full(extra, 1e10, np.float32)]
        )
        return DriveCmd(
            target_qpos=tq,
            target_qvel=jnp.zeros_like(tq),
            qf=jnp.zeros_like(tq),
            kp=jnp.broadcast_to(jnp.asarray(kp), tq.shape),
            kd=jnp.broadcast_to(jnp.asarray(kd), tq.shape),
            force_limit=jnp.broadcast_to(jnp.asarray(fl), tq.shape),
        )

    def set_action(
        self, cmd: DriveCmd, qpos: jnp.ndarray, action: jnp.ndarray, aux=None
    ) -> DriveCmd:
        """Split the flat action and compute new full-dof drive targets.

        ``aux`` carries optional kinematic context (body poses) for task-space
        controllers.
        """
        tq = cmd.target_qpos
        tv = jnp.zeros(self.nq)
        qf = None
        off = 0
        for c in self.controllers.values():
            a = action[off : off + c.action_dim]
            off += c.action_dim
            sub_state = ControllerState(
                target_qpos=tq[c.joint_indices],
                target_qvel=cmd.target_qvel[c.joint_indices],
            )
            new_sub = c.set_action(sub_state, qpos, a, aux=aux) if _takes_aux(c) else c.set_action(sub_state, qpos, a)
            tq = tq.at[c.joint_indices].set(new_sub.target_qpos)
            tv = tv.at[c.joint_indices].set(new_sub.target_qvel)
            if hasattr(c, "compute_qf"):
                if qf is None:
                    qf = jnp.zeros(self.nq)
                qf = qf.at[c.joint_indices].set(c.compute_qf(qpos, a))
        if qf is None:
            return cmd.replace(target_qpos=tq, target_qvel=tv)
        return cmd.replace(target_qpos=tq, target_qvel=tv, qf=qf)


def _takes_aux(c) -> bool:
    import inspect

    return "aux" in inspect.signature(c.set_action).parameters
