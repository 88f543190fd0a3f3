"""Control-mode conversion for recorded trajectories.

Port of the reference's action-conversion machinery
(``mani_skill/trajectory/utils/actions/conversion.py`` +
``replay_trajectory.py:110-253`` ``from_pd_joint_pos``): recorded demos
carry env states (including the controller's drive targets), from which an
equivalent action sequence for a DIFFERENT target controller is derived.

Supported targets: the PD joint-position family (absolute / delta /
target-delta, normalized or not). Task-space targets (pd_ee_*) would need
per-step IK inversion and are not yet supported — same restriction the
reference applies to non-joint-space source controllers.
"""
from __future__ import annotations

import numpy as np


def qpos_targets_to_actions(env, qpos_traj, target_qpos_traj):
    """Convert a recorded (T, nq_robot) drive-target trajectory into actions
    for ``env``'s CURRENT controller.

    Args:
      env: target env (its controller defines the action semantics).
      qpos_traj: (T, nq) robot joint positions BEFORE each step.
      target_qpos_traj: (T, nq) drive targets commanded at each step.

    Returns (T, action_dim) float32 actions.
    """
    comp = env.agent.controller
    T = target_qpos_traj.shape[0]
    actions = np.zeros((T, comp.action_dim), np.float32)
    off = 0
    for c in comp.controllers.values():
        idx = np.asarray(c.joint_indices)
        nj = c.action_dim
        cfg = getattr(c, "cfg", None) or getattr(c, "config", None)
        use_delta = bool(getattr(cfg, "use_delta", False)) if cfg else False
        mimic = bool(getattr(c, "mimic", False))
        tq = target_qpos_traj[:, idx]
        q = qpos_traj[:, idx]
        if use_delta:
            raw = tq - q
        else:
            raw = tq
        if mimic:
            raw = raw[:, :1]
        lo = np.asarray(c.raw_low)[: raw.shape[1]]
        hi = np.asarray(c.raw_high)[: raw.shape[1]]
        if getattr(c, "normalize_action", False):
            # inverse of clip_and_scale_action
            mid = 0.5 * (hi + lo)
            half = 0.5 * (hi - lo)
            a = np.clip((raw - mid) / np.maximum(half, 1e-9), -1.0, 1.0)
        else:
            a = np.clip(raw, lo, hi)
        actions[:, off:off + nj] = a
        off += nj
    return actions
