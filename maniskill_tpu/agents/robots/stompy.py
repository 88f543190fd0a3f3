"""Stompy humanoid agent (simplified).

Parity port of the reference ``agents/robots/stompy/stompy.py``: the
open-source Stompy humanoid with a floating root, two gripper hands
(reference gripper links ``link_left_arm_2_hand_1_gripper_1/2``,
``link_right_arm_1_hand_1_gripper_1/2``) and ``pd_joint_pos`` /
``pd_joint_delta_pos`` whole-body controllers (stiffness 100/20,
damping 10/5, stompy.py:92-116). The upstream 37-dof robot.urdf is an
external asset pack (download id "stompy") that is not vendored; the
vendored model is an original simplified 26-dof primitive URDF — the
reference file itself carries "TODO (add a simplified stompy)".
"""
from __future__ import annotations

import numpy as np

from ...utils.assets import ASSET_DIR
from ..base_agent import BaseAgent, Keyframe, register_agent
from ..controllers.base import PDJointPosControllerConfig

STOMPY_URDF = str(ASSET_DIR / "robots/stompy/stompy_simplified.urdf")

# standing keyframe: arms slightly bent, legs straight (the reference
# `standing` keyframe's intent at simplified-joint resolution)
_STANDING = {
    "joint_left_arm_shoulder_pitch": 0.2,
    "joint_right_arm_shoulder_pitch": 0.2,
    "joint_left_arm_shoulder_roll": 0.15,
    "joint_right_arm_shoulder_roll": -0.15,
    "joint_left_arm_elbow": -0.6,
    "joint_right_arm_elbow": -0.6,
    "joint_left_leg_knee": 0.1,
    "joint_right_leg_knee": 0.1,
    "joint_left_leg_hip_pitch": -0.05,
    "joint_right_leg_hip_pitch": -0.05,
    "joint_left_leg_ankle_pitch": -0.05,
    "joint_right_leg_ankle_pitch": -0.05,
}


@register_agent
class Stompy(BaseAgent):
    uid = "stompy"
    urdf_path = STOMPY_URDF
    fix_root_link = False  # reference fix_root_link = False
    balance_passive_force = False
    ee_link_name = "link_left_arm_2_hand_1"

    body_stiffness = 100
    body_damping = 10
    body_force_limit = 100

    def _make_robot_spec(self):
        spec = super()._make_robot_spec()
        q = np.zeros(spec.nb, np.float32)
        q[2] = 0.82  # root_z: standing pelvis height
        for nm, v in _STANDING.items():
            q[spec.joint_names.index(nm)] = v
        self.keyframes = dict(standing=Keyframe(qpos=q))
        self._body_joints = [n for n in spec.joint_names
                             if not n.startswith("root_")]
        return spec

    def _controller_configs(self):
        common = dict(
            joint_names=self._body_joints,
            force_limit=self.body_force_limit,
        )
        return dict(
            pd_joint_pos=dict(body=PDJointPosControllerConfig(
                lower=None, upper=None, normalize_action=False,
                stiffness=self.body_stiffness, damping=self.body_damping,
                **common)),
            pd_joint_delta_pos=dict(body=PDJointPosControllerConfig(
                lower=-0.1, upper=0.1, use_delta=True,
                stiffness=20, damping=5, **common)),
        )
