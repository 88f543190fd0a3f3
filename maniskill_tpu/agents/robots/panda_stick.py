"""PandaStick agent (reference ``mani_skill/agents/robots/panda/
panda_stick.py``): a 7-dof Panda with a stick end-effector (no gripper),
used by drawing and PushT tasks. Same arm gains as Panda."""
from __future__ import annotations

import numpy as np

from ...physics.shapes import GeomType
from ..base_agent import BaseAgent, Keyframe, register_agent
from ..controllers.base import (
    PDEEPosControllerConfig,
    PDEEPoseControllerConfig,
    PDJointPosControllerConfig,
)
from .panda import ARM_JOINTS

from ...utils.assets import ASSET_DIR

PANDA_STICK_URDF = str(ASSET_DIR / "robots/panda/panda_stick.urdf")


@register_agent
class PandaStick(BaseAgent):
    uid = "panda_stick"
    urdf_path = PANDA_STICK_URDF
    ee_link_name = "panda_hand_tcp"

    keyframes = dict(
        rest=Keyframe(
            qpos=np.array(
                [0.0, np.pi / 8, 0, -np.pi * 5 / 8, 0, np.pi * 3 / 4, -np.pi / 4],
                np.float32,
            )
        )
    )

    # the stick's cylinder collision comes straight from the URDF (the
    # reference panda_stick.urdf ships a primitive), so no extras needed

    def _controller_configs(self):
        common = dict(joint_names=ARM_JOINTS, stiffness=1e3, damping=1e2,
                      force_limit=100)
        arm_pd_joint_delta_pos = PDJointPosControllerConfig(
            lower=-0.1, upper=0.1, use_delta=True, **common
        )
        arm_pd_joint_pos = PDJointPosControllerConfig(
            lower=None, upper=None, normalize_action=False, **common
        )
        arm_pd_ee_delta_pos = PDEEPosControllerConfig(
            pos_lower=-0.1, pos_upper=0.1, ee_link=self.ee_link_name, **common
        )
        arm_pd_ee_delta_pose = PDEEPoseControllerConfig(
            pos_lower=-0.1, pos_upper=0.1, rot_lower=-0.1, rot_upper=0.1,
            ee_link=self.ee_link_name, **common
        )
        return dict(
            pd_joint_delta_pos=dict(arm=arm_pd_joint_delta_pos),
            pd_joint_pos=dict(arm=arm_pd_joint_pos),
            pd_ee_delta_pos=dict(arm=arm_pd_ee_delta_pos),
            pd_ee_delta_pose=dict(arm=arm_pd_ee_delta_pose),
        )
