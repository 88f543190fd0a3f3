"""Fetch mobile manipulator.

Mirrors the reference Fetch agent (``mani_skill/agents/robots/fetch/
fetch.py``): 15-dof articulation whose URDF carries explicit planar root
joints (x, y prismatic + z rotation — fetch.urdf), 7-dof arm, 3 body joints
(head pan/tilt, torso lift), 2-finger gripper; ego-centric
``PDBaseForwardVelController`` base + PD arm/body/gripper, same gains
(1e3/1e2/100). Collision meshes are approximated with primitives (base +
torso boxes, finger boxes); gripper friction 2.0 like the reference's
material override.
"""
from __future__ import annotations

import numpy as np

from ...physics.shapes import GeomType
from ..base_agent import BaseAgent, Keyframe, register_agent
from ..controllers.base import (
    PDBaseForwardVelControllerConfig,
    PDJointPosControllerConfig,
)

from ...utils.assets import ASSET_DIR

FETCH_URDF = str(ASSET_DIR / "robots/fetch/fetch.urdf")

ARM_JOINTS = [
    "shoulder_pan_joint", "shoulder_lift_joint", "upperarm_roll_joint",
    "elbow_flex_joint", "forearm_roll_joint", "wrist_flex_joint",
    "wrist_roll_joint",
]
BODY_JOINTS = ["head_pan_joint", "head_tilt_joint", "torso_lift_joint"]
BASE_JOINTS = ["root_x_axis_joint", "root_y_axis_joint", "root_z_rotation_joint"]
GRIPPER_JOINTS = ["l_gripper_finger_joint", "r_gripper_finger_joint"]


@register_agent
class Fetch(BaseAgent):
    uid = "fetch"
    urdf_path = FETCH_URDF
    ee_link_name = "gripper_link"

    link_friction = {
        "l_gripper_finger_link": 2.0,
        "r_gripper_finger_link": 2.0,
    }

    # reference keyframe (fetch.py:44-49), remapped by joint name at install
    keyframes = {}

    extra_collisions = [
        dict(link="base_link", type=GeomType.BOX,
             size=np.array([0.28, 0.28, 0.18], np.float32),
             offset_p=np.array([0, 0, 0.18], np.float32)),
        dict(link="torso_lift_link", type=GeomType.BOX,
             size=np.array([0.12, 0.18, 0.30], np.float32),
             offset_p=np.array([-0.08, 0, 0.25], np.float32)),
        dict(link="l_gripper_finger_link", type=GeomType.BOX,
             size=np.array([0.018, 0.007, 0.014], np.float32),
             offset_p=np.array([0, -0.009, 0], np.float32)),
        dict(link="r_gripper_finger_link", type=GeomType.BOX,
             size=np.array([0.018, 0.007, 0.014], np.float32),
             offset_p=np.array([0, 0.009, 0], np.float32)),
    ]

    REST_QPOS_BY_NAME = {
        "root_x_axis_joint": 0.0, "root_y_axis_joint": 0.0,
        "root_z_rotation_joint": 0.0, "torso_lift_joint": 0.386,
        "head_pan_joint": 0.0, "head_tilt_joint": -0.370,
        "shoulder_pan_joint": 0.562, "shoulder_lift_joint": -1.032,
        "upperarm_roll_joint": 0.695, "elbow_flex_joint": 0.955,
        "forearm_roll_joint": -0.1, "wrist_flex_joint": 2.077,
        "wrist_roll_joint": 0.0,
        "l_gripper_finger_joint": 0.015, "r_gripper_finger_joint": 0.015,
    }

    def __init__(self, control_mode=None):
        super().__init__(control_mode=control_mode)
        qpos = np.array(
            [self.REST_QPOS_BY_NAME[n] for n in self.robot_spec.joint_names],
            np.float32,
        )
        self.keyframes = dict(rest=Keyframe(qpos=qpos))

    def _controller_configs(self):
        arm_common = dict(joint_names=ARM_JOINTS, stiffness=1e3, damping=1e2,
                          force_limit=100)
        arm_pd_joint_delta_pos = PDJointPosControllerConfig(
            lower=-0.1, upper=0.1, use_delta=True, **arm_common
        )
        arm_pd_joint_pos = PDJointPosControllerConfig(
            lower=None, upper=None, normalize_action=False, **arm_common
        )
        body_pd_joint_delta_pos = PDJointPosControllerConfig(
            joint_names=BODY_JOINTS, lower=-0.1, upper=0.1, use_delta=True,
            stiffness=1e3, damping=1e2, force_limit=100,
        )
        base_pd_vel = PDBaseForwardVelControllerConfig(
            joint_names=BASE_JOINTS, lower=-0.5, upper=0.5, damping=1e3,
            force_limit=500,
        )
        gripper_pd_joint_pos = PDJointPosControllerConfig(
            joint_names=GRIPPER_JOINTS, lower=0.0, upper=0.05,
            stiffness=1e3, damping=1e2, force_limit=100, mimic=True,
        )
        return dict(
            pd_joint_delta_pos=dict(
                arm=arm_pd_joint_delta_pos, gripper=gripper_pd_joint_pos,
                body=body_pd_joint_delta_pos, base=base_pd_vel,
            ),
            pd_joint_pos=dict(
                arm=arm_pd_joint_pos, gripper=gripper_pd_joint_pos,
                body=body_pd_joint_delta_pos, base=base_pd_vel,
            ),
        )

    def is_static(self, qvel, threshold: float = 0.2):
        import jax.numpy as jnp

        arm_idx = np.asarray(
            [self.robot_spec.joint_names.index(n) for n in ARM_JOINTS]
        )
        return jnp.max(jnp.abs(qvel[..., arm_idx]), axis=-1) <= threshold
