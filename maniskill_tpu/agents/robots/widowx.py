"""WidowX-250 6DOF agent (the BridgeData v2 robot).

Parity port of the reference WidowX250S
(``mani_skill/agents/robots/widowx/widowx.py``) and its real2sim-tuned
bridge-dataset variant (``envs/tasks/digital_twins/bridge_dataset_eval/
base_env.py:28-126``): same joint names/grouping, the real2sim arm
stiffness/damping/force-limit vector, and the bridge gripper range
[0.015, 0.037] with mimic coupling. The robot body is a hand-authored
primitive URDF (assets/robots/widowx/wx250s.urdf) from public Interbotix
kinematic parameters — the reference's mesh description is download-only.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...utils.assets import ASSET_DIR
from ..base_agent import BaseAgent, Keyframe, register_agent
from ..controllers.base import (
    PDEEPosControllerConfig,
    PDEEPoseControllerConfig,
    PDJointPosControllerConfig,
)

WX250S_URDF = str(ASSET_DIR / "robots/widowx/wx250s.urdf")

ARM_JOINTS = [
    "waist",
    "shoulder",
    "elbow",
    "forearm_roll",
    "wrist_angle",
    "wrist_rotate",
]
GRIPPER_JOINTS = ["left_finger", "right_finger"]


@register_agent
class WidowX250S(BaseAgent):
    uid = "widowx250s"
    urdf_path = WX250S_URDF
    ee_link_name = "ee_gripper_link"

    # real2sim-tuned gains (bridge_dataset_eval/base_env.py:60-89)
    arm_stiffness = np.array(
        [1169.79, 730.0, 808.46, 1229.13, 1272.28, 1056.33], np.float32
    )
    arm_damping = np.array(
        [330.0, 180.0, 152.12, 309.62, 201.05, 269.51], np.float32
    )
    arm_force_limit = np.array([200, 200, 100, 100, 100, 100], np.float32)
    gripper_stiffness = 1000.0
    gripper_damping = 200.0
    gripper_force_limit = 60.0

    link_friction = {
        "left_finger_link": 2.0,
        "right_finger_link": 2.0,
    }

    # bridge flat-table rest pose (base_env.py:219-231) + open gripper
    keyframes = dict(
        rest=Keyframe(
            qpos=np.array(
                [-0.0184, 0.0399, 0.2224, -0.0046, 1.3652, 0.0015,
                 0.037, 0.037], np.float32
            )
        )
    )

    def _controller_configs(self):
        arm_common = dict(
            joint_names=ARM_JOINTS,
            stiffness=self.arm_stiffness,
            damping=self.arm_damping,
            force_limit=self.arm_force_limit,
        )
        arm_pd_joint_pos = PDJointPosControllerConfig(
            lower=None, upper=None, normalize_action=False, **arm_common
        )
        arm_pd_joint_delta_pos = PDJointPosControllerConfig(
            lower=-0.1, upper=0.1, use_delta=True, **arm_common
        )
        # the bridge-eval control mode: EE delta pose with target
        # accumulation (arm_pd_ee_target_delta_pose_align2 analogue)
        arm_pd_ee_delta_pose = PDEEPoseControllerConfig(
            pos_lower=-0.1, pos_upper=0.1, rot_lower=-np.pi / 2,
            rot_upper=np.pi / 2, ee_link=self.ee_link_name, **arm_common
        )
        arm_pd_ee_delta_pos = PDEEPosControllerConfig(
            pos_lower=-0.1, pos_upper=0.1, ee_link=self.ee_link_name,
            **arm_common
        )
        gripper_pd_joint_pos = PDJointPosControllerConfig(
            joint_names=GRIPPER_JOINTS,
            lower=0.015 - 0.001,  # extra clearance, base_env.py:111
            upper=0.037 + 0.001,
            stiffness=self.gripper_stiffness,
            damping=self.gripper_damping,
            force_limit=self.gripper_force_limit,
            mimic=True,
        )
        return dict(
            pd_joint_delta_pos=dict(
                arm=arm_pd_joint_delta_pos, gripper=gripper_pd_joint_pos
            ),
            pd_joint_pos=dict(
                arm=arm_pd_joint_pos, gripper=gripper_pd_joint_pos
            ),
            pd_ee_delta_pos=dict(
                arm=arm_pd_ee_delta_pos, gripper=gripper_pd_joint_pos
            ),
            pd_ee_delta_pose=dict(
                arm=arm_pd_ee_delta_pose, gripper=gripper_pd_joint_pos
            ),
        )

    def build_grasp_checker(self, model, obj_name: str, min_force: float = 0.5,
                            max_angle: float = 85.0):
        """Reference WidowX250S.is_grasping (widowx.py:34-62): contact-force
        angle test against each finger's opening direction (left +y /
        right -y in the finger frame)."""
        from ...math.rotations import angle_between, quat_to_matrix
        from ...physics.engine import pair_force_signs
        from ...physics.model import BodyKind

        obj_idx = model.free_index[obj_name]
        lf = self.robot_spec.link_index["left_finger_link"]
        rf = self.robot_spec.link_index["right_finger_link"]
        sl = jnp.asarray(
            pair_force_signs(
                model, (BodyKind.ROBOT_LINK, lf), (BodyKind.FREE, obj_idx)
            )
        )
        sr = jnp.asarray(
            pair_force_signs(
                model, (BodyKind.ROBOT_LINK, rf), (BodyKind.FREE, obj_idx)
            )
        )
        max_rad = np.deg2rad(max_angle)

        def is_grasping(body_quat, f_pt):
            lforce_vec = sl @ f_pt
            rforce_vec = sr @ f_pt
            lforce = jnp.linalg.norm(lforce_vec)
            rforce = jnp.linalg.norm(rforce_vec)
            ldir = quat_to_matrix(body_quat[lf])[..., :, 1]
            rdir = -quat_to_matrix(body_quat[rf])[..., :, 1]
            langle = angle_between(ldir, lforce_vec)
            rangle = angle_between(rdir, rforce_vec)
            lflag = (lforce >= min_force) & (langle <= max_rad)
            rflag = (rforce >= min_force) & (rangle <= max_rad)
            return lflag & rflag

        return is_grasping

    def is_static(self, qvel: jnp.ndarray, threshold: float = 0.2):
        return jnp.max(jnp.abs(qvel[..., :6]), axis=-1) <= threshold


@register_agent
class WidowX250SBridge(WidowX250S):
    """Bridge-dataset eval variant with the real evaluation camera
    (3rd_view_camera, base_env.py:41-59: Logitech C920 at the measured
    real-rig pose relative to the robot base)."""

    uid = "widowx250s_bridgedataset_flat_table"

    @property
    def _sensor_configs(self):
        from ...sensors.camera import CameraConfig

        # measured bridge rig camera pose, relative to base_link
        pose = np.array(
            [0.00, -0.16, 0.36,
             0.8992917, -0.09263245, 0.35892478, 0.23209205], np.float32
        )
        return [CameraConfig(
            uid="3rd_view_camera",
            pose=pose,
            width=128, height=128, fov=0.85,  # C920-like vertical fov
            mount="base_link",
        )]
