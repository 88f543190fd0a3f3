"""Additional arm robots: UR10e, xArm6 (bare + Robotiq), xMate3 Robotiq,
Google Robot, floating Robotiq 2F-85 gripper.

Parity ports of the reference agent specs (gains, joint grouping,
keyframes): ``agents/robots/ur_e/ur_10e.py``,
``agents/robots/xarm6/xarm6_nogripper.py`` / ``xarm6_robotiq.py``,
``agents/robots/xmate3/xmate3.py``,
``agents/robots/googlerobot/googlerobot.py``,
``agents/robots/floating_robotiq_2f_85_gripper/``. The robot bodies are
hand-authored primitive URDFs (assets/robots/...) from public kinematic
parameters — the reference descriptions are download-only. The Robotiq
2F-85 linkage is approximated as a parallel prismatic jaw of the same
0-85 mm stroke (documented in the URDFs).
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
    PDJointVelControllerConfig,
)

ROBOTIQ_JOINTS = ["left_finger_joint", "right_finger_joint"]


class _RobotiqJawMixin:
    """Controller config + grasp checker for the simplified Robotiq jaw."""

    gripper_stiffness = 1e4
    gripper_damping = 1e3
    gripper_force_limit = 140

    link_friction = {
        "left_inner_finger_pad": 2.0,
        "right_inner_finger_pad": 2.0,
    }

    def _gripper_cfg(self):
        return PDJointPosControllerConfig(
            joint_names=ROBOTIQ_JOINTS,
            lower=0.0, upper=0.0425,
            stiffness=self.gripper_stiffness,
            damping=self.gripper_damping,
            force_limit=self.gripper_force_limit,
            mimic=True,
        )

    def build_grasp_checker(self, model, obj_name: str, min_force: float = 0.5,
                            max_angle: float = 85.0):
        from ...math.rotations import angle_between, quat_to_matrix
        from ...physics.engine import pair_force_signs
        from ...physics.model import BodyKind

        obj_idx = model.free_index[obj_name]
        lf = self.robot_spec.link_index["left_inner_finger_pad"]
        rf = self.robot_spec.link_index["right_inner_finger_pad"]
        sl = jnp.asarray(pair_force_signs(
            model, (BodyKind.ROBOT_LINK, lf), (BodyKind.FREE, obj_idx)))
        sr = jnp.asarray(pair_force_signs(
            model, (BodyKind.ROBOT_LINK, rf), (BodyKind.FREE, obj_idx)))
        max_rad = np.deg2rad(max_angle)

        def is_grasping(body_quat, f_pt):
            lvec, rvec = sl @ f_pt, sr @ f_pt
            lf_n, rf_n = jnp.linalg.norm(lvec), jnp.linalg.norm(rvec)
            ldir = -quat_to_matrix(body_quat[lf])[..., :, 1]  # closing -y
            rdir = quat_to_matrix(body_quat[rf])[..., :, 1]
            lflag = (lf_n >= min_force) & (angle_between(ldir, lvec) <= max_rad)
            rflag = (rf_n >= min_force) & (angle_between(rdir, rvec) <= max_rad)
            return lflag & rflag

        return is_grasping


def _arm_controllers(joint_names, stiffness, damping, force_limit,
                     ee_link, gripper_cfg=None, delta=0.1):
    common = dict(joint_names=joint_names, stiffness=stiffness,
                  damping=damping, force_limit=force_limit)
    arm_delta = PDJointPosControllerConfig(
        lower=-delta, upper=delta, use_delta=True, **common)
    arm_pos = PDJointPosControllerConfig(
        lower=None, upper=None, normalize_action=False, **common)
    arm_vel = PDJointVelControllerConfig(
        joint_names=joint_names, lower=-1.0, upper=1.0,
        damping=damping, force_limit=force_limit)
    modes = {}
    if gripper_cfg is None:
        modes["pd_joint_delta_pos"] = dict(arm=arm_delta)
        modes["pd_joint_pos"] = dict(arm=arm_pos)
        modes["pd_joint_vel"] = dict(arm=arm_vel)
    else:
        modes["pd_joint_delta_pos"] = dict(arm=arm_delta, gripper=gripper_cfg)
        modes["pd_joint_pos"] = dict(arm=arm_pos, gripper=gripper_cfg)
        if ee_link:
            ee_pos = PDEEPosControllerConfig(
                pos_lower=-0.1, pos_upper=0.1, ee_link=ee_link, **common)
            ee_pose = PDEEPoseControllerConfig(
                pos_lower=-0.1, pos_upper=0.1, rot_lower=-0.1, rot_upper=0.1,
                ee_link=ee_link, **common)
            modes["pd_ee_delta_pos"] = dict(arm=ee_pos, gripper=gripper_cfg)
            modes["pd_ee_delta_pose"] = dict(arm=ee_pose, gripper=gripper_cfg)
    return modes


@register_agent
class UR10e(BaseAgent):
    """Reference ``ur_10e.py``: arm-only, kp=1000 kd=100 (normalized-delta
    mode kp=1e4 kd=1e3 variant folded to the house defaults), elbow-up
    rest keyframe."""

    uid = "ur_10e"
    urdf_path = str(ASSET_DIR / "robots/ur10e/ur10e.urdf")
    ee_link_name = "tool0"

    arm_stiffness = 1e3
    arm_damping = 1e2
    arm_force_limit = 330

    keyframes = dict(
        rest=Keyframe(qpos=np.array(
            [-1.5708, -1.5708, 1.5708, -1.5708, -1.5708, 0], np.float32))
    )

    JOINTS = ["shoulder_pan_joint", "shoulder_lift_joint", "elbow_joint",
              "wrist_1_joint", "wrist_2_joint", "wrist_3_joint"]

    def _controller_configs(self):
        return _arm_controllers(self.JOINTS, self.arm_stiffness,
                                self.arm_damping, self.arm_force_limit,
                                None)


XARM6_JOINTS = [f"joint{i}" for i in range(1, 7)]


@register_agent
class XArm6NoGripper(BaseAgent):
    """Reference ``xarm6_nogripper.py``."""

    uid = "xarm6_nogripper"
    urdf_path = str(ASSET_DIR / "robots/xarm6/xarm6.urdf")
    ee_link_name = "link_eef"

    arm_stiffness = 1e4
    arm_damping = 1e3
    arm_force_limit = 100

    keyframes = dict(
        rest=Keyframe(qpos=np.array(
            [0, 0.22, -1.23, 0, 1.01, 0], np.float32))
    )

    def _controller_configs(self):
        return _arm_controllers(XARM6_JOINTS, self.arm_stiffness,
                                self.arm_damping, self.arm_force_limit,
                                None)


@register_agent
class XArm6Robotiq(_RobotiqJawMixin, BaseAgent):
    """Reference ``xarm6_robotiq.py`` (rest keyframe :35-48, arm kp=1e4
    kd=1e3 Flim=100)."""

    uid = "xarm6_robotiq"
    urdf_path = str(ASSET_DIR / "robots/xarm6/xarm6_robotiq.urdf")
    ee_link_name = "grasp_convenient_link"

    arm_stiffness = 1e4
    arm_damping = 1e3
    arm_force_limit = 100

    keyframes = dict(
        rest=Keyframe(qpos=np.array(
            [0, 0.22, -1.23, 0, 1.01, 0, 0.0425, 0.0425], np.float32))
    )

    def _controller_configs(self):
        return _arm_controllers(XARM6_JOINTS, self.arm_stiffness,
                                self.arm_damping, self.arm_force_limit,
                                self.ee_link_name,
                                gripper_cfg=self._gripper_cfg())

    def is_static(self, qvel, threshold: float = 0.2):
        return jnp.max(jnp.abs(qvel[..., :6]), axis=-1) <= threshold


@register_agent
class Xmate3Robotiq(_RobotiqJawMixin, BaseAgent):
    """Reference ``xmate3.py`` (arm kp=1e3 kd=1e2 Flim=100)."""

    uid = "xmate3_robotiq"
    urdf_path = str(ASSET_DIR / "robots/xmate3/xmate3_robotiq.urdf")
    ee_link_name = "grasp_convenient_link"

    arm_stiffness = 1e3
    arm_damping = 1e2
    arm_force_limit = 100

    JOINTS = [f"joint{i}" for i in range(1, 8)]

    keyframes = dict(
        rest=Keyframe(qpos=np.array(
            [0, 0.3, 0, 1.2, 0, 1.2, 0, 0.0425, 0.0425], np.float32))
    )

    def _controller_configs(self):
        return _arm_controllers(self.JOINTS, self.arm_stiffness,
                                self.arm_damping, self.arm_force_limit,
                                self.ee_link_name,
                                gripper_cfg=self._gripper_cfg())

    def is_static(self, qvel, threshold: float = 0.2):
        return jnp.max(jnp.abs(qvel[..., :7]), axis=-1) <= threshold


@register_agent
class GoogleRobot(_RobotiqJawMixin, BaseAgent):
    """Reference ``googlerobot.py`` (real2sim eval robot; arm on a torso
    column; the reference's mobile base/head are not modeled — static
    base, matching how the bridge-eval tasks use it)."""

    uid = "googlerobot"
    urdf_path = str(ASSET_DIR / "robots/googlerobot/google_robot.urdf")
    ee_link_name = "grasp_convenient_link"

    arm_stiffness = 2e3
    arm_damping = 2e2
    arm_force_limit = 150

    JOINTS = [f"joint_{i}" for i in range(1, 8)]

    keyframes = dict(
        rest=Keyframe(qpos=np.array(
            [0, 0.6, 0, 1.0, 0, 0.9, 0, 0.0425, 0.0425], np.float32))
    )

    def _controller_configs(self):
        return _arm_controllers(self.JOINTS, self.arm_stiffness,
                                self.arm_damping, self.arm_force_limit,
                                self.ee_link_name,
                                gripper_cfg=self._gripper_cfg())

    def is_static(self, qvel, threshold: float = 0.2):
        return jnp.max(jnp.abs(qvel[..., :7]), axis=-1) <= threshold


@register_agent
class FloatingRobotiq2F85Gripper(_RobotiqJawMixin, BaseAgent):
    """Reference ``floating_robotiq_2f_85_gripper``: the 2F-85 jaw on a
    position-controlled 6-dof floating root (grasp-centric tasks / demo
    generation without arm kinematics)."""

    uid = "floating_robotiq_2f_85_gripper"
    urdf_path = str(ASSET_DIR / "robots/robotiq/floating_robotiq_2f_85.urdf")
    ee_link_name = "grasp_convenient_link"

    root_stiffness = 1e3
    root_damping = 2e2
    root_force_limit = 200.0

    ROOT_JOINTS = ["float_x_j", "float_y_j", "float_z_j",
                   "float_rz_j", "float_ry_j", "float_rx_j"]

    keyframes = dict(
        rest=Keyframe(qpos=np.array(
            [0.0, 0.0, 0.3, 0.0, np.pi, 0.0, 0.0425, 0.0425], np.float32))
    )

    def _controller_configs(self):
        root = PDJointPosControllerConfig(
            joint_names=self.ROOT_JOINTS,
            lower=-0.1, upper=0.1, use_delta=True,
            stiffness=self.root_stiffness, damping=self.root_damping,
            force_limit=self.root_force_limit,
        )
        return dict(
            pd_joint_delta_pos=dict(root=root, gripper=self._gripper_cfg()),
        )
