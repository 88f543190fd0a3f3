"""Panda (Franka Emika) agent.

Mirrors the reference Panda definition (``mani_skill/agents/robots/panda/
panda.py``): same URDF, joint grouping, gains (arm kp=1e3 kd=1e2 Flim=100,
gripper same), keyframe, gripper friction material (2.0), controller zoo.
Collision: URDF primitive boxes for the fingers (the reference URDF ships
them) plus a primitive approximation of the hand; arm links are left
collision-free for now (tabletop tasks keep them clear of the table).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...physics.shapes import GeomType
from ..base_agent import BaseAgent, Keyframe, register_agent
from ..controllers.base import (
    PDEEPosControllerConfig,
    PDEEPoseControllerConfig,
    PDJointPosControllerConfig,
    PDJointPosVelControllerConfig,
    PDJointVelControllerConfig,
)

from ...utils.assets import ASSET_DIR

PANDA_URDF = str(ASSET_DIR / "robots/panda/panda_v2.urdf")

ARM_JOINTS = [f"panda_joint{i}" for i in range(1, 8)]
GRIPPER_JOINTS = ["panda_finger_joint1", "panda_finger_joint2"]


@register_agent
class Panda(BaseAgent):
    uid = "panda"
    urdf_path = PANDA_URDF
    ee_link_name = "panda_hand_tcp"

    arm_stiffness = 1e3
    arm_damping = 1e2
    arm_force_limit = 100
    gripper_stiffness = 1e3
    gripper_damping = 1e2
    gripper_force_limit = 100

    # reference panda.py:20-32: gripper material friction 2.0
    link_friction = {
        "panda_leftfinger": 2.0,
        "panda_rightfinger": 2.0,
    }

    keyframes = dict(
        rest=Keyframe(
            qpos=np.array(
                [0.0, np.pi / 8, 0, -np.pi * 5 / 8, 0, np.pi * 3 / 4,
                 -np.pi / 4, 0.04, 0.04]
            )
        )
    )

    # keep only the "diagonal finger" + "rubber tip" boxes per finger (URDF
    # shapes 2 and 3); the mount/sledge boxes sit inside the hand volume
    urdf_collision_filter = {
        "panda_leftfinger": (2, 3),
        "panda_rightfinger": (2, 3),
    }

    # hand palm (URDF uses a mesh; primitive approximation)
    extra_collisions = [
        dict(
            link="panda_hand",
            type=GeomType.BOX,
            size=np.array([0.031, 0.1, 0.05], np.float32),
            offset_p=np.array([0, 0, 0.033], np.float32),
        )
    ]

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
        arm_pd_joint_target_delta_pos = PDJointPosControllerConfig(
            lower=-0.1, upper=0.1, use_delta=True, use_target=True, **arm_common
        )
        arm_pd_ee_delta_pos = PDEEPosControllerConfig(
            pos_lower=-0.1, pos_upper=0.1, ee_link=self.ee_link_name, **arm_common
        )
        arm_pd_ee_delta_pose = PDEEPoseControllerConfig(
            pos_lower=-0.1, pos_upper=0.1, rot_lower=-0.1, rot_upper=0.1,
            ee_link=self.ee_link_name, **arm_common
        )
        arm_pd_joint_vel = PDJointVelControllerConfig(
            joint_names=ARM_JOINTS, lower=-1.0, upper=1.0,
            damping=self.arm_damping, force_limit=self.arm_force_limit,
        )
        arm_pd_joint_pos_vel = PDJointPosVelControllerConfig(
            lower=None, upper=None, normalize_action=False, **arm_common
        )
        arm_pd_joint_delta_pos_vel = PDJointPosVelControllerConfig(
            lower=-0.1, upper=0.1, use_delta=True, **arm_common
        )
        gripper_pd_joint_pos = PDJointPosControllerConfig(
            joint_names=GRIPPER_JOINTS,
            lower=-0.01,  # reference trick: closing force on thin objects
            upper=0.04,
            stiffness=self.gripper_stiffness,
            damping=self.gripper_damping,
            force_limit=self.gripper_force_limit,
            mimic=True,
        )
        return dict(
            pd_joint_delta_pos=dict(
                arm=arm_pd_joint_delta_pos, gripper=gripper_pd_joint_pos
            ),
            pd_joint_pos=dict(arm=arm_pd_joint_pos, gripper=gripper_pd_joint_pos),
            pd_ee_delta_pos=dict(
                arm=arm_pd_ee_delta_pos, gripper=gripper_pd_joint_pos
            ),
            pd_ee_delta_pose=dict(
                arm=arm_pd_ee_delta_pose, gripper=gripper_pd_joint_pos
            ),
            pd_joint_target_delta_pos=dict(
                arm=arm_pd_joint_target_delta_pos, gripper=gripper_pd_joint_pos
            ),
            pd_joint_vel=dict(arm=arm_pd_joint_vel, gripper=gripper_pd_joint_pos),
            pd_joint_pos_vel=dict(
                arm=arm_pd_joint_pos_vel, gripper=gripper_pd_joint_pos
            ),
            pd_joint_delta_pos_vel=dict(
                arm=arm_pd_joint_delta_pos_vel, gripper=gripper_pd_joint_pos
            ),
        )


    # ------------------------------------------------------------------
    # task helpers (pure functions over state; reference panda.py:236-264)
    # ------------------------------------------------------------------
    def build_grasp_checker(self, model, obj_name: str, min_force: float = 0.5,
                            max_angle: float = 85.0):
        """Returns ``is_grasping(sim_state, body_quat, f_pt) -> bool`` using
        the reference's contact-force angle test: both fingers must feel
        >=min_force from the object, directed within max_angle of each
        finger's opening direction (its local +y / -y axis)."""
        from ...math.rotations import angle_between, quat_to_matrix
        from ...physics.engine import pair_force_signs
        from ...physics.model import BodyKind

        obj_idx = model.free_index[obj_name]
        lf = self.robot_spec.link_index["panda_leftfinger"]
        rf = self.robot_spec.link_index["panda_rightfinger"]
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
            ldir = quat_to_matrix(body_quat[lf])[..., :, 1]  # local +y
            rdir = -quat_to_matrix(body_quat[rf])[..., :, 1]
            langle = angle_between(ldir, lforce_vec)
            rangle = angle_between(rdir, rforce_vec)
            lflag = (lforce >= min_force) & (langle <= max_rad)
            rflag = (rforce >= min_force) & (rangle <= max_rad)
            return lflag & rflag

        return is_grasping

    def is_static(self, qvel: jnp.ndarray, threshold: float = 0.2):
        """Arm joints only (reference base_agent is_static excludes
        grippers)."""
        return jnp.max(jnp.abs(qvel[..., :7]), axis=-1) <= threshold


@register_agent
class PandaWristCam(Panda):
    """Reference ``panda_wristcam`` (agents/robots/panda/panda_wristcam.py):
    same body plus a hand-mounted depth camera. The sensor rides the
    ``panda_hand`` frame, looking along the tool axis (the reference mounts
    ``camera_link``; panda_v2.urdf has no camera link, so the equivalent
    hand-frame offset is used)."""

    uid = "panda_wristcam"

    @property
    def _sensor_configs(self):
        from ...sensors.camera import CameraConfig
        import numpy as _np

        # hand frame: +z along the tool axis. Camera looks along tool +z:
        # camera +x (forward) = hand +z -> rotate -90 deg about hand +y.
        q = _np.array([_np.cos(-_np.pi / 4), 0.0, _np.sin(-_np.pi / 4), 0.0])
        return [CameraConfig(
            uid="hand_camera",
            pose=_np.concatenate([[0.0, 0.0, 0.04], q]).astype(_np.float32),
            width=128, height=128, fov=_np.pi / 2,
            mount="panda_hand",
        )]
