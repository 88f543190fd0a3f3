"""XArm7 agent.

Port of the reference xArm family (``mani_skill/agents/robots/xarm/`` and
the xarm7 description shipped with the reference assets). The URDF carries
mesh-only collisions; primitive capsules are synthesized along each link's
structural axis (``auto_capsule_collisions`` — the TPU narrowphase is
primitive-based). Arm-only variant (7 dof, no gripper): suited to the
push/poke-style tabletop tasks.
"""
from __future__ import annotations

import numpy as np

from ...utils.assets import ASSET_DIR
from ..base_agent import (
    BaseAgent,
    Keyframe,
    auto_capsule_collisions,
    register_agent,
)
from ..controllers.base import (
    PDJointPosControllerConfig,
    PDJointVelControllerConfig,
)

XARM7_URDF = str(ASSET_DIR / "robots/xarm7/xarm7.urdf")

ARM_JOINTS = [f"joint{i}" for i in range(1, 8)]


@register_agent
class XArm7(BaseAgent):
    uid = "xarm7"
    urdf_path = XARM7_URDF
    ee_link_name = "link_eef"

    arm_stiffness = 1e3
    arm_damping = 1e2
    arm_force_limit = 100

    keyframes = dict(
        rest=Keyframe(
            qpos=np.array([0.0, 0.22, 0.0, 0.52, 0.0, 0.78, 0.0], np.float32)
        )
    )

    def collision_geoms(self):
        return auto_capsule_collisions(
            self.robot_spec,
            default_radius=0.05,
            radius_map={"link6": 0.04, "link7": 0.035},
        )

    def _controller_configs(self):
        common = dict(
            joint_names=ARM_JOINTS,
            stiffness=self.arm_stiffness,
            damping=self.arm_damping,
            force_limit=self.arm_force_limit,
        )
        return dict(
            pd_joint_delta_pos=dict(
                arm=PDJointPosControllerConfig(
                    lower=-0.1, upper=0.1, use_delta=True, **common
                )
            ),
            pd_joint_pos=dict(
                arm=PDJointPosControllerConfig(
                    lower=None, upper=None, normalize_action=False, **common
                )
            ),
            pd_joint_vel=dict(
                arm=PDJointVelControllerConfig(
                    damping=self.arm_damping, force_limit=self.arm_force_limit,
                    joint_names=ARM_JOINTS,
                )
            ),
        )


ALLEGRO_URDF = str(ASSET_DIR / "robots/allegro/allegro_hand_right.urdf")
DCLAW_URDF = str(ASSET_DIR / "robots/dclaw/dclaw_gripper_glb.urdf")


@register_agent
class AllegroHandRight(BaseAgent):
    """Allegro right hand, fixed base (reference
    ``agents/robots/allegro_hand/allegro.py``; 16 dof, 4 fingers).
    Auto-capsule collisions with finger-scale radii."""

    uid = "allegro_hand_right"
    urdf_path = ALLEGRO_URDF
    ee_link_name = None

    stiffness = 4e2
    damping = 10.0
    force_limit = 10.0

    def _make_robot_spec(self):
        spec = super()._make_robot_spec()
        # cradle rest pose: fingers slightly curled so a palm-facing-up
        # hand forms a lip that keeps resting objects from rolling off
        q = np.zeros(spec.nb, np.float32)
        for f in range(3):
            q[4 * f + 1:4 * f + 4] = [0.45, 0.45, 0.3]
        q[12:16] = [1.1, 0.35, 0.35, 0.3]
        self.keyframes = dict(rest=Keyframe(qpos=q))
        return spec

    def collision_geoms(self):
        return auto_capsule_collisions(
            self.robot_spec, default_radius=0.014, tip_length=0.035,
            friction=1.0,
        )

    def _controller_configs(self):
        names = list(self.robot_spec.joint_names)
        common = dict(joint_names=names, stiffness=self.stiffness,
                      damping=self.damping, force_limit=self.force_limit)
        return dict(
            pd_joint_delta_pos=dict(hand=PDJointPosControllerConfig(
                lower=-0.1, upper=0.1, use_delta=True, **common)),
            pd_joint_pos=dict(hand=PDJointPosControllerConfig(
                lower=None, upper=None, normalize_action=False, **common)),
        )


@register_agent
class DClaw(BaseAgent):
    """ROBEL D'Claw 9-dof tri-finger gripper (reference
    ``agents/robots/dclaw/dclaw.py``), fixed base, auto-capsule fingers."""

    uid = "dclaw"
    urdf_path = DCLAW_URDF
    ee_link_name = None

    stiffness = 1e2
    damping = 5.0
    force_limit = 20.0

    def _make_robot_spec(self):
        spec = super()._make_robot_spec()
        self.keyframes = dict(
            rest=Keyframe(qpos=np.zeros(spec.nb, np.float32))
        )
        return spec

    def collision_geoms(self):
        return auto_capsule_collisions(
            self.robot_spec, default_radius=0.018, tip_length=0.04,
            friction=1.0,
        )

    def _controller_configs(self):
        names = list(self.robot_spec.joint_names)
        common = dict(joint_names=names, stiffness=self.stiffness,
                      damping=self.damping, force_limit=self.force_limit)
        return dict(
            pd_joint_delta_pos=dict(claw=PDJointPosControllerConfig(
                lower=-0.1, upper=0.1, use_delta=True, **common)),
            pd_joint_pos=dict(claw=PDJointPosControllerConfig(
                lower=None, upper=None, normalize_action=False, **common)),
        )


XARM7_ABILITY_URDF = str(
    ASSET_DIR / "robots/xarm7/xarm7_ability_right_hand.urdf")

ABILITY_HAND_JOINTS = [
    "thumb_q1", "thumb_q2", "index_q1", "index_q2", "middle_q1",
    "middle_q2", "ring_q1", "ring_q2", "pinky_q1", "pinky_q2",
]


@register_agent
class XArm7Ability(BaseAgent):
    """xArm7 + PSYONIC Ability right hand (reference
    ``agents/robots/xarm/xarm7_ability.py``: 7 arm dof + 10 hand dof, arm
    kp=1e3 kd=1e2 Flim=500, hand kp=1e3 kd=1e2 Flim=50, rest keyframe
    :44-69). The URDF's finger mimic linkages (q2 = 1.0585*q1 + 0.723)
    are left as independently driven joints, matching the reference's
    controller which lists all ten hand joints. Mesh-only collisions ->
    auto-capsule synthesis with finger-scale radii."""

    uid = "xarm7_ability"
    urdf_path = XARM7_ABILITY_URDF
    ee_link_name = "base"  # the hand base (reference :101)

    arm_stiffness = 1e3
    arm_damping = 1e2
    arm_force_limit = 500
    hand_stiffness = 1e3
    hand_damping = 1e2
    hand_force_limit = 50

    keyframes = dict(
        rest=Keyframe(qpos=np.array(
            [0.0, -0.4, 0.0, 0.5, 0.0, 0.9, -3.0] + [0.0] * 10, np.float32))
    )

    def collision_geoms(self):
        radius_map = {"link6": 0.04, "link7": 0.035}
        for l in ("thumb", "index", "middle", "ring", "pinky"):
            radius_map[f"{l}_L1"] = 0.011
            radius_map[f"{l}_L2"] = 0.009
        return auto_capsule_collisions(
            self.robot_spec, default_radius=0.05, tip_length=0.03,
            radius_map=radius_map, friction=1.5,
        )

    def _controller_configs(self):
        arm_common = dict(
            joint_names=ARM_JOINTS, stiffness=self.arm_stiffness,
            damping=self.arm_damping, force_limit=self.arm_force_limit,
        )
        hand_common = dict(
            joint_names=ABILITY_HAND_JOINTS, stiffness=self.hand_stiffness,
            damping=self.hand_damping, force_limit=self.hand_force_limit,
        )
        return dict(
            pd_joint_delta_pos=dict(
                arm=PDJointPosControllerConfig(
                    lower=-0.1, upper=0.1, use_delta=True, **arm_common),
                hand=PDJointPosControllerConfig(
                    lower=-0.1, upper=0.1, use_delta=True, **hand_common),
            ),
            pd_joint_pos=dict(
                arm=PDJointPosControllerConfig(
                    lower=None, upper=None, normalize_action=False,
                    **arm_common),
                hand=PDJointPosControllerConfig(
                    lower=None, upper=None, normalize_action=False,
                    **hand_common),
            ),
        )
