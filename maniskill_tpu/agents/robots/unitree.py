"""Unitree G1 humanoid agent.

Parity port of the reference ``agents/robots/unitree_g1/g1.py``: the
37-dof G1 (legs + torso + arms + two 7-dof hands) with a floating root
(fix_root_link=False -> synthetic 6-dof base chain, kinematics/urdf.py
``float_base``), body kp=50 kd=1 Flim=100 on all 37 joints, and the
``standing`` keyframe (g1.py:19-26, mapped by joint name — the reference
array is in sapien's BFS joint order). URDF vendored (PROVENANCE.md);
collisions are auto-synthesized capsules over the mesh-only links.
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
from ..controllers.base import PDJointPosControllerConfig

G1_URDF = str(ASSET_DIR / "robots/g1_humanoid/g1.urdf")

# reference g1.py:44-82 body_joints (sapien BFS order) with the `standing`
# keyframe values (g1.py:19-26) — consumed here as a name->angle map
_STANDING = {
    "left_hip_pitch_joint": 0.0, "right_hip_pitch_joint": 0.0,
    "torso_joint": 0.0, "left_hip_roll_joint": 0.0,
    "right_hip_roll_joint": 0.0, "left_shoulder_pitch_joint": 0.0,
    "right_shoulder_pitch_joint": 0.0, "left_hip_yaw_joint": 0.0,
    "right_hip_yaw_joint": 0.0, "left_shoulder_roll_joint": 0.2,
    "right_shoulder_roll_joint": -0.2, "left_knee_joint": 0.0,
    "right_knee_joint": 0.0, "left_shoulder_yaw_joint": 0.0,
    "right_shoulder_yaw_joint": 0.0, "left_ankle_pitch_joint": 0.0,
    "right_ankle_pitch_joint": 0.0, "left_elbow_pitch_joint": 0.9,
    "right_elbow_pitch_joint": 0.9, "left_ankle_roll_joint": 0.0,
    "right_ankle_roll_joint": 0.0, "left_elbow_roll_joint": 0.0,
    "right_elbow_roll_joint": 0.0, "left_zero_joint": 0.0,
    "left_three_joint": -0.77, "left_five_joint": -0.77,
    "right_zero_joint": 0.0, "right_three_joint": 0.77,
    "right_five_joint": 0.77, "left_one_joint": 0.1,
    "left_four_joint": -0.92, "left_six_joint": -0.92,
    "right_one_joint": -0.1, "right_four_joint": 0.92,
    "right_six_joint": 0.92, "left_two_joint": 0.92,
    "right_two_joint": -0.92,
}


@register_agent
class UnitreeG1(BaseAgent):
    uid = "unitree_g1"
    urdf_path = G1_URDF
    fix_root_link = False
    balance_passive_force = False  # gravity ON (free-standing humanoid)
    ee_link_name = None

    body_stiffness = 50
    body_damping = 1
    body_force_limit = 100

    def _make_robot_spec(self):
        spec = super()._make_robot_spec()
        q = np.zeros(spec.nb, np.float32)
        q[2] = 0.755  # root_z: standing pelvis height (g1.py:21)
        for nm, v in _STANDING.items():
            q[spec.joint_names.index(nm)] = v
        self.keyframes = dict(standing=Keyframe(qpos=q))
        self._body_joints = [n for n in spec.joint_names
                             if not n.startswith("root_")]
        return spec

    def collision_geoms(self):
        radius_map = {}
        for nm in self.robot_spec.link_names:
            low = nm.lower()
            if any(k in low for k in ("zero", "one", "two", "three", "four",
                                      "five", "six", "thumb", "palm")):
                radius_map[nm] = 0.012
            elif "ankle" in low:
                radius_map[nm] = 0.025
        geoms = auto_capsule_collisions(
            self.robot_spec, default_radius=0.045, tip_length=0.04,
            radius_map=radius_map, friction=1.0,
        )
        # flat foot soles: the g1 URDF's (commented) foot contact spheres
        # span x in [-0.06, 0.13], y +-0.02 at z=-0.03 on the ankle_roll
        # links — a box sole gives the support polygon capsule feet lack
        from ...physics.shapes import GeomType

        for side in ("left", "right"):
            geoms.append(dict(
                link=f"{side}_ankle_roll_link", type=GeomType.BOX,
                size=np.array([0.095, 0.03, 0.008], np.float32),
                offset_p=np.array([0.035, 0.0, -0.022], np.float32),
                offset_q=np.array([1, 0, 0, 0], np.float32),
                friction=1.0,
            ))
        return geoms

    def _controller_configs(self):
        common = dict(
            joint_names=self._body_joints,
            stiffness=self.body_stiffness,
            damping=self.body_damping,
            force_limit=self.body_force_limit,
        )
        return dict(
            pd_joint_delta_pos=dict(body=PDJointPosControllerConfig(
                lower=-0.2, upper=0.2, use_delta=True, **common)),
            pd_joint_pos=dict(body=PDJointPosControllerConfig(
                lower=None, upper=None, normalize_action=False, **common)),
        )


@register_agent
class UnitreeG1UpperBody(UnitreeG1):
    """Fixed-base upper-body G1 — the reference's
    ``unitree_g1_simplified_upper_body`` (g1_upper_body.py): pelvis welded
    at standing height, legs frozen (here: passive + gravity-compensated),
    torso + arms + hands actuated. Used by UnitreeG1TransportBox-v1."""

    uid = "unitree_g1_upper_body"
    fix_root_link = True
    balance_passive_force = True  # frozen lower body, no gravity sag

    def _make_robot_spec(self):
        spec = BaseAgent._make_robot_spec(self)
        q = np.zeros(spec.nb, np.float32)
        for nm, v in _STANDING.items():
            q[spec.joint_names.index(nm)] = v
        # arms raised to the carry pose (reference transport_box.py:49-52)
        q[spec.joint_names.index("left_shoulder_pitch_joint")] = 1.25
        q[spec.joint_names.index("right_shoulder_pitch_joint")] = -1.25
        self.keyframes = dict(standing=Keyframe(qpos=q),
                              rest=Keyframe(qpos=q))
        upper = ("torso", "shoulder", "elbow", "zero", "one", "two",
                 "three", "four", "five", "six")
        self._body_joints = [
            n for n in spec.joint_names if any(k in n for k in upper)
        ]
        return spec
