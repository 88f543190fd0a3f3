"""Quadruped agents: ANYmal C and Unitree Go2.

Parity ports of the reference agent specs
(``mani_skill/agents/robots/anymal/anymal_c.py``,
``agents/robots/unitree_go/unitree_go2.py``): same joint names, standing
keyframes, PD gains, and pd_joint_delta_pos/pd_joint_pos control modes.
The robot bodies are hand-authored capsule MJCFs (assets/control/
anymal_c.xml, go2.xml) — the reference's meshes are download-only assets;
capsule primitives are the TPU-native collision representation anyway.
"""
from __future__ import annotations

import numpy as np

from ...kinematics.mjcf import load_mjcf
from ...utils.assets import ASSET_DIR
from ..base_agent import BaseAgent, Keyframe, register_agent
from ..controllers.base import PDJointPosControllerConfig


class _QuadrupedAgent(BaseAgent):
    mjcf_path: str = ""
    balance_passive_force = False  # gravity acts on the whole robot
    ee_link_name = None
    leg_joint_names: list = []
    standing_qpos: dict = {}
    standing_root_z: float = 0.0  # root z-slide offset at the keyframe
    stiffness = 80.0
    damping = 2.0
    force_limit = 100.0
    delta_action = 0.225  # reference anymal_c.py:67 (OIGE-matched scale)

    def _make_robot_spec(self):
        self._mjcf = load_mjcf(str(self.mjcf_path))
        spec = self._mjcf.spec
        q = np.zeros(spec.nb, np.float32)
        q[list(spec.joint_names).index("root_slide_2")] = self.standing_root_z
        for nm, v in self.standing_qpos.items():
            q[list(spec.joint_names).index(nm)] = v
        self.keyframes = dict(standing=Keyframe(qpos=q),
                              rest=Keyframe(qpos=q))
        return spec

    def collision_geoms(self):
        return [dict(g) for g in self._mjcf.collision_geoms]

    def _controller_configs(self):
        common = dict(
            joint_names=self.leg_joint_names,
            stiffness=self.stiffness,
            damping=self.damping,
            force_limit=self.force_limit,
        )
        return dict(
            pd_joint_delta_pos=dict(body=PDJointPosControllerConfig(
                lower=-self.delta_action, upper=self.delta_action,
                use_delta=True, **common)),
            pd_joint_pos=dict(body=PDJointPosControllerConfig(
                lower=None, upper=None, normalize_action=False, **common)),
        )


@register_agent
class AnymalC(_QuadrupedAgent):
    """Reference: anymal_c.py (stiffness 80, damping 2, Flim 100,
    delta ±0.225, standing keyframe :33-40)."""

    uid = "anymal_c"
    mjcf_path = ASSET_DIR / "control/anymal_c.xml"
    leg_joint_names = [
        f"{leg}_{j}" for leg in ("LF", "RF", "LH", "RH")
        for j in ("HAA", "HFE", "KFE")
    ]
    standing_qpos = {
        "LF_HAA": 0.03, "RF_HAA": -0.03, "LH_HAA": 0.03, "RH_HAA": -0.03,
        "LF_HFE": 0.4, "RF_HFE": 0.4, "LH_HFE": -0.4, "RH_HFE": -0.4,
        "LF_KFE": -0.8, "RF_KFE": -0.8, "LH_KFE": 0.8, "RH_KFE": 0.8,
    }
    standing_root_z = 0.0  # base pos is baked at 0.60 in the MJCF
    base_link = "base"
    shank_links = ["LF_SHANK", "RF_SHANK", "LH_SHANK", "RH_SHANK"]


@register_agent
class UnitreeGo2(_QuadrupedAgent):
    """Reference: unitree_go2.py (standing z=0.29, qpos [0, 0.9, -1.8]/leg
    :30-37). The reference's kp=1000/kd=100 are PhysX-iteration-scale
    gains; physically-scaled kp=60/kd=3 holds the 15 kg Go2 on our
    implicit solver with the same centimetre-level sag."""

    uid = "unitree_go2"
    mjcf_path = ASSET_DIR / "control/go2.xml"
    leg_joint_names = [
        f"{leg}_{j}" for leg in ("FL", "FR", "RL", "RR")
        for j in ("hip", "thigh", "calf")
    ]
    standing_qpos = {
        f"{leg}_{j}": v for leg in ("FL", "FR", "RL", "RR")
        for j, v in (("hip", 0.0), ("thigh", 0.9), ("calf", -1.8))
    }
    standing_root_z = -0.02  # 0.31 baked - 0.29 standing
    # physically-scaled gains for the 15 kg Go2 on the implicit solver
    # (kp=40 leaves millimetre contact chatter; 60/3 settles clean)
    stiffness = 60.0
    damping = 3.0
    force_limit = 45.0
    delta_action = 0.25
    base_link = "base"
    shank_links = ["FL_thigh_b", "FR_thigh_b", "RL_thigh_b", "RR_thigh_b"]


@register_agent
class UnitreeH1(_QuadrupedAgent):
    """Unitree H1 humanoid (reference ``agents/robots/unitree_h1/h1.py``:
    19 body joints, standing keyframe hips/ankles -0.4 knees 0.8, root z
    0.975; ~47 kg). Primitive-capsule MJCF (assets/control/h1.xml);
    physically-scaled gains for the implicit solver (reference kp=1e3
    kd=1e2 are PhysX-iteration-scale)."""

    uid = "unitree_h1"
    mjcf_path = ASSET_DIR / "control/h1.xml"
    leg_joint_names = [  # reference h1.py body_joints (all 19)
        "left_hip_yaw_joint", "right_hip_yaw_joint", "torso_joint",
        "left_hip_roll_joint", "right_hip_roll_joint",
        "left_shoulder_pitch_joint", "right_shoulder_pitch_joint",
        "left_hip_pitch_joint", "right_hip_pitch_joint",
        "left_shoulder_roll_joint", "right_shoulder_roll_joint",
        "left_knee_joint", "right_knee_joint",
        "left_shoulder_yaw_joint", "right_shoulder_yaw_joint",
        "left_ankle_joint", "right_ankle_joint",
        "left_elbow_joint", "right_elbow_joint",
    ]
    standing_qpos = {
        "left_hip_pitch_joint": -0.4, "right_hip_pitch_joint": -0.4,
        "left_knee_joint": 0.8, "right_knee_joint": 0.8,
        "left_ankle_joint": -0.4, "right_ankle_joint": -0.4,
    }
    standing_root_z = 0.0  # 0.975 baked into the MJCF
    stiffness = 200.0
    damping = 8.0
    force_limit = 200.0
    delta_action = 0.2
    base_link = "pelvis"
    shank_links = ["left_knee_link", "right_knee_link"]
