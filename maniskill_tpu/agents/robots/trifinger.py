"""TriFingerPro agent (reference ``mani_skill/agents/robots/trifingerpro/
trifingerpro.py``): 9-dof three-finger manipulation platform. Same joint
grouping and gains (kp=1e2, kd=1e1, force limit 20). Fingertips (fused fixed
links) get sphere collision primitives (r=0.0155, the real tip radius); the
lower-finger rods get capsules.
"""
from __future__ import annotations

import numpy as np

from ...physics.shapes import GeomType
from ..base_agent import BaseAgent, Keyframe, register_agent
from ..controllers.base import PDJointPosControllerConfig

from ...utils.assets import ASSET_DIR

TRIFINGER_URDF = str(ASSET_DIR / "robots/trifinger/trifingerpro.urdf")

JOINTS = [
    f"finger_{part}_joint_{ang}"
    for ang in (0, 120, 240)
    for part in ("base_to_upper", "upper_to_middle", "middle_to_lower")
]


@register_agent
class TriFingerPro(BaseAgent):
    uid = "trifingerpro"
    urdf_path = TRIFINGER_URDF
    ee_link_name = "finger_tip_link_0"

    link_friction = {
        "finger_tip_link_0": 1.0,
        "finger_tip_link_120": 1.0,
        "finger_tip_link_240": 1.0,
    }

    extra_collisions = [
        dict(link=f"finger_tip_link_{ang}", type=GeomType.SPHERE,
             size=np.array([0.0155, 0, 0], np.float32), friction=1.0)
        for ang in (0, 120, 240)
    ]

    keyframes = dict(
        rest=Keyframe(qpos=np.tile(np.array([0.0, 0.9, -1.7], np.float32), 3))
    )

    tip_link_names = [f"finger_tip_link_{ang}" for ang in (0, 120, 240)]

    def _controller_configs(self):
        common = dict(joint_names=JOINTS, stiffness=1e2, damping=1e1,
                      force_limit=2e1)
        pd_joint_delta_pos = PDJointPosControllerConfig(
            lower=-0.1, upper=0.1, use_delta=True, **common
        )
        pd_joint_pos = PDJointPosControllerConfig(
            lower=None, upper=None, normalize_action=False, **common
        )
        return dict(
            pd_joint_delta_pos=dict(joints=pd_joint_delta_pos),
            pd_joint_pos=dict(joints=pd_joint_pos),
        )
