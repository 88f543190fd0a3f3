"""Realman mobile dual-arm robot (the fork's flagship mobile manipulator).

Parity port of the fork's ``mani_skill/agents/robots/realman/
mobile_realman.py``: the dual-RM65B 41-dof platform — planar mobile base
(x/y prismatic + yaw, URDF root joints like Fetch), 2-dof head, two 6-dof
arms, two 12-dof Inspire-style hands — with the reference gains
(arm/head/finger kp=1e3 kd=1e2). URDF vendored from the fork's in-repo
robot description (``assets/robots/realman/dual_65B_arm_robot``,
third-party data; meshes not vendored — collisions are auto-synthesized
capsules, the TPU-native stand-in, assets/PROVENANCE.md).
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
    PDBaseForwardVelControllerConfig,
    PDJointPosControllerConfig,
)

REALMAN_URDF = str(ASSET_DIR / "robots/realman/dual_65B_arm_robot.urdf")

BASE_JOINTS = ["root_x_axis_joint", "root_y_axis_joint",
               "root_z_rotation_joint"]
HEAD_JOINTS = ["head_joint1", "head_joint2"]
ARM_JOINTS = [f"{s}_joint{i}" for s in ("r", "l") for i in range(1, 7)]
FINGER_JOINTS = [
    f"{side}_{f}_joint" for side in ("right", "left")
    for f in ("thumb_1", "thumb_2", "thumb_3", "thumb_4",
              "index_1", "index_2", "middle_1", "middle_2",
              "ring_1", "ring_2", "little_1", "little_2")
]


@register_agent
class Realman(BaseAgent):
    uid = "mobile_realman"
    urdf_path = REALMAN_URDF
    ee_link_name = "r_link6"  # mobile_realman.py:137
    balance_passive_force = True

    def _make_robot_spec(self):
        spec = super()._make_robot_spec()
        # reference rest keyframe: all zeros (mobile_realman.py:60-67)
        self.keyframes = dict(
            rest=Keyframe(qpos=np.zeros(spec.nb, np.float32))
        )
        return spec

    def collision_geoms(self):
        radius_map = {}
        for nm in self.robot_spec.link_names:
            low = nm.lower()
            if any(k in low for k in ("thumb", "index", "middle", "ring",
                                      "little", "hand")):
                radius_map[nm] = 0.011
            elif "wheel" in low or "dipan" in low or "base" in low:
                radius_map[nm] = 0.10
        return auto_capsule_collisions(
            self.robot_spec, default_radius=0.045, radius_map=radius_map,
            friction=1.0,
        )

    def _controller_configs(self):
        arm = dict(joint_names=ARM_JOINTS, stiffness=1e3, damping=1e2,
                   force_limit=100)
        head = dict(joint_names=HEAD_JOINTS, stiffness=1e3, damping=1e2,
                    force_limit=100)
        fingers = dict(joint_names=FINGER_JOINTS, stiffness=1e3,
                       damping=1e2, force_limit=50)
        base_pd_vel = PDBaseForwardVelControllerConfig(
            joint_names=BASE_JOINTS, lower=-0.5, upper=0.5, damping=1e3,
            force_limit=500,
        )
        return dict(
            pd_joint_delta_pos=dict(
                arm=PDJointPosControllerConfig(
                    lower=-0.1, upper=0.1, use_delta=True, **arm),
                head=PDJointPosControllerConfig(
                    lower=-0.1, upper=0.1, use_delta=True, **head),
                fingers=PDJointPosControllerConfig(
                    lower=-0.1, upper=0.1, use_delta=True, **fingers),
                base=base_pd_vel,
            ),
            pd_joint_pos=dict(
                arm=PDJointPosControllerConfig(
                    lower=None, upper=None, normalize_action=False, **arm),
                head=PDJointPosControllerConfig(
                    lower=None, upper=None, normalize_action=False, **head),
                fingers=PDJointPosControllerConfig(
                    lower=None, upper=None, normalize_action=False,
                    **fingers),
                base=base_pd_vel,
            ),
        )

    def build_grasp_checker(self, model, obj_name: str,
                            min_force: float = 0.5, max_angle: float = 85.0):
        """Right-hand grasp test: the thumb and the opposing fingers
        (index+middle) must both press the object with >= min_force
        (the reference's contact-force test adapted to the 12-dof Inspire
        hand; mobile_realman.py right hand)."""
        import jax.numpy as jnp
        from ...physics.engine import pair_force_signs
        from ...physics.model import BodyKind

        obj_idx = model.free_index[obj_name]
        names = list(self.robot_spec.link_names)
        thumb = [names.index(n) for n in names
                 if n.startswith("right_thumb")]
        fingers = [names.index(n) for n in names
                   if n.startswith(("right_index", "right_middle"))]
        import numpy as _np

        st = _np.zeros(model.n_points, _np.float32)
        sf = _np.zeros(model.n_points, _np.float32)
        for b in thumb:
            st += pair_force_signs(
                model, (BodyKind.ROBOT_LINK, b), (BodyKind.FREE, obj_idx))
        for b in fingers:
            sf += pair_force_signs(
                model, (BodyKind.ROBOT_LINK, b), (BodyKind.FREE, obj_idx))
        st_j, sf_j = jnp.asarray(st), jnp.asarray(sf)

        def is_grasping(body_quat, f_pt):
            tf = jnp.linalg.norm(st_j @ f_pt)
            ff = jnp.linalg.norm(sf_j @ f_pt)
            return (tf >= min_force) & (ff >= min_force)

        return is_grasping

    def is_static(self, qvel, threshold: float = 0.2):
        import jax.numpy as jnp
        import numpy as _np

        arm_idx = _np.asarray(
            [self.robot_spec.joint_names.index(n) for n in ARM_JOINTS]
        )
        return jnp.max(jnp.abs(qvel[..., arm_idx]), axis=-1) <= threshold
