"""Prebuilt scene builders + registry.

TPU-native analogue of the reference scene-builder framework
(``mani_skill/utils/scene_builder/``): named, registered builders that lay
down static scene structure and robot mounts. ``TableSceneBuilder`` mirrors
``scene_builder/table/scene_builder.py``; ``GroundSceneBuilder`` is the
bare-floor layout locomotion/mobile tasks use; ``KitchenCounterSceneBuilder``
is a primitive procedural counter (the mesh-based ReplicaCAD/RoboCasa
dataset builders need asset meshes — out of primitive-narrowphase scope,
tracked in PLAN.md).

Registry (reference scene_builder/registration.py)::

    from maniskill_tpu.envs.scene_builders import REGISTERED_SCENE_BUILDERS
    cls = REGISTERED_SCENE_BUILDERS["table"]
"""
from __future__ import annotations

from typing import Dict, Type

import jax.numpy as jnp
import numpy as np

from ..physics.model import SceneSpecBuilder, box_geom, plane_geom

TABLE_HEIGHT = 0.9196429  # reference scene_builder.py:61

REGISTERED_SCENE_BUILDERS: Dict[str, type] = {}


def register_scene_builder(name: str):
    def deco(cls):
        REGISTERED_SCENE_BUILDERS[name] = cls
        cls.name = name
        return cls

    return deco


@register_scene_builder("table")
class TableSceneBuilder:
    """Static table + ground; robot mount poses per supported robot
    (reference scene_builder.py:19-120)."""

    # world-frame table box after the reference's rot-z-90 placement:
    # half extents swap x/y of (2.418/2, 1.209/2, H/2)
    TABLE_HALF = np.array([1.209 / 2, 2.418 / 2, TABLE_HEIGHT / 2], np.float32)
    TABLE_CENTER = np.array([-0.12, 0.0, -TABLE_HEIGHT / 2], np.float32)

    ROBOT_INIT = {
        "panda": dict(
            pose=np.array([-0.615, 0, 0, 1, 0, 0, 0], np.float32),
            qpos=np.array(
                [0.0, -np.pi / 8, 0, -np.pi * 5 / 8, 0, np.pi * 3 / 4,
                 np.pi / 4, 0.04, 0.04], np.float32,
            ),
        ),
        "panda_wristcam": dict(
            pose=np.array([-0.615, 0, 0, 1, 0, 0, 0], np.float32),
            qpos=np.array(
                [0.0, np.pi / 8, 0, -np.pi * 5 / 8, 0, np.pi * 3 / 4,
                 -np.pi / 4, 0.04, 0.04], np.float32,
            ),
        ),
        "fetch": dict(
            pose=np.array([-1.05, 0, -TABLE_HEIGHT, 1, 0, 0, 0], np.float32),
            qpos=None,  # resolved from the agent keyframe by joint name
        ),
        "xarm7": dict(
            pose=np.array([-0.52, 0, 0, 1, 0, 0, 0], np.float32),
            qpos=np.array([0.0, 0.22, 0.0, 0.52, 0.0, 0.78, 0.0],
                          np.float32),
        ),
        "xarm7_ability": dict(
            pose=np.array([-0.52, 0, 0, 1, 0, 0, 0], np.float32),
            qpos=np.array([0.0, -0.4, 0.0, 0.5, 0.0, 0.9, -3.0]
                          + [0.0] * 10, np.float32),
        ),
        # mobile dual-arm Realman stands on the floor, rotated to face the
        # table (its forward is -y at identity -> yaw +90°)
        "mobile_realman": dict(
            pose=np.array(
                [-0.85, 0, -TABLE_HEIGHT,
                 np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)], np.float32,
            ),
            qpos=None,  # agent rest keyframe
        ),
    }

    def __init__(self, env):
        self.env = env

    def build(self, builder: SceneSpecBuilder):
        builder.add_static_body(
            "table-workspace",
            np.concatenate([self.TABLE_CENTER, [1, 0, 0, 0]]).astype(np.float32),
            [box_geom(self.TABLE_HALF)],
        )
        builder.add_static_body(
            "ground",
            np.array([0, 0, -TABLE_HEIGHT, 1, 0, 0, 0], np.float32),
            [plane_geom()],
        )
        # the floor is 0.92 m below the tabletop — the arm can never reach it;
        # drop those contact candidates (static broadphase culling)
        builder.exclude_groups(["robot:*"], ["ground"])

    def robot_pose_and_qpos(self, robot_uid: str):
        cfg = self.ROBOT_INIT.get(robot_uid)
        if cfg is None:
            # unknown robot: panda's table-edge pose, the agent's own rest
            # keyframe for qpos (a panda-sized qpos would silently corrupt
            # a different-dof robot)
            kf = getattr(self.env.agent, "keyframes", {}).get("rest")
            return (self.ROBOT_INIT["panda"]["pose"],
                    None if kf is None else np.asarray(kf.qpos, np.float32))
        qpos = cfg["qpos"]
        if qpos is None and robot_uid == "fetch":
            # reference table scene fetch init (scene_builder.py:81-101)
            by_name = dict(self.env.agent.REST_QPOS_BY_NAME)
            by_name.update(
                torso_lift_joint=0.386, head_tilt_joint=0.0,
                shoulder_pan_joint=0.0, shoulder_lift_joint=-np.pi / 4,
                upperarm_roll_joint=0.0, elbow_flex_joint=np.pi / 4,
                forearm_roll_joint=0.0, wrist_flex_joint=np.pi / 3,
                wrist_roll_joint=0.0,
            )
            qpos = np.array(
                [by_name[n] for n in self.env.agent.robot_spec.joint_names],
                np.float32,
            )
        return cfg["pose"], qpos


@register_scene_builder("ground")
class GroundSceneBuilder:
    """Bare ground plane (locomotion / mobile-manipulation layouts)."""

    def __init__(self, env, friction: float = 1.0):
        self.env = env
        self.friction = friction

    def build(self, builder: SceneSpecBuilder):
        builder.add_static_body(
            "ground", np.array([0, 0, 0, 1, 0, 0, 0], np.float32),
            [plane_geom(friction=self.friction)],
        )

    def robot_pose_and_qpos(self, robot_uid: str):
        return np.array([0, 0, 0, 1, 0, 0, 0], np.float32), None


@register_scene_builder("kitchen_counter")
class KitchenCounterSceneBuilder:
    """Procedural kitchen counter: worktop at z=0 with a backsplash wall
    and a lower plinth — a primitive-geometry stand-in for the RoboCasa
    counter layouts (reference scene_builder/robocasa, mesh-based)."""

    COUNTER_HEIGHT = 0.92
    TOP_HALF = np.array([0.4, 1.0, 0.02], np.float32)

    def __init__(self, env):
        self.env = env

    def build(self, builder: SceneSpecBuilder):
        ch = self.COUNTER_HEIGHT
        builder.add_static_body(
            "counter-top",
            np.array([0.0, 0.0, -self.TOP_HALF[2], 1, 0, 0, 0], np.float32),
            [box_geom(self.TOP_HALF, friction=0.6)],
        )
        builder.add_static_body(
            "counter-body",
            np.array([0.05, 0.0, -ch / 2, 1, 0, 0, 0], np.float32),
            [box_geom([0.35, 0.98, ch / 2 - 0.02])],
        )
        builder.add_static_body(
            "backsplash",
            np.array([0.42, 0.0, 0.25, 1, 0, 0, 0], np.float32),
            [box_geom([0.02, 1.0, 0.3])],
        )
        builder.add_static_body(
            "ground",
            np.array([0, 0, -ch, 1, 0, 0, 0], np.float32),
            [plane_geom()],
        )
        builder.exclude_groups(["robot:*"], ["ground"])

    def robot_pose_and_qpos(self, robot_uid: str):
        cfg = TableSceneBuilder.ROBOT_INIT.get(
            robot_uid, TableSceneBuilder.ROBOT_INIT["panda"]
        )
        return cfg["pose"], cfg["qpos"]
