"""PushCube-v1.

Task-parity port of the reference PushCube
(``mani_skill/envs/tasks/tabletop/push_cube.py``): same randomizations
(cube xy ~ U[-0.1,0.1]^2, goal at cube+[0.1+goal_radius, 0]), same success
condition (:179-192), same staged dense reward (:209-232), same obs extras.
Rewards/evaluate are pure JAX functions over the state pytree.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...math.pose import Pose
from ...physics.model import SceneSpecBuilder, box_geom
from ..base_env import BaseEnv, EnvState, TaskContext
from ..registration import register_env
from ..scene_builders import TableSceneBuilder


@register_env("PushCube-v1", max_episode_steps=50)
class PushCubeEnv(BaseEnv):
    SUPPORTED_ROBOTS = ["panda", "panda_wristcam", "fetch", "xarm7"]
    DEFAULT_ROBOT = "panda_wristcam"

    goal_radius = 0.1
    cube_half_size = 0.02

    def _default_sensor_configs(self):
        from ...math.pose import look_at
        from ...sensors.camera import CameraConfig
        import numpy as _np

        pose = look_at(eye=[0.3, 0, 0.6], target=[-0.1, 0, 0.1])
        return [
            CameraConfig("base_camera", _np.asarray(pose.raw), 128, 128,
                         _np.pi / 2, 0.01, 100)
        ]

    def _load_agent(self, builder: SceneSpecBuilder):
        self.table_scene = TableSceneBuilder(self)
        pose, qpos = self.table_scene.robot_pose_and_qpos(self.robot_uids)
        self.agent.install(builder, pose, init_qpos=qpos)

    def _load_scene(self, builder: SceneSpecBuilder):
        self.table_scene.build(builder)
        half = self.cube_half_size
        m = 1000.0 * (2 * half) ** 3  # density 1000 (reference build_cube)
        inertia = (2.0 / 3.0) * m * half * half * np.eye(3)
        self.obj = builder.add_free_body(
            "cube", m, inertia, [box_geom([half] * 3)]
        )
        # goal region: kinematic visual marker, no collision
        self.goal_region = builder.add_kinematic_body("goal_region")

    def _initialize_episode(self, state: EnvState, key) -> EnvState:
        k1, _ = jax.random.split(key)
        half = self.cube_half_size
        xy = jax.random.uniform(k1, (2,), minval=-0.1, maxval=0.1)
        cube_pose = jnp.concatenate([xy, jnp.array([half, 1, 0, 0, 0])])
        # goal in front of the cube (reference :171-178), flat on table
        goal_p = jnp.concatenate(
            [xy + jnp.array([0.1 + self.goal_radius, 0.0]), jnp.array([1e-3])]
        )
        # reference rotates the visual marker; physically irrelevant here
        goal_pose = jnp.concatenate([goal_p, jnp.array([1.0, 0, 0, 0])])
        sim = state.sim.replace(
            free_pose=state.sim.free_pose.at[self.obj].set(cube_pose),
            free_vel=state.sim.free_vel.at[self.obj].set(jnp.zeros(6)),
            kin_pose=state.sim.kin_pose.at[self.goal_region].set(goal_pose),
        )
        return state.replace(sim=sim)

    def evaluate(self, state: EnvState, ctx: TaskContext):
        obj_p = ctx.actor_pose("cube").p
        goal_p = ctx.actor_pose("goal_region").p
        is_obj_placed = (
            jnp.linalg.norm(obj_p[..., :2] - goal_p[..., :2]) < self.goal_radius
        ) & (obj_p[..., 2] < self.cube_half_size + 5e-3)
        return dict(success=is_obj_placed)

    def _get_obs_extra(self, state: EnvState, ctx: TaskContext, info):
        obs = dict(tcp_pose=ctx.tcp_pose.raw)
        if self.obs_mode in ("state", "state_dict"):
            obs.update(
                goal_pos=ctx.actor_pose("goal_region").p,
                obj_pose=ctx.actor_pose("cube").raw,
            )
        return obs

    def compute_dense_reward(self, state, action, info, ctx: TaskContext):
        obj_p = ctx.actor_pose("cube").p
        goal_p = ctx.actor_pose("goal_region").p
        tcp_p = ctx.tcp_pose.p
        # reaching: push from behind the cube (reference :209-217)
        tcp_push_p = obj_p + jnp.array([-self.cube_half_size - 0.005, 0, 0])
        tcp_to_push_dist = jnp.linalg.norm(tcp_push_p - tcp_p)
        reaching_reward = 1.0 - jnp.tanh(5.0 * tcp_to_push_dist)
        reward = reaching_reward

        reached = tcp_to_push_dist < 0.01
        obj_to_goal_dist = jnp.linalg.norm(obj_p[..., :2] - goal_p[..., :2])
        place_reward = 1.0 - jnp.tanh(5.0 * obj_to_goal_dist)
        reward = reward + place_reward * reached
        return jnp.where(info["success"], 3.0, reward)

    def compute_normalized_dense_reward(self, state, action, info, ctx):
        return self.compute_dense_reward(state, action, info, ctx) / 3.0


@register_env("PushCubeKitchen-v1", max_episode_steps=50)
class PushCubeKitchenEnv(PushCubeEnv):
    """PushCube on the procedural kitchen counter — exercises the
    scene-builder registry (reference scene-builder framework +
    RoboCasa-style layout swap)."""

    def _load_agent(self, builder):
        from ..scene_builders import REGISTERED_SCENE_BUILDERS

        self.table_scene = REGISTERED_SCENE_BUILDERS["kitchen_counter"](self)
        pose, qpos = self.table_scene.robot_pose_and_qpos(self.robot_uids)
        self.agent.install(builder, pose, init_qpos=qpos)
