"""PickCube-v1.

Task-parity port of the reference PickCube
(``mani_skill/envs/tasks/tabletop/pick_cube.py``): same randomizations (cube
xy ~ U[-0.1,0.1]^2 with random yaw; goal xy ~ U[-0.1,0.1]^2, z ~ cube_z +
U[0,0.3]), same success (placed within goal_thresh AND robot static), same
staged dense reward (reach → grasp → place → static, max 5), same obs extras.
``is_grasped`` uses the contact-force angle test (reference panda.py:236-264)
over the engine's compliant contact forces.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...math.rotations import quat_from_axis_angle
from ...physics.model import SceneSpecBuilder, box_geom
from ..base_env import BaseEnv, EnvState, TaskContext
from ..registration import register_env
from ..scene_builders import TableSceneBuilder


@register_env("PickCube-v1", max_episode_steps=50)
class PickCubeEnv(BaseEnv):
    SUPPORTED_ROBOTS = ["panda", "panda_wristcam", "fetch"]
    DEFAULT_ROBOT = "panda"

    cube_half_size = 0.02
    goal_thresh = 0.025

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
        m = 1000.0 * (2 * half) ** 3
        inertia = (2.0 / 3.0) * m * half * half * np.eye(3)
        self.cube = builder.add_free_body("cube", m, inertia, [box_geom([half] * 3)])
        self.goal_site = builder.add_kinematic_body("goal_site")

    def _post_build(self):
        self._is_grasping = self.agent.build_grasp_checker(self.model, "cube")

    def _initialize_episode(self, state: EnvState, key) -> EnvState:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        half = self.cube_half_size
        xy = jax.random.uniform(k1, (2,), minval=-0.1, maxval=0.1)
        yaw = jax.random.uniform(k2, (), minval=-jnp.pi, maxval=jnp.pi)
        q = quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), yaw)
        cube_pose = jnp.concatenate([xy, jnp.array([half]), q])
        goal_xy = jax.random.uniform(k3, (2,), minval=-0.1, maxval=0.1)
        goal_z = jax.random.uniform(k4, (), minval=0.0, maxval=0.3) + half
        goal_pose = jnp.concatenate([goal_xy, goal_z[None], jnp.array([1.0, 0, 0, 0])])
        sim = state.sim.replace(
            free_pose=state.sim.free_pose.at[self.cube].set(cube_pose),
            free_vel=state.sim.free_vel.at[self.cube].set(jnp.zeros(6)),
            kin_pose=state.sim.kin_pose.at[self.goal_site].set(goal_pose),
        )
        return state.replace(sim=sim)

    def evaluate(self, state: EnvState, ctx: TaskContext):
        cube_p = ctx.actor_pose("cube").p
        goal_p = ctx.actor_pose("goal_site").p
        is_obj_placed = jnp.linalg.norm(goal_p - cube_p) <= self.goal_thresh
        f_pt = ctx.contact_forces()
        is_grasped = self._is_grasping(ctx.body_quat, f_pt)
        is_robot_static = self.agent.is_static(state.sim.qvel, 0.2)
        return dict(
            success=is_obj_placed & is_robot_static,
            is_obj_placed=is_obj_placed,
            is_robot_static=is_robot_static,
            is_grasped=is_grasped,
        )

    def _get_obs_extra(self, state: EnvState, ctx: TaskContext, info):
        obs = dict(
            is_grasped=info["is_grasped"],
            tcp_pose=ctx.tcp_pose.raw,
            goal_pos=ctx.actor_pose("goal_site").p,
        )
        if "state" in self.obs_mode:
            cube = ctx.actor_pose("cube")
            obs.update(
                obj_pose=cube.raw,
                tcp_to_obj_pos=cube.p - ctx.tcp_pose.p,
                obj_to_goal_pos=ctx.actor_pose("goal_site").p - cube.p,
            )
        return obs

    def compute_dense_reward(self, state, action, info, ctx: TaskContext):
        cube_p = ctx.actor_pose("cube").p
        goal_p = ctx.actor_pose("goal_site").p
        tcp_to_obj_dist = jnp.linalg.norm(cube_p - ctx.tcp_pose.p)
        reward = 1.0 - jnp.tanh(5.0 * tcp_to_obj_dist)

        is_grasped = info["is_grasped"].astype(jnp.float32)
        reward = reward + is_grasped

        obj_to_goal_dist = jnp.linalg.norm(goal_p - cube_p)
        place_reward = 1.0 - jnp.tanh(5.0 * obj_to_goal_dist)
        reward = reward + place_reward * is_grasped

        qvel_arm = state.sim.qvel[:-2]  # reference: excludes gripper for panda
        static_reward = 1.0 - jnp.tanh(5.0 * jnp.linalg.norm(qvel_arm))
        reward = reward + static_reward * info["is_obj_placed"].astype(jnp.float32)

        return jnp.where(info["success"], 5.0, reward)

    def compute_normalized_dense_reward(self, state, action, info, ctx):
        return self.compute_dense_reward(state, action, info, ctx) / 5.0
