"""TwoRobotPushCube-v1: first multi-agent task.

Analogue of the reference two-robot tabletop family
(``mani_skill/envs/tasks/tabletop/two_robot_stack_cube.py`` /
``two_robot_pick_cube.py``: two Pandas with per-agent action spaces in one
scene). Two Pandas stand side by side; each must push ITS cube into a
shared central goal region. Success requires both cubes in the goal.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...physics.model import SceneSpecBuilder, box_geom
from ..base_env import BaseEnv, EnvState, TaskContext
from ..registration import register_env
from ..scene_builders import TableSceneBuilder


@register_env("TwoRobotPushCube-v1", max_episode_steps=100)
class TwoRobotPushCubeEnv(BaseEnv):
    SUPPORTED_ROBOTS = [("panda", "panda")]
    DEFAULT_ROBOT = ("panda", "panda")

    goal_radius = 0.08
    cube_half_size = 0.02

    def _load_agent(self, builder: SceneSpecBuilder):
        self.table_scene = TableSceneBuilder(self)
        _, qpos = self.table_scene.robot_pose_and_qpos("panda")
        poses = [
            np.array([-0.615, -0.35, 0, 1, 0, 0, 0], np.float32),
            np.array([-0.615, 0.35, 0, 1, 0, 0, 0], np.float32),
        ]
        self.agent.install(builder, poses, init_qpos=[qpos, qpos])

    def _load_scene(self, builder: SceneSpecBuilder):
        self.table_scene.build(builder)
        half = self.cube_half_size
        m = 1000.0 * (2 * half) ** 3
        inertia = (2.0 / 3.0) * m * half * half * np.eye(3)
        self.cube_a = builder.add_free_body(
            "cube_a", m, inertia, [box_geom([half] * 3)]
        )
        self.cube_b = builder.add_free_body(
            "cube_b", m, inertia, [box_geom([half] * 3)]
        )
        self.goal_region = builder.add_kinematic_body("goal_region")
        builder.exclude_pair("cube_a", "cube_b")

    def _initialize_episode(self, state: EnvState, key) -> EnvState:
        ka, kb = jax.random.split(key)
        half = self.cube_half_size
        xy_a = jax.random.uniform(
            ka, (2,), minval=jnp.array([-0.1, -0.35]),
            maxval=jnp.array([0.1, -0.2])
        )
        xy_b = jax.random.uniform(
            kb, (2,), minval=jnp.array([-0.1, 0.2]),
            maxval=jnp.array([0.1, 0.35])
        )
        quat = jnp.array([1.0, 0, 0, 0])
        goal = jnp.array([0.05, 0.0, 1e-3, 1, 0, 0, 0])
        fp = state.sim.free_pose
        fp = fp.at[self.cube_a].set(
            jnp.concatenate([xy_a, jnp.array([half]), quat]))
        fp = fp.at[self.cube_b].set(
            jnp.concatenate([xy_b, jnp.array([half]), quat]))
        sim = state.sim.replace(
            free_pose=fp,
            free_vel=state.sim.free_vel * 0.0,
            kin_pose=state.sim.kin_pose.at[self.goal_region].set(goal),
        )
        return state.replace(sim=sim)

    def _cube_in_goal(self, ctx, name):
        p = ctx.actor_pose(name).p
        g = ctx.actor_pose("goal_region").p
        return jnp.linalg.norm(p[:2] - g[:2]) < self.goal_radius

    def evaluate(self, state, ctx):
        a_in = self._cube_in_goal(ctx, "cube_a")
        b_in = self._cube_in_goal(ctx, "cube_b")
        return dict(success=a_in & b_in, cube_a_placed=a_in,
                    cube_b_placed=b_in)

    def _get_obs_extra(self, state, ctx, info):
        obs = dict(
            tcp_pose_a=self.agent.tcp_pose_of(0, ctx).raw,
            tcp_pose_b=self.agent.tcp_pose_of(1, ctx).raw,
            goal_pos=ctx.actor_pose("goal_region").p,
        )
        if "state" in self.obs_mode:
            obs.update(
                cube_a_pose=ctx.actor_pose("cube_a").raw,
                cube_b_pose=ctx.actor_pose("cube_b").raw,
            )
        return obs

    def compute_dense_reward(self, state, action, info, ctx):
        goal = ctx.actor_pose("goal_region").p
        r = jnp.zeros(())
        for i, name in [(0, "cube_a"), (1, "cube_b")]:
            cube = ctx.actor_pose(name).p
            tcp = self.agent.tcp_pose_of(i, ctx).p
            reach = 1.0 - jnp.tanh(
                5.0 * jnp.linalg.norm(tcp - cube)
            )
            push = 1.0 - jnp.tanh(
                5.0 * jnp.linalg.norm(cube[:2] - goal[:2])
            )
            r = r + reach + 2.0 * push
        return jnp.where(info["success"], 8.0, r)

    def compute_normalized_dense_reward(self, state, action, info, ctx):
        return self.compute_dense_reward(state, action, info, ctx) / 8.0
