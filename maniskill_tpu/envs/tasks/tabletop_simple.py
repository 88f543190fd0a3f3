"""PullCube-v1, PokeCube-v1, LiftPegUpright-v1.

Parity ports of three more reference tabletop tasks
(``mani_skill/envs/tasks/tabletop/{pull_cube,poke_cube,lift_peg_upright}.py``):
same randomizations, success conditions, and staged dense rewards.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...math.pose import Pose
from ...math.rotations import quat_apply, quat_from_euler
from ...physics.model import SceneSpecBuilder, box_geom
from ..base_env import BaseEnv, EnvState, TaskContext
from ..registration import register_env
from ..scene_builders import TableSceneBuilder


class _TabletopBase(BaseEnv):
    SUPPORTED_ROBOTS = ["panda", "panda_wristcam", "fetch"]
    DEFAULT_ROBOT = "panda"

    def _load_agent(self, builder: SceneSpecBuilder):
        self.table_scene = TableSceneBuilder(self)
        pose, qpos = self.table_scene.robot_pose_and_qpos(self.robot_uids)
        self.agent.install(builder, pose, init_qpos=qpos)


@register_env("PullCube-v1", max_episode_steps=50)
class PullCubeEnv(_TabletopBase):
    """Pull the cube backward into the goal region (reference pull_cube.py)."""

    goal_radius = 0.1
    cube_half_size = 0.02

    def _load_scene(self, builder):
        self.table_scene.build(builder)
        half = self.cube_half_size
        m = 1000.0 * (2 * half) ** 3
        self.obj = builder.add_free_body(
            "cube", m, (2 / 3) * m * half * half * np.eye(3), [box_geom([half] * 3)]
        )
        self.goal_region = builder.add_kinematic_body("goal_region")

    def _initialize_episode(self, state, key):
        k1, _ = jax.random.split(key)
        half = self.cube_half_size
        xy = jax.random.uniform(k1, (2,), minval=-0.1, maxval=0.1)
        cube_pose = jnp.concatenate([xy, jnp.array([half, 1, 0, 0, 0])])
        goal_p = jnp.concatenate(
            [xy - jnp.array([0.1 + self.goal_radius, 0.0]), jnp.array([1e-3])]
        )
        goal_pose = jnp.concatenate([goal_p, jnp.array([1.0, 0, 0, 0])])
        sim = state.sim.replace(
            free_pose=state.sim.free_pose.at[self.obj].set(cube_pose),
            free_vel=state.sim.free_vel.at[self.obj].set(jnp.zeros(6)),
            kin_pose=state.sim.kin_pose.at[self.goal_region].set(goal_pose),
        )
        return state.replace(sim=sim)

    def evaluate(self, state, ctx):
        obj_p = ctx.actor_pose("cube").p
        goal_p = ctx.actor_pose("goal_region").p
        return dict(
            success=jnp.linalg.norm(obj_p[:2] - goal_p[:2]) < self.goal_radius
        )

    def _get_obs_extra(self, state, ctx, info):
        obs = dict(
            tcp_pose=ctx.tcp_pose.raw, goal_pos=ctx.actor_pose("goal_region").p
        )
        if "state" in self.obs_mode:
            obs.update(obj_pose=ctx.actor_pose("cube").raw)
        return obs

    def compute_dense_reward(self, state, action, info, ctx):
        obj_p = ctx.actor_pose("cube").p
        goal_p = ctx.actor_pose("goal_region").p
        # pull from the front side (reference pull_cube.py:130-137)
        tcp_pull = obj_p + jnp.array([self.cube_half_size + 2 * 0.005, 0, 0])
        d = jnp.linalg.norm(tcp_pull - ctx.tcp_pose.p)
        reward = 1.0 - jnp.tanh(5.0 * d)
        reached = d < 0.01
        place = 1.0 - jnp.tanh(5.0 * jnp.linalg.norm(obj_p[:2] - goal_p[:2]))
        reward = reward + place * reached
        return jnp.where(info["success"], 3.0, reward)

    def compute_normalized_dense_reward(self, state, action, info, ctx):
        return self.compute_dense_reward(state, action, info, ctx) / 3.0


@register_env("PokeCube-v1", max_episode_steps=50)
class PokeCubeEnv(_TabletopBase):
    """Poke a cube with a grasped peg into the goal region
    (reference poke_cube.py)."""

    cube_half_size = 0.02
    peg_half_width = 0.025
    peg_half_length = 0.12
    goal_radius = 0.05

    def _load_scene(self, builder):
        self.table_scene.build(builder)
        half = self.cube_half_size
        m_c = 1000.0 * (2 * half) ** 3
        self.cube = builder.add_free_body(
            "cube", m_c, (2 / 3) * m_c * half * half * np.eye(3),
            [box_geom([half] * 3)],
        )
        L, w = self.peg_half_length, self.peg_half_width
        m_p = 400.0 * (2 * L) * (2 * w) * (2 * w)
        I_p = m_p / 3.0 * np.diag([2 * w * w, L * L + w * w, L * L + w * w])
        self.peg = builder.add_free_body("peg", m_p, I_p, [box_geom([L, w, w])])
        self.goal_region = builder.add_kinematic_body("goal_region")

    def _post_build(self):
        self._is_grasping_peg = self.agent.build_grasp_checker(self.model, "peg")

    def _initialize_episode(self, state, key):
        k1, k2 = jax.random.split(key)
        # peg on table (reference :111-123)
        peg_xy = jax.random.uniform(k1, (2,), minval=-0.1, maxval=0.1)
        peg_pose = jnp.concatenate(
            [peg_xy, jnp.array([self.peg_half_width, 1, 0, 0, 0])]
        )
        # cube in front of the peg head (+0.1), y randomized
        cube_y = jax.random.uniform(k2, (), minval=-0.1, maxval=0.1)
        cube_x = peg_xy[0] + self.peg_half_length + 0.1
        cube_pose = jnp.array(
            [cube_x, cube_y, self.cube_half_size, 1, 0, 0, 0]
        )
        goal_p = jnp.array(
            [cube_x + 0.05 + self.goal_radius, cube_y, 1e-3]
        )
        goal_pose = jnp.concatenate([goal_p, jnp.array([1.0, 0, 0, 0])])
        sim = state.sim.replace(
            free_pose=state.sim.free_pose.at[self.cube].set(cube_pose)
            .at[self.peg].set(peg_pose),
            free_vel=jnp.zeros_like(state.sim.free_vel),
            kin_pose=state.sim.kin_pose.at[self.goal_region].set(goal_pose),
        )
        return state.replace(sim=sim)

    def _peg_head_pos(self, ctx):
        return (
            ctx.actor_pose("peg") * Pose.create(p=jnp.array([self.peg_half_length, 0, 0]))
        ).p

    def evaluate(self, state, ctx):
        cube = ctx.actor_pose("cube")
        goal_p = ctx.actor_pose("goal_region").p
        is_cube_placed = (
            jnp.linalg.norm(cube.p[:2] - goal_p[:2]) < self.goal_radius
        )
        # z-angle alignment between peg and cube (reference :167-174)
        peg_q = ctx.actor_pose("peg").q
        ex = jnp.array([1.0, 0, 0])
        peg_dir = quat_apply(peg_q, ex)
        cube_dir = quat_apply(cube.q, ex)
        angle_diff = jnp.abs(
            jnp.arctan2(peg_dir[1], peg_dir[0]) - jnp.arctan2(cube_dir[1], cube_dir[0])
        )
        is_aligned = angle_diff < 0.05
        head_to_cube = jnp.linalg.norm(self._peg_head_pos(ctx)[:2] - cube.p[:2])
        is_close = head_to_cube <= self.cube_half_size + 0.005
        f_pt = ctx.contact_forces()
        is_grasped = self._is_grasping_peg(ctx.body_quat, f_pt)
        is_static = self.agent.is_static(state.sim.qvel, 0.2)
        return dict(
            success=is_cube_placed & is_static,
            is_cube_placed=is_cube_placed,
            is_peg_cube_fit=is_aligned & is_close,
            is_peg_grasped=is_grasped,
            angle_diff=angle_diff,
            head_to_cube_dist=head_to_cube,
        )

    def _get_obs_extra(self, state, ctx, info):
        obs = dict(
            tcp_pose=ctx.tcp_pose.raw, goal_pos=ctx.actor_pose("goal_region").p
        )
        if "state" in self.obs_mode:
            obs.update(
                cube_pose=ctx.actor_pose("cube").raw,
                peg_pose=ctx.actor_pose("peg").raw,
            )
        return obs

    def compute_dense_reward(self, state, action, info, ctx):
        tcp = ctx.tcp_pose.p
        peg_p = ctx.actor_pose("peg").p
        d = jnp.linalg.norm(tcp - peg_p)
        reached = d < 0.01
        reward = 2.0 * (1.0 - jnp.tanh(5.0 * d))
        align = 1.0 - jnp.tanh(5.0 * info["angle_diff"])
        close_r = 1.0 - jnp.tanh(5.0 * info["head_to_cube_dist"])
        grasped = info["is_peg_grasped"] & reached
        reward = jnp.where(grasped, 4.0 + close_r + align, reward)
        cube_to_goal = jnp.linalg.norm(
            ctx.actor_pose("goal_region").p - ctx.actor_pose("cube").p
        )
        place = 1.0 - jnp.tanh(5.0 * cube_to_goal)
        reward = jnp.where(info["is_peg_cube_fit"] & grasped, 7.0 + place, reward)
        static_r = 1.0 - jnp.tanh(5.0 * jnp.linalg.norm(state.sim.qvel[:-2]))
        reward = reward + static_r * info["is_cube_placed"]
        return jnp.where(info["success"], 10.0, reward)

    def compute_normalized_dense_reward(self, state, action, info, ctx):
        return self.compute_dense_reward(state, action, info, ctx) / 10.0


@register_env("LiftPegUpright-v1", max_episode_steps=50)
class LiftPegUprightEnv(_TabletopBase):
    """Stand a lying peg upright (reference lift_peg_upright.py)."""

    peg_half_width = 0.025
    peg_half_length = 0.12

    def _load_scene(self, builder):
        self.table_scene.build(builder)
        L, w = self.peg_half_length, self.peg_half_width
        m = 400.0 * (2 * L) * (2 * w) * (2 * w)
        I = m / 3.0 * np.diag([2 * w * w, L * L + w * w, L * L + w * w])
        self.peg = builder.add_free_body("peg", m, I, [box_geom([L, w, w])])

    def _post_build(self):
        self._is_grasping_peg = self.agent.build_grasp_checker(self.model, "peg")

    def _initialize_episode(self, state, key):
        k1, _ = jax.random.split(key)
        xy = jax.random.uniform(k1, (2,), minval=-0.1, maxval=0.1)
        q = quat_from_euler(jnp.array([jnp.pi / 2, 0.0, 0.0]))
        pose = jnp.concatenate([xy, jnp.array([self.peg_half_width]), q])
        sim = state.sim.replace(
            free_pose=state.sim.free_pose.at[self.peg].set(pose),
            free_vel=jnp.zeros_like(state.sim.free_vel),
        )
        return state.replace(sim=sim)

    def evaluate(self, state, ctx):
        peg = ctx.actor_pose("peg")
        # peg long axis (x) vertical within 0.08 rad (reference :89-96)
        x_w = quat_apply(peg.q, jnp.array([1.0, 0, 0]))
        tilt = jnp.arccos(jnp.clip(jnp.abs(x_w[2]), 0.0, 1.0))
        is_upright = tilt < 0.08
        close = jnp.abs(peg.p[2] - self.peg_half_length) < 0.005
        return dict(success=is_upright & close)

    def _get_obs_extra(self, state, ctx, info):
        obs = dict(tcp_pose=ctx.tcp_pose.raw)
        if "state" in self.obs_mode:
            obs.update(obj_pose=ctx.actor_pose("peg").raw)
        return obs

    def compute_dense_reward(self, state, action, info, ctx):
        peg = ctx.actor_pose("peg")
        x_w = quat_apply(peg.q, jnp.array([1.0, 0, 0]))
        rot_rew = jnp.abs(x_w[2])
        reward = rot_rew
        z_dist = jnp.abs(peg.p[2] - self.peg_half_length)
        reward = reward + 1.0 - jnp.tanh(5.0 * z_dist)
        to_grip = jnp.linalg.norm(peg.p - ctx.tcp_pose.p)
        f_pt = ctx.contact_forces()
        grasped = self._is_grasping_peg(ctx.body_quat, f_pt)
        reaching = jnp.where(grasped, 1.0, 1.0 - jnp.tanh(5.0 * to_grip))
        reward = reward + reaching / 5.0
        return jnp.where(info["success"], 3.0, reward)

    def compute_normalized_dense_reward(self, state, action, info, ctx):
        return self.compute_dense_reward(state, action, info, ctx) / 3.0
