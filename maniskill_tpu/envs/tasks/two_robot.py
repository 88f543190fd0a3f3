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
    # the push task's cubes never need to touch; the stack subclass MUST
    # let them collide (cube A rests on cube B)
    _exclude_cube_pair = True

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
        if self._exclude_cube_pair:
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


@register_env("TwoRobotPickCube-v1", max_episode_steps=100)
class TwoRobotPickCubeEnv(BaseEnv):
    """Reference ``two_robot_pick_cube.py:20``: the cube spawns within
    reach of only the LEFT arm, the aerial goal within reach of only the
    RIGHT arm — the arms must hand the cube over. Success = cube at goal
    and the right arm static (:130-140)."""

    SUPPORTED_ROBOTS = [("panda_wristcam", "panda_wristcam"),
                        ("panda", "panda")]
    DEFAULT_ROBOT = ("panda_wristcam", "panda_wristcam")

    cube_half_size = 0.02
    goal_thresh = 0.025

    def _load_agent(self, builder: SceneSpecBuilder):
        self.table_scene = TableSceneBuilder(self)
        _, qpos = self.table_scene.robot_pose_and_qpos("panda")
        poses = [
            np.array([-0.615, -0.35, 0, 1, 0, 0, 0], np.float32),  # left
            np.array([-0.615, 0.35, 0, 1, 0, 0, 0], np.float32),   # right
        ]
        self.agent.install(builder, poses, init_qpos=[qpos, qpos])

    def _load_scene(self, builder: SceneSpecBuilder):
        self.table_scene.build(builder)
        half = self.cube_half_size
        m = 1000.0 * (2 * half) ** 3
        inertia = (2.0 / 3.0) * m * half * half * np.eye(3)
        self.cube = builder.add_free_body(
            "cube", m, inertia, [box_geom([half] * 3)]
        )
        self.goal_site = builder.add_kinematic_body("goal_site")

    def _initialize_episode(self, state: EnvState, key) -> EnvState:
        kc, kg = jax.random.split(key)
        half = self.cube_half_size
        # cube on the LEFT side (y < 0), goal in the air on the RIGHT
        xy = jax.random.uniform(kc, (2,), minval=jnp.array([-0.1, -0.3]),
                                maxval=jnp.array([0.1, -0.15]))
        kgxy, kgz = jax.random.split(kg)
        goal_xy = jax.random.uniform(kgxy, (2,),
                                     minval=jnp.array([-0.1, 0.15]),
                                     maxval=jnp.array([0.1, 0.3]))
        goal_z = jax.random.uniform(kgz, (), minval=0.15, maxval=0.3)
        sim = state.sim.replace(
            free_pose=state.sim.free_pose.at[self.cube].set(
                jnp.concatenate([xy, jnp.array([half, 1.0, 0, 0, 0])])),
            free_vel=state.sim.free_vel * 0.0,
            kin_pose=state.sim.kin_pose.at[self.goal_site].set(
                jnp.concatenate([goal_xy, goal_z[None],
                                 jnp.array([1.0, 0, 0, 0])])),
        )
        return state.replace(sim=sim)

    def evaluate(self, state, ctx):
        placed = jnp.linalg.norm(
            ctx.actor_pose("cube").p - ctx.actor_pose("goal_site").p
        ) <= self.goal_thresh
        # right arm joints are the second agent's slice
        sl = self.agent.qpos_slice_of(1)
        right_static = jnp.max(
            jnp.abs(state.sim.qvel[..., sl])) <= 0.2
        return dict(success=placed & right_static, is_obj_placed=placed,
                    is_right_arm_static=right_static)

    def _get_obs_extra(self, state, ctx, info):
        obs = dict(
            left_arm_tcp=self.agent.tcp_pose_of(0, ctx).raw,
            right_arm_tcp=self.agent.tcp_pose_of(1, ctx).raw,
            goal_pos=ctx.actor_pose("goal_site").p,
        )
        if "state" in self.obs_mode:
            cube = ctx.actor_pose("cube")
            obs.update(
                cube_pose=cube.raw,
                left_arm_tcp_to_cube_pos=cube.p
                - self.agent.tcp_pose_of(0, ctx).p,
                right_arm_tcp_to_cube_pos=cube.p
                - self.agent.tcp_pose_of(1, ctx).p,
            )
        return obs

    def compute_dense_reward(self, state, action, info, ctx):
        # staged (reference :156-213): left reaches/brings cube toward the
        # middle; right reaches the cube once central; then place at goal
        cube = ctx.actor_pose("cube").p
        goal = ctx.actor_pose("goal_site").p
        ltcp = self.agent.tcp_pose_of(0, ctx).p
        rtcp = self.agent.tcp_pose_of(1, ctx).p
        left_reach = 1.0 - jnp.tanh(5.0 * jnp.linalg.norm(ltcp - cube))
        to_middle = 1.0 - jnp.tanh(
            5.0 * jnp.abs(cube[1] - 0.0))
        right_reach = 1.0 - jnp.tanh(5.0 * jnp.linalg.norm(rtcp - cube))
        in_middle = (jnp.abs(cube[1]) < 0.08).astype(jnp.float32)
        place = 1.0 - jnp.tanh(5.0 * jnp.linalg.norm(cube - goal))
        reward = (left_reach + to_middle
                  + in_middle * (right_reach + 2.0 * place))
        return jnp.where(info["success"], 8.0, reward)

    def compute_normalized_dense_reward(self, state, action, info, ctx):
        return self.compute_dense_reward(state, action, info, ctx) / 8.0


@register_env("TwoRobotStackCube-v1", max_episode_steps=100)
class TwoRobotStackCubeEnv(TwoRobotPushCubeEnv):
    """Reference ``two_robot_stack_cube.py``: each arm can reach only its
    own cube; they must cooperate to bring cube B to the middle goal and
    stack cube A on it. Success (ref :178-193) = cube A on cube B, cube B
    in the goal region, and BOTH cubes released (not grasped)."""

    _exclude_cube_pair = False  # cube A must be able to rest on cube B

    def _post_build(self):
        self._is_grasping_a = self.agent.build_grasp_checker_of(
            0, self.model, "cube_a")
        self._is_grasping_b = self.agent.build_grasp_checker_of(
            1, self.model, "cube_b")

    def evaluate(self, state, ctx):
        half = self.cube_half_size
        pa = ctx.actor_pose("cube_a").p
        pb = ctx.actor_pose("cube_b").p
        goal = ctx.actor_pose("goal_region").p
        offset = pa - pb
        xy_ok = jnp.linalg.norm(offset[:2]) <= 0.6 * half
        z_ok = jnp.abs(offset[2] - 2 * half) <= 0.005
        stacked = xy_ok & z_ok
        b_placed = jnp.linalg.norm(pb[:2] - goal[:2]) < self.goal_radius
        f_pt = ctx.contact_forces()
        grasped_a = self._is_grasping_a(ctx.body_quat, f_pt)
        grasped_b = self._is_grasping_b(ctx.body_quat, f_pt)
        return dict(
            success=stacked & b_placed & (~grasped_a) & (~grasped_b),
            is_cubeA_on_cubeB=stacked,
            cubeB_placed=b_placed,
            is_cubeA_grasped=grasped_a,
            is_cubeB_grasped=grasped_b,
        )

    def compute_dense_reward(self, state, action, info, ctx):
        half = self.cube_half_size
        pa = ctx.actor_pose("cube_a").p
        pb = ctx.actor_pose("cube_b").p
        goal = ctx.actor_pose("goal_region").p
        ltcp = self.agent.tcp_pose_of(0, ctx).p
        rtcp = self.agent.tcp_pose_of(1, ctx).p
        # stage 1 (ref :215-237): both arms reach + left grasps cube A
        reach = (1.0 - jnp.tanh(5.0 * jnp.linalg.norm(ltcp - pa))) + (
            1.0 - jnp.tanh(5.0 * jnp.linalg.norm(rtcp - pb)))
        ga = info["is_cubeA_grasped"].astype(jnp.float32)
        gb = info["is_cubeB_grasped"].astype(jnp.float32)
        reward = (reach + ga + gb) / 2.0
        # stage 2 (ref :240-268): bring cube B to the goal region
        bring_b = 1.0 - jnp.tanh(
            5.0 * jnp.linalg.norm(pb[:2] - goal[:2]))
        reward = jnp.where(info["is_cubeA_grasped"],
                           2.0 + bring_b, reward)
        # stage 3: cube B placed -> stack A on top
        target = pb + jnp.array([0.0, 0.0, 2 * half])
        stack_a = 1.0 - jnp.tanh(5.0 * jnp.linalg.norm(pa - target))
        reward = jnp.where(
            info["cubeB_placed"] & info["is_cubeA_grasped"],
            4.0 + stack_a, reward)
        # stage 4 (ref :271-286): stacked -> both release
        ungrasp = 2.0 - ga - gb
        reward = jnp.where(
            info["is_cubeA_on_cubeB"] & info["cubeB_placed"],
            8.0 + ungrasp / 2.0, reward)
        return jnp.where(info["success"], 10.0, reward)

    def compute_normalized_dense_reward(self, state, action, info, ctx):
        return self.compute_dense_reward(state, action, info, ctx) / 10.0
