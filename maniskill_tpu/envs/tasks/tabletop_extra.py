"""Tabletop tail tasks: RollBall, PlaceSphere, PullCubeTool, Empty.

Parity ports of the remaining reference tabletop family members:
- ``RollBall-v1`` (``tabletop/roll_ball.py:21``): roll a ball into a far
  goal region; staged reward with a reached-latch (:153-175).
- ``PlaceSphere-v1`` (``tabletop/place_sphere.py:24``): place a small
  sphere into a shallow bin built from five blocks.
- ``PullCubeTool-v1`` (``tabletop/pull_cube_tool.py:20``): use an
  L-shaped tool to pull a cube that is beyond direct reach (:192-207).
- ``Empty-v1`` (``empty_env.py``): a bare robot sandbox.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...physics.model import SceneSpecBuilder, box_geom, sphere_geom
from ..base_env import BaseEnv, EnvState, TaskContext
from ..registration import register_env
from ..scene_builders import TableSceneBuilder


@register_env("Empty-v1", max_episode_steps=200)
class EmptyEnv(BaseEnv):
    """Reference ``empty_env.py``: robot + floor, no objects, no task —
    for debugging controllers and visuals."""

    SUPPORTED_ROBOTS = ["panda", "panda_wristcam", "fetch", "xarm7",
                        "ur_10e", "xarm6_robotiq", "xmate3_robotiq"]
    DEFAULT_ROBOT = "panda"

    def _default_sensor_configs(self):
        return []

    def _load_agent(self, builder: SceneSpecBuilder):
        self.table_scene = TableSceneBuilder(self)
        pose, qpos = self.table_scene.robot_pose_and_qpos(self.robot_uids)
        self.agent.install(builder, pose, init_qpos=qpos)

    def _load_scene(self, builder: SceneSpecBuilder):
        self.table_scene.build(builder)

    def _initialize_episode(self, state: EnvState, key) -> EnvState:
        return state

    def evaluate(self, state: EnvState, ctx: TaskContext):
        return dict(success=jnp.zeros((), bool))

    def _get_obs_extra(self, state, ctx, info):
        return dict(tcp_pose=ctx.tcp_pose.raw)

    def compute_dense_reward(self, state, action, info, ctx):
        return jnp.zeros(())

    def compute_normalized_dense_reward(self, state, action, info, ctx):
        return jnp.zeros(())


@register_env("RollBall-v1", max_episode_steps=80)
class RollBallEnv(BaseEnv):
    SUPPORTED_ROBOTS = ["panda", "panda_wristcam"]
    DEFAULT_ROBOT = "panda"

    goal_radius = 0.1
    ball_radius = 0.035

    def _default_sensor_configs(self):
        from ...math.pose import look_at
        from ...sensors.camera import CameraConfig

        pose = look_at(eye=[0.6, 0, 0.8], target=[-0.1, 0, 0.1])
        return [CameraConfig("base_camera", np.asarray(pose.raw), 128, 128,
                             np.pi / 2, 0.01, 100)]

    def _load_agent(self, builder: SceneSpecBuilder):
        self.table_scene = TableSceneBuilder(self)
        pose, qpos = self.table_scene.robot_pose_and_qpos(self.robot_uids)
        self.agent.install(builder, pose, init_qpos=qpos)

    def _load_scene(self, builder: SceneSpecBuilder):
        self.table_scene.build(builder)
        r = self.ball_radius
        m = 1000.0 * (4.0 / 3.0) * np.pi * r**3
        inertia = (2.0 / 5.0) * m * r * r * np.eye(3)
        self.ball = builder.add_free_body(
            "ball", m, inertia, [sphere_geom(r, friction=0.5)]
        )
        self.goal_region = builder.add_kinematic_body("goal_region")

    def _default_extras(self):
        ex = super()._default_extras()
        ex["reached"] = jnp.zeros(())  # reference reached_status latch
        return ex

    def _initialize_episode(self, state: EnvState, key) -> EnvState:
        kb, kg = jax.random.split(key)
        # ball near the robot side, goal far across the table
        # (reference :93-122: ball x in [0, 0.2], goal in
        # [-0.4,-0.7] x [0.2,-0.9] — mirrored to our table frame)
        bxy = jax.random.uniform(kb, (2,), minval=jnp.array([0.0, -0.1]),
                                 maxval=jnp.array([0.15, 0.1]))
        gxy = jax.random.uniform(kg, (2,), minval=jnp.array([-0.65, -0.3]),
                                 maxval=jnp.array([-0.35, 0.3]))
        ball_pose = jnp.concatenate(
            [bxy, jnp.array([self.ball_radius, 1.0, 0, 0, 0])])
        goal_pose = jnp.concatenate([gxy, jnp.array([1e-3, 1.0, 0, 0, 0])])
        sim = state.sim.replace(
            free_pose=state.sim.free_pose.at[self.ball].set(ball_pose),
            free_vel=state.sim.free_vel.at[self.ball].set(jnp.zeros(6)),
            kin_pose=state.sim.kin_pose.at[self.goal_region].set(goal_pose),
        )
        extras = dict(state.extras)
        extras["reached"] = jnp.zeros(())
        return state.replace(sim=sim, extras=extras)

    def _update_extras(self, state: EnvState, ctx: TaskContext) -> EnvState:
        ball_p = ctx.actor_pose("ball").p
        goal_p = ctx.actor_pose("goal_region").p
        unit = ball_p - goal_p
        unit = unit / (jnp.linalg.norm(unit) + 1e-9)
        hit_p = ball_p + unit * (self.ball_radius + 0.05)
        reached_now = jnp.linalg.norm(hit_p - ctx.tcp_pose.p) < 0.04
        extras = dict(state.extras)
        extras["reached"] = jnp.maximum(
            state.extras["reached"], reached_now.astype(jnp.float32))
        return state.replace(extras=extras)

    def evaluate(self, state: EnvState, ctx: TaskContext):
        ball_p = ctx.actor_pose("ball").p
        goal_p = ctx.actor_pose("goal_region").p
        return dict(success=jnp.linalg.norm(
            ball_p[..., :2] - goal_p[..., :2]) < self.goal_radius)

    def _get_obs_extra(self, state, ctx, info):
        obs = dict(tcp_pose=ctx.tcp_pose.raw)
        if self.obs_mode in ("state", "state_dict"):
            ball = ctx.actor_pose("ball")
            goal_p = ctx.actor_pose("goal_region").p
            vel = state.sim.free_vel[self.ball, :3]
            obs.update(
                goal_pos=goal_p, ball_pose=ball.raw, ball_vel=vel,
                tcp_to_ball_pos=ball.p - ctx.tcp_pose.p,
                ball_to_goal_pos=goal_p - ball.p,
            )
        return obs

    def compute_dense_reward(self, state, action, info, ctx: TaskContext):
        # reference :153-175 (staged with reached latch)
        ball_p = ctx.actor_pose("ball").p
        goal_p = ctx.actor_pose("goal_region").p
        unit = ball_p - goal_p
        unit = unit / (jnp.linalg.norm(unit) + 1e-9)
        hit_p = ball_p + unit * (self.ball_radius + 0.05)
        tcp_dist = jnp.linalg.norm(hit_p - ctx.tcp_pose.p)
        reached = state.extras["reached"]
        reaching = 1.0 - jnp.tanh(2.0 * tcp_dist)
        goal_dist = jnp.linalg.norm(ball_p[..., :2] - goal_p[..., :2])
        rolled = 1.0 - jnp.tanh(goal_dist)
        reward = 20.0 * rolled * reached + reaching * (1 - reached) + reached
        return jnp.where(info["success"], 30.0, reward)

    def compute_normalized_dense_reward(self, state, action, info, ctx):
        return self.compute_dense_reward(state, action, info, ctx) / 30.0


@register_env("PlaceSphere-v1", max_episode_steps=50)
class PlaceSphereEnv(BaseEnv):
    """Reference place_sphere.py: drop a 2cm sphere into a shallow
    five-block bin; success = sphere resting centered in the bin, robot
    static."""

    SUPPORTED_ROBOTS = ["panda", "panda_wristcam"]
    DEFAULT_ROBOT = "panda"

    radius = 0.02
    inner_half = 0.02
    wall = 0.0025

    def _default_sensor_configs(self):
        from ...math.pose import look_at
        from ...sensors.camera import CameraConfig

        pose = look_at(eye=[0.3, 0, 0.6], target=[-0.1, 0, 0.1])
        return [CameraConfig("base_camera", np.asarray(pose.raw), 128, 128,
                             np.pi / 2, 0.01, 100)]

    def _load_agent(self, builder: SceneSpecBuilder):
        self.table_scene = TableSceneBuilder(self)
        pose, qpos = self.table_scene.robot_pose_and_qpos(self.robot_uids)
        self.agent.install(builder, pose, init_qpos=qpos)

    def _load_scene(self, builder: SceneSpecBuilder):
        self.table_scene.build(builder)
        r, ih, w = self.radius, self.inner_half, self.wall
        m = 1000.0 * (4.0 / 3.0) * np.pi * r**3
        inertia = (2.0 / 5.0) * m * r * r * np.eye(3)
        self.sphere = builder.add_free_body(
            "sphere", m, inertia, [sphere_geom(r, friction=0.8)]
        )
        # bin: one free body with 5 box geoms (bottom + 4 edge walls),
        # reference _build_bin (place_sphere.py:76-113)
        oh = ih + 2 * w  # outer half-extent
        geoms = [
            box_geom([oh, oh, w], offset_p=[0, 0, w]),
            box_geom([w, oh, w], offset_p=[-(ih + w), 0, 3 * w]),
            box_geom([w, oh, w], offset_p=[(ih + w), 0, 3 * w]),
            box_geom([oh, w, w], offset_p=[0, -(ih + w), 3 * w]),
            box_geom([oh, w, w], offset_p=[0, (ih + w), 3 * w]),
        ]
        bm = 0.2
        self.bin = builder.add_free_body(
            "bin", bm, bm * 1e-4 * np.eye(3), geoms
        )

    def _initialize_episode(self, state: EnvState, key) -> EnvState:
        kb, ks = jax.random.split(key)
        bin_xy = jax.random.uniform(kb, (2,), minval=jnp.array([0.0, -0.1]),
                                    maxval=jnp.array([0.1, 0.1]))
        sph_xy = jax.random.uniform(ks, (2,),
                                    minval=jnp.array([-0.12, -0.1]),
                                    maxval=jnp.array([-0.05, 0.1]))
        sim = state.sim.replace(
            free_pose=state.sim.free_pose
            .at[self.bin].set(jnp.concatenate(
                [bin_xy, jnp.array([0.0, 1.0, 0, 0, 0])]))
            .at[self.sphere].set(jnp.concatenate(
                [sph_xy, jnp.array([self.radius, 1.0, 0, 0, 0])])),
            free_vel=jnp.zeros_like(state.sim.free_vel),
        )
        return state.replace(sim=sim)

    def evaluate(self, state: EnvState, ctx: TaskContext):
        sph = ctx.actor_pose("sphere").p
        b = ctx.actor_pose("bin").p
        in_xy = jnp.linalg.norm(sph[..., :2] - b[..., :2]) < self.inner_half
        on_bottom = jnp.abs(
            sph[..., 2] - (b[..., 2] + 2 * self.wall + self.radius)) < 0.005
        static = jnp.max(jnp.abs(state.sim.qvel[..., :7])) < 0.2
        return dict(success=in_xy & on_bottom & static)

    def _get_obs_extra(self, state, ctx, info):
        obs = dict(tcp_pose=ctx.tcp_pose.raw)
        if self.obs_mode in ("state", "state_dict"):
            obs.update(
                sphere_pose=ctx.actor_pose("sphere").raw,
                bin_pos=ctx.actor_pose("bin").p,
            )
        return obs

    def compute_dense_reward(self, state, action, info, ctx: TaskContext):
        sph = ctx.actor_pose("sphere").p
        b = ctx.actor_pose("bin").p
        tcp = ctx.tcp_pose.p
        reach = 1.0 - jnp.tanh(5.0 * jnp.linalg.norm(sph - tcp))
        target = b + jnp.array([0.0, 0.0, 2 * self.wall + self.radius])
        place = 1.0 - jnp.tanh(5.0 * jnp.linalg.norm(sph - target))
        reward = reach + 2.0 * place
        return jnp.where(info["success"], 5.0, reward)

    def compute_normalized_dense_reward(self, state, action, info, ctx):
        return self.compute_dense_reward(state, action, info, ctx) / 5.0


@register_env("PullCubeTool-v1", max_episode_steps=100)
class PullCubeToolEnv(BaseEnv):
    """Reference pull_cube_tool.py: the cube spawns beyond direct reach;
    grasp the L-shaped tool and hook the cube closer."""

    SUPPORTED_ROBOTS = ["panda", "panda_wristcam"]
    DEFAULT_ROBOT = "panda"

    cube_half = 0.02
    handle_length = 0.2
    hook_length = 0.05
    tool_width = 0.02
    tool_height = 0.02
    arm_reach = 0.35  # reference pull_cube_tool.py:48

    def _default_sensor_configs(self):
        from ...math.pose import look_at
        from ...sensors.camera import CameraConfig

        pose = look_at(eye=[0.5, 0, 0.7], target=[-0.1, 0, 0.1])
        return [CameraConfig("base_camera", np.asarray(pose.raw), 128, 128,
                             np.pi / 2, 0.01, 100)]

    def _load_agent(self, builder: SceneSpecBuilder):
        self.table_scene = TableSceneBuilder(self)
        pose, qpos = self.table_scene.robot_pose_and_qpos(self.robot_uids)
        self._base_xy = np.asarray(pose[:2], np.float32)
        self.agent.install(builder, pose, init_qpos=qpos)

    def _load_scene(self, builder: SceneSpecBuilder):
        self.table_scene.build(builder)
        half = self.cube_half
        m = 1000.0 * (2 * half) ** 3
        inertia = (2.0 / 3.0) * m * half * half * np.eye(3)
        self.cube = builder.add_free_body(
            "cube", m, inertia, [box_geom([half] * 3, friction=0.5)]
        )
        # L tool: handle along +x plus a hook across +y at the far end
        hl, hk, w, ht = (self.handle_length, self.hook_length,
                         self.tool_width, self.tool_height)
        tm = 500.0 * (2 * hl * 2 * w * ht + 2 * hk * 2 * w * ht)
        geoms = [
            box_geom([hl / 2, w, ht / 2], friction=0.8),
            box_geom([hk / 2, w, ht / 2],
                     offset_p=[hl / 2 - hk / 2, 2 * w, 0], friction=0.8),
        ]
        self.tool = builder.add_free_body(
            "l_shape_tool", tm, tm * 2e-3 * np.eye(3), geoms
        )

    def _initialize_episode(self, state: EnvState, key) -> EnvState:
        kc, kt = jax.random.split(key)
        # cube out of reach (x beyond ~0.55 from base at -0.615)
        cube_xy = jax.random.uniform(kc, (2,),
                                     minval=jnp.array([0.15, -0.1]),
                                     maxval=jnp.array([0.25, 0.1]))
        tool_xy = jax.random.uniform(kt, (2,),
                                     minval=jnp.array([-0.2, -0.25]),
                                     maxval=jnp.array([-0.1, -0.15]))
        sim = state.sim.replace(
            free_pose=state.sim.free_pose
            .at[self.cube].set(jnp.concatenate(
                [cube_xy, jnp.array([self.cube_half, 1.0, 0, 0, 0])]))
            .at[self.tool].set(jnp.concatenate(
                [tool_xy, jnp.array([self.tool_height / 2, 1.0, 0, 0, 0])])),
            free_vel=jnp.zeros_like(state.sim.free_vel),
        )
        return state.replace(sim=sim)

    def evaluate(self, state: EnvState, ctx: TaskContext):
        # reference :192-207: cube pulled within 0.6 m of the base
        cube_p = ctx.actor_pose("cube").p
        base = jnp.asarray(np.append(self._base_xy, 0.0))
        dist = jnp.linalg.norm(cube_p[..., :2] - base[:2])
        return dict(success=dist < 0.6)

    def _get_obs_extra(self, state, ctx, info):
        obs = dict(tcp_pose=ctx.tcp_pose.raw)
        if self.obs_mode in ("state", "state_dict"):
            obs.update(
                cube_pose=ctx.actor_pose("cube").raw,
                tool_pose=ctx.actor_pose("l_shape_tool").raw,
            )
        return obs

    def _post_build(self):
        self._is_grasping_tool = self.agent.build_grasp_checker(
            self.model, "l_shape_tool", max_angle=20
        )

    def compute_dense_reward(self, state, action, info, ctx: TaskContext):
        # reference pull_cube_tool.py compute_dense_reward: staged
        # reach+grasp -> position hook -> pull progress, with the
        # pushed-away penalty and +5 success bonus
        cube_p = ctx.actor_pose("cube").p
        tool_p = ctx.actor_pose("l_shape_tool").p
        tcp = ctx.tcp_pose.p
        base = jnp.asarray(np.append(self._base_xy, 0.0))

        # stage 1: reach + grasp the tool (grasp point 2 cm up the handle)
        tool_grasp = tool_p + jnp.array([0.02, 0.0, 0.0])
        reaching = 2.0 * (1.0 - jnp.tanh(
            5.0 * jnp.linalg.norm(tcp - tool_grasp)))
        grasped = self._is_grasping_tool(
            ctx.body_quat, ctx.contact_forces())
        reward = reaching + 2.0 * grasped

        # stage 2: hook behind the cube
        ideal_hook = cube_p + jnp.array(
            [-(self.hook_length + self.cube_half), -0.067, 0.0])
        pos_dist = jnp.linalg.norm(tool_p - ideal_hook)
        positioning = 1.5 * (1.0 - jnp.tanh(3.0 * pos_dist))
        positioned = pos_dist < 0.05

        # stage 3: pull progress toward the workspace
        target = base + jnp.array([0.05, 0.0, 0.0])
        cube_to_ws = jnp.linalg.norm(cube_p - target)
        initial = jnp.linalg.norm(
            jnp.array([self.arm_reach + 0.1, 0.0, self.cube_half]) - target)
        progress = (initial - cube_to_ws) / initial
        reward = reward + (positioning + 3.0 * progress * positioned) * grasped

        # penalty: cube pushed out of reach
        reward = jnp.where(cube_p[0] > self.arm_reach + 0.15,
                           reward - 2.0, reward)
        return jnp.where(info["success"], reward + 5.0, reward)

    def compute_normalized_dense_reward(self, state, action, info, ctx):
        # reference normalizes by the success bonus
        return self.compute_dense_reward(state, action, info, ctx) / 5.0
