"""StackCube-v1.

Task-parity port of the reference StackCube
(``mani_skill/envs/tasks/tabletop/stack_cube.py``): two 2cm cubes placed
without overlap (rejection-free min-distance sampling), success = cubeA
stacked on cubeB, static, and not grasped (:126-146); staged dense reward
(reach ×2 → grasp+place → ungrasp+static → 8 on success, :160-196).
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


@register_env("StackCube-v1", max_episode_steps=50)
class StackCubeEnv(BaseEnv):
    SUPPORTED_ROBOTS = ["panda", "panda_wristcam", "fetch"]
    DEFAULT_ROBOT = "panda"

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
        m = 1000.0 * (2 * half) ** 3
        inertia = (2.0 / 3.0) * m * half * half * np.eye(3)
        self.cubeA = builder.add_free_body("cubeA", m, inertia, [box_geom([half] * 3)])
        self.cubeB = builder.add_free_body("cubeB", m, inertia, [box_geom([half] * 3)])

    def _post_build(self):
        self._is_grasping_A = self.agent.build_grasp_checker(self.model, "cubeA")

    def _initialize_episode(self, state: EnvState, key) -> EnvState:
        half = self.cube_half_size
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        xy = jax.random.uniform(k1, (2,), minval=-0.1, maxval=0.1)
        # min-separation placement (reference UniformPlacementSampler with
        # radius sqrt(2)*half + 1mm): sample B at a random direction >= radius
        # away from A inside the region
        radius = float(np.sqrt(2) * half) + 0.001
        a_off = jax.random.uniform(k2, (2,), minval=-0.1, maxval=0.1)
        kang, kdist = jax.random.split(k3)
        ang = jax.random.uniform(kang, (), minval=-jnp.pi, maxval=jnp.pi)
        dist = jax.random.uniform(kdist, (), minval=radius, maxval=0.10)
        b_off = a_off + dist * jnp.array([jnp.cos(ang), jnp.sin(ang)])
        b_off = jnp.clip(b_off, -0.1, 0.2)
        yaw_a = jax.random.uniform(k4, (), minval=-jnp.pi, maxval=jnp.pi)
        yaw_b = jax.random.uniform(k5, (), minval=-jnp.pi, maxval=jnp.pi)
        up = jnp.array([0.0, 0.0, 1.0])
        pose_a = jnp.concatenate(
            [xy + a_off, jnp.array([half]), quat_from_axis_angle(up, yaw_a)]
        )
        pose_b = jnp.concatenate(
            [xy + b_off, jnp.array([half]), quat_from_axis_angle(up, yaw_b)]
        )
        sim = state.sim.replace(
            free_pose=state.sim.free_pose.at[self.cubeA].set(pose_a)
            .at[self.cubeB].set(pose_b),
            free_vel=jnp.zeros_like(state.sim.free_vel),
        )
        return state.replace(sim=sim)

    def evaluate(self, state: EnvState, ctx: TaskContext):
        half = self.cube_half_size
        pos_A = ctx.actor_pose("cubeA").p
        pos_B = ctx.actor_pose("cubeB").p
        offset = pos_A - pos_B
        xy_flag = jnp.linalg.norm(offset[..., :2]) <= float(
            np.linalg.norm([half, half])
        ) + 0.005
        z_flag = jnp.abs(offset[..., 2] - 2 * half) <= 0.005
        is_on = xy_flag & z_flag
        velA = ctx.actor_vel("cubeA")
        is_static = (jnp.linalg.norm(velA[:3]) <= 1e-2) & (
            jnp.linalg.norm(velA[3:]) <= 0.5
        )
        f_pt = ctx.contact_forces()
        is_grasped = self._is_grasping_A(ctx.body_quat, f_pt)
        return dict(
            is_cubeA_grasped=is_grasped,
            is_cubeA_on_cubeB=is_on,
            is_cubeA_static=is_static,
            success=is_on & is_static & (~is_grasped),
        )

    def _get_obs_extra(self, state: EnvState, ctx: TaskContext, info):
        obs = dict(tcp_pose=ctx.tcp_pose.raw)
        if "state" in self.obs_mode:
            a = ctx.actor_pose("cubeA")
            b = ctx.actor_pose("cubeB")
            obs.update(
                cubeA_pose=a.raw,
                cubeB_pose=b.raw,
                tcp_to_cubeA_pos=a.p - ctx.tcp_pose.p,
                tcp_to_cubeB_pos=b.p - ctx.tcp_pose.p,
                cubeA_to_cubeB_pos=b.p - a.p,
            )
        return obs

    def compute_dense_reward(self, state, action, info, ctx: TaskContext):
        half = self.cube_half_size
        pos_A = ctx.actor_pose("cubeA").p
        pos_B = ctx.actor_pose("cubeB").p
        tcp = ctx.tcp_pose.p
        reach = 2.0 * (1.0 - jnp.tanh(5.0 * jnp.linalg.norm(tcp - pos_A)))
        goal = jnp.concatenate([pos_B[:2], pos_B[2:3] + 2 * half])
        place = 1.0 - jnp.tanh(5.0 * jnp.linalg.norm(goal - pos_A))
        grasped = info["is_cubeA_grasped"]
        reward = jnp.where(grasped, 4.0 + place, reach)

        gripper_width = 2 * 0.04  # panda qlimit (reference :182)
        ungrasp = jnp.sum(state.sim.qpos[-2:]) / gripper_width
        ungrasp = jnp.where(grasped, ungrasp, 1.0)
        velA = ctx.actor_vel("cubeA")
        static_r = 1.0 - jnp.tanh(
            10.0 * jnp.linalg.norm(velA[:3]) + jnp.linalg.norm(velA[3:])
        )
        reward = jnp.where(
            info["is_cubeA_on_cubeB"], 6.0 + (ungrasp + static_r) / 2.0, reward
        )
        return jnp.where(info["success"], 8.0, reward)

    def compute_normalized_dense_reward(self, state, action, info, ctx):
        return self.compute_dense_reward(state, action, info, ctx) / 8.0
