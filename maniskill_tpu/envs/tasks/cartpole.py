"""Control-suite CartPole tasks.

Parity port of the reference dm_control adaptation
(``mani_skill/envs/tasks/control/cartpole.py``): MS-CartpoleBalance-v1 /
MS-CartpoleSwingUp-v1 with the same randomizations, dense reward product
(upright * centered * small_control * small_velocity, :145-168) and fail
condition (pole below horizontal). Plus the benchmark variant used by the
reference perf suite (``examples/benchmarking/envs/maniskill/cartpole.py``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...physics.model import SceneSpecBuilder
from .. import rewards
from ..base_env import BaseEnv, EnvState, TaskContext
from ..registration import register_env


class CartpoleEnv(BaseEnv):
    SUPPORTED_ROBOTS = ["cart_pole"]
    DEFAULT_ROBOT = "cart_pole"
    SUPPORTED_OBS_MODES = ("state", "state_dict", "none")

    def __init__(self, **kwargs):
        kwargs.setdefault("control_mode", "pd_joint_delta_pos")
        kwargs.setdefault("robot_init_qpos_noise", 0.0)
        super().__init__(**kwargs)

    def _load_scene(self, builder: SceneSpecBuilder):
        pass  # no collision scene: MJCF disables contact

    def _get_obs_extra(self, state: EnvState, ctx: TaskContext, info):
        lin, ang = ctx.body_velocity(1)  # pole_1
        return dict(velocity=lin, angular_velocity=ang)

    @staticmethod
    def _pole_angle_cosine(state):
        return jnp.cos(state.sim.qpos[1])

    def compute_dense_reward(self, state, action, info, ctx):
        cart_pos = ctx.body_pos[0, 0]  # cart x
        centered = (1 + rewards.tolerance(cart_pos, margin=2)) / 2
        small_control = (
            4 + rewards.tolerance(action[0], margin=1, value_at_margin=0,
                                  sigmoid="quadratic")
        ) / 5
        angular_vel = state.sim.qvel[1]
        small_velocity = (1 + rewards.tolerance(angular_vel, margin=5)) / 2
        upright = (self._pole_angle_cosine(state) + 1) / 2
        return upright * centered * small_control * small_velocity

    def compute_normalized_dense_reward(self, state, action, info, ctx):
        return self.compute_dense_reward(state, action, info, ctx)


@register_env("MS-CartpoleBalance-v1", max_episode_steps=1000)
class CartpoleBalanceEnv(CartpoleEnv):
    def _initialize_episode(self, state: EnvState, key) -> EnvState:
        k1, k2, k3 = jax.random.split(key, 3)
        qpos = jnp.array(
            [
                jax.random.uniform(k1, (), minval=-0.1, maxval=0.1),
                jax.random.uniform(k2, (), minval=-0.034, maxval=0.034),
            ]
        )
        qvel = jax.random.normal(k3, (2,)) * 0.01
        return state.replace(sim=state.sim.replace(qpos=qpos, qvel=qvel))

    def evaluate(self, state, ctx):
        return dict(
            fail=self._pole_angle_cosine(state) < 0,
            success=jnp.zeros((), bool),
        )


@register_env("MS-CartpoleSwingUp-v1", max_episode_steps=1000)
class CartpoleSwingUpEnv(CartpoleEnv):
    def _initialize_episode(self, state: EnvState, key) -> EnvState:
        k1, k2, k3 = jax.random.split(key, 3)
        qpos = jnp.array(
            [
                0.01 * jax.random.normal(k1, ()),
                jnp.pi + 0.01 * jax.random.normal(k2, ()),
            ]
        )
        qvel = jax.random.normal(k3, (2,)) * 0.01
        return state.replace(sim=state.sim.replace(qpos=qpos, qvel=qvel))

    def evaluate(self, state, ctx):
        return dict(success=jnp.zeros((), bool))


@register_env("CartpoleBalanceBenchmark-v1", max_episode_steps=1000)
class CartpoleBalanceBenchmarkEnv(CartpoleBalanceEnv):
    """Reference perf-suite variant
    (``examples/benchmarking/envs/maniskill/cartpole.py:62``): sim 120 Hz /
    control 60 Hz. ``camera_width/height/num_cameras`` kwargs mirror the
    reference benchmark driver's --cam-width/--cam-height/--num-cams
    (``gpu_sim.py:19-34``) for the visual-throughput matrix."""

    SIM_FREQ = 120
    CONTROL_FREQ = 60
    # the reference benchmark runs this scene across the full visual
    # obs-mode matrix (gpu_sim.py obs_mode arg)
    SUPPORTED_OBS_MODES = ("state", "state_dict", "none", "rgb", "depth",
                           "rgbd", "sensor_data", "pointcloud")
    SUPPORTED_ROBOTS = ["cart_pole", "cart_pole_visual"]
    DEFAULT_ROBOT = "cart_pole_visual"

    def __init__(self, *args, camera_width: int = 128,
                 camera_height: int = 128, num_cameras: int = 1, **kwargs):
        self._cam_wh = (int(camera_width), int(camera_height))
        self._num_cams = int(num_cameras)
        super().__init__(*args, **kwargs)

    def _load_scene(self, builder: SceneSpecBuilder):
        # renderable floor; contact stays DISABLED (reference cartpole.xml
        # contact="disable") — every pair is excluded, P stays 0, only the
        # camera sees these geoms
        from ...physics.model import plane_geom

        builder.add_static_body(
            "floor", np.array([0, 0, 0, 1, 0, 0, 0], np.float32),
            [plane_geom()],
        )
        builder.exclude_groups(["robot:*", "floor"], ["robot:*", "floor"])

    def _default_sensor_configs(self):
        from ...math.pose import look_at
        from ...sensors.camera import CameraConfig

        w, h = self._cam_wh
        pose = np.asarray(look_at(eye=[0.0, -4.0, 1.2],
                                  target=[0.0, 0.0, 1.0]).raw)
        return [
            CameraConfig(f"base_camera{'' if i == 0 else i}", pose, w, h,
                         fov=np.pi / 3)
            for i in range(self._num_cams)
        ]
