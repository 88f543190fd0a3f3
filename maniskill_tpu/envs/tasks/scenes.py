"""Dataset-scene playground envs: SceneManipulation-v1, RoboCasaKitchen-v1.

Parity ports of the reference scene tasks
(``mani_skill/envs/scenes/base_env.py:20`` SceneManipulationEnv — "a base
environment for simulating manipulation tasks in more complex scenes",
success always False, sparse reward 0 — and
``envs/tasks/mobile_manipulation/robocasa/kitchen.py`` RoboCasaKitchen):
a mobile robot dropped into a dataset scene with scatter objects to
interact with. Build configs select among furniture layouts
(``build_config_idx`` kwarg; the reference's ``build_config_idxs`` reset
option maps to a rebuild here since layouts are static geometry).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...physics.model import SceneSpecBuilder, box_geom
from ..base_env import BaseEnv, EnvState, TaskContext
from ..registration import register_env
from ..scene_builders import REGISTERED_SCENE_BUILDERS
from .. import scene_datasets  # noqa: F401  (registers the builders)


@register_env("SceneManipulation-v1", max_episode_steps=200)
class SceneManipulationEnv(BaseEnv):
    """Fetch in a ReplicaCAD/AI2THOR apartment with scatter objects."""

    SUPPORTED_ROBOTS = ["fetch", "mobile_realman"]
    DEFAULT_ROBOT = "fetch"
    SUPPORTED_OBS_MODES = ("state", "state_dict", "none", "rgb", "rgbd",
                           "depth", "pointcloud", "sensor_data")
    scene_builder_name = "replicacad"
    n_scatter = 3

    def __init__(self, *args, scene_builder: str = None,
                 build_config_idx: int = 0, **kwargs):
        self._builder_name = scene_builder or self.scene_builder_name
        self._build_config_idx = build_config_idx
        super().__init__(*args, **kwargs)

    def _default_sensor_configs(self):
        from ...math.pose import look_at
        from ...sensors.camera import CameraConfig

        pose = look_at(eye=[1.8, 1.8, 1.8], target=[0, 0, 0.5])
        return [CameraConfig("base_camera", np.asarray(pose.raw), 128, 128,
                             np.pi / 2, 0.01, 100)]

    def _load_agent(self, builder: SceneSpecBuilder):
        cls = REGISTERED_SCENE_BUILDERS[self._builder_name]
        self.scene_builder = cls(
            self, build_config_idx=self._build_config_idx
        )
        # build() must run first to know spawn points; the scene builder
        # caches furniture footprints during build
        self._pending_scene = True
        self.scene_builder.build(builder)
        self._pending_scene = False
        pose, qpos = self.scene_builder.robot_pose_and_qpos(self.robot_uids)
        self.agent.install(builder, pose, init_qpos=qpos)

    def _load_scene(self, builder: SceneSpecBuilder):
        # scatter objects on the first table-like surface: small boxes
        half = 0.03
        m = 500.0 * (2 * half) ** 3
        inertia = (2.0 / 3.0) * m * half * half * np.eye(3)
        self.scatter = [
            builder.add_free_body(f"scatter{i}", m, inertia,
                                  [box_geom([half] * 3, friction=0.6)])
            for i in range(self.n_scatter)
        ]

    def _scatter_anchor(self):
        """xy + top-z of the first furniture footprint (objects spawn
        there)."""
        c, h = self.scene_builder._occupied[0]
        return np.array([c[0], c[1]], np.float32)

    def _initialize_episode(self, state: EnvState, key) -> EnvState:
        anchor = jnp.asarray(self._scatter_anchor())
        sim = state.sim
        for i, idx in enumerate(self.scatter):
            k = jax.random.fold_in(key, i)
            xy = anchor + jax.random.uniform(k, (2,), minval=-0.25,
                                             maxval=0.25)
            pose = jnp.concatenate(
                [xy, jnp.array([0.78 + 0.06 * i]), jnp.array([1., 0, 0, 0])]
            )
            sim = sim.replace(
                free_pose=sim.free_pose.at[idx].set(pose),
                free_vel=sim.free_vel.at[idx].set(jnp.zeros(6)),
            )
        return state.replace(sim=sim)

    def evaluate(self, state: EnvState, ctx: TaskContext):
        # reference scenes/base_env.py: "success" is never triggered — the
        # env is a sandbox
        return dict(success=jnp.zeros((), bool))

    def _get_obs_extra(self, state, ctx, info):
        return dict(tcp_pose=ctx.tcp_pose.raw)

    def compute_dense_reward(self, state, action, info, ctx):
        return jnp.zeros(())

    def compute_normalized_dense_reward(self, state, action, info, ctx):
        return jnp.zeros(())


@register_env("ArchitecTHORManipulation-v1", max_episode_steps=200)
class ArchitecTHORManipulationEnv(SceneManipulationEnv):
    """AI2THOR house layouts (reference scene_builder/ai2thor)."""

    scene_builder_name = "ai2thor"


@register_env("RoboCasaKitchen-v1", max_episode_steps=200)
class RoboCasaKitchenEnv(SceneManipulationEnv):
    """Fetch in a procedural RoboCasa kitchen (reference
    ``robocasa/kitchen.py``: the kitchen-scene sandbox env; counter
    layouts island/L-run/galley via build_config_idx)."""

    scene_builder_name = "robocasa"

    def _initialize_episode(self, state: EnvState, key) -> EnvState:
        # objects spawn on the counter top (0.92 m)
        anchor = jnp.asarray(self._scatter_anchor())
        sim = state.sim
        for i, idx in enumerate(self.scatter):
            k = jax.random.fold_in(key, i)
            xy = anchor + jax.random.uniform(k, (2,), minval=-0.2,
                                             maxval=0.2)
            pose = jnp.concatenate(
                [xy, jnp.array([0.95 + 0.06 * i]), jnp.array([1., 0, 0, 0])]
            )
            sim = sim.replace(
                free_pose=sim.free_pose.at[idx].set(pose),
                free_vel=sim.free_vel.at[idx].set(jnp.zeros(6)),
            )
        return state.replace(sim=sim)
