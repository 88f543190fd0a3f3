"""Purpose-built perf-benchmark envs (reference
``mani_skill/examples/benchmarking/envs/maniskill/franka_pick_cube.py:18``
and ``franka_move.py:16``): reward "none", sim 100 Hz / control 50 Hz,
matched to the reference's Isaac Lab / MJX counterpart configs so steps/s
comparisons are apples-to-apples."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...physics.model import SceneSpecBuilder, plane_geom
from ..base_env import BaseEnv, EnvState, TaskContext
from ..registration import register_env
from .pick_cube import PickCubeEnv


@register_env("FrankaPickCubeBenchmark-v1", max_episode_steps=1000)
class FrankaPickCubeBenchmarkEnv(PickCubeEnv):
    """PickCube scene at the reference benchmark's control rate; reward
    computation disabled (SUPPORTED_REWARD_MODES=["none"],
    franka_pick_cube.py:19)."""

    SUPPORTED_REWARD_MODES = ("none",)
    SIM_FREQ = 100
    CONTROL_FREQ = 50

    def __init__(self, *args, reward_mode: str = "none",
                 camera_width: int = 128, camera_height: int = 128,
                 num_cameras: int = 1, **kwargs):
        self._cam_wh = (int(camera_width), int(camera_height))
        self._num_cams = int(num_cameras)
        super().__init__(*args, reward_mode="none", **kwargs)

    def _default_sensor_configs(self):
        # reference benchmark camera matrix (gpu_sim.py --cam-width/height)
        from ...math.pose import look_at
        from ...sensors.camera import CameraConfig

        w, h = self._cam_wh
        pose = np.asarray(look_at(eye=[0.3, 0, 0.6],
                                  target=[-0.1, 0, 0.1]).raw)
        return [
            CameraConfig(f"base_camera{'' if i == 0 else i}", pose, w, h,
                         np.pi / 2, 0.01, 100)
            for i in range(self._num_cams)
        ]


@register_env("FrankaMoveBenchmark-v1", max_episode_steps=1000)
class FrankaMoveBenchmarkEnv(BaseEnv):
    """A lone Panda over a ground plane — isolates articulation-dynamics
    throughput from object contact (reference franka_move.py:16)."""

    SUPPORTED_REWARD_MODES = ("none",)
    SIM_FREQ = 100
    CONTROL_FREQ = 50

    def __init__(self, *args, reward_mode: str = "none", **kwargs):
        super().__init__(*args, reward_mode="none", **kwargs)

    def _load_scene(self, builder: SceneSpecBuilder):
        builder.add_static_body(
            "ground", np.array([0, 0, 0, 1, 0, 0, 0], np.float32),
            [plane_geom()],
        )

    def evaluate(self, state: EnvState, ctx: TaskContext):
        return dict(success=jnp.zeros((), bool))
