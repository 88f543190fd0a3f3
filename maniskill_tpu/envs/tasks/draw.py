"""TableTopFreeDraw-v1 (drawing family).

Parity port of the reference free-drawing env
(``mani_skill/envs/tasks/drawing/draw.py``): a stick-equipped Panda "draws"
on the tabletop — whenever the TCP is within DOT_THICKNESS+5mm of the canvas,
the next dot from a fixed budget of kinematic markers is placed at the TCP
(:165-190). Unused dots are parked below the table. No success condition
(freestyle drawing, :195).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...physics.model import SceneSpecBuilder
from ..base_env import BaseEnv, EnvState, TaskContext
from ..registration import register_env
from ..scene_builders import TableSceneBuilder


@register_env("TableTopFreeDraw-v1", max_episode_steps=300)
class TableTopFreeDrawEnv(BaseEnv):
    SUPPORTED_ROBOTS = ["panda_stick"]
    DEFAULT_ROBOT = "panda_stick"
    SUPPORTED_REWARD_MODES = ("none", "sparse", "dense", "normalized_dense")

    MAX_DOTS = 300  # budget == max_episode_steps (reference uses 1010)
    DOT_THICKNESS = 0.003  # reference :43
    CANVAS_THICKNESS = 0.0  # our tabletop surface is z=0

    def _load_agent(self, builder: SceneSpecBuilder):
        self.table_scene = TableSceneBuilder(self)
        pose, _ = self.table_scene.robot_pose_and_qpos("panda")
        self.agent.install(builder, pose)

    def _load_scene(self, builder: SceneSpecBuilder):
        self.table_scene.build(builder)
        # fixed budget of collision-free kinematic marker dots
        self.dot_ids = [
            builder.add_kinematic_body(f"dot_{i}") for i in range(self.MAX_DOTS)
        ]

    def _initialize_episode(self, state: EnvState, key) -> EnvState:
        # park all dots below the table
        parked = jnp.concatenate(
            [
                jnp.tile(jnp.array([0.0, 0.0, -self.DOT_THICKNESS]),
                         (self.MAX_DOTS, 1)),
                jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (self.MAX_DOTS, 1)),
            ],
            axis=-1,
        )
        kin = state.sim.kin_pose.at[jnp.asarray(self.dot_ids)].set(parked)
        return state.replace(sim=state.sim.replace(kin_pose=kin))

    def _update_extras(self, state: EnvState, ctx: TaskContext) -> EnvState:
        """Place the next dot at the TCP when touching the canvas
        (reference _after_control_step, draw.py:165-190)."""
        tcp = ctx.tcp_pose.p
        touching = tcp[2] < self.CANVAS_THICKNESS + self.DOT_THICKNESS + 0.005
        dot_pos = jnp.where(
            touching,
            jnp.stack([tcp[0], tcp[1],
                       jnp.asarray(self.DOT_THICKNESS / 2 + self.CANVAS_THICKNESS)]),
            jnp.array([0.0, 0.0, -self.DOT_THICKNESS]),
        )
        dot_pose = jnp.concatenate([dot_pos, jnp.array([1.0, 0, 0, 0])])
        idx = jnp.clip(state.elapsed_steps - 1, 0, self.MAX_DOTS - 1)
        kin_idx = jnp.asarray(self.dot_ids[0]) + idx  # dots are contiguous
        kin = jax.lax.dynamic_update_slice(
            state.sim.kin_pose, dot_pose[None], (kin_idx, 0)
        )
        return state.replace(sim=state.sim.replace(kin_pose=kin))

    def evaluate(self, state, ctx):
        return dict(success=jnp.zeros((), bool))

    def _get_obs_extra(self, state, ctx, info):
        return dict(tcp_pose=ctx.tcp_pose.raw)
