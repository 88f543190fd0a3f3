"""RotateCubeInHandAllegro-v1: in-hand reorientation with the Allegro hand.

Analogue of the reference dexterity task
(``mani_skill/envs/tasks/dexterity/rotate_single_object_in_hand.py``:
an upturned Allegro hand accumulates object rotation about +z; episode
bookkeeping via the ``_update_extras`` hook tracks the cumulative angle,
like the reference's ``cum_rotation_angle``). Success: the cube has been
rotated past ``target_cum_angle`` without being dropped.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...math.rotations import quat_conjugate, quat_mul
from ...physics.model import SceneSpecBuilder, box_geom, plane_geom
from ..base_env import BaseEnv, EnvState, TaskContext
from ..registration import register_env


@register_env("RotateCubeInHandAllegro-v1", max_episode_steps=300)
class RotateCubeInHandAllegroEnv(BaseEnv):
    SUPPORTED_ROBOTS = ["allegro_hand_right"]
    DEFAULT_ROBOT = "allegro_hand_right"

    cube_half = 0.035
    target_cum_angle = np.pi / 2
    drop_height = 0.10  # below the hand plane -> dropped

    def _load_agent(self, builder: SceneSpecBuilder):
        # hand horizontal (fingers along -x, thumb +x), top surface ~z=0.19
        pose = np.array(
            [0.0, 0.0, 0.18, -0.7071068, 0.0, 0.7071068, 0.0], np.float32
        )
        self.agent.install(builder, pose)

    def _load_scene(self, builder: SceneSpecBuilder):
        builder.add_static_body(
            "ground", np.array([0, 0, 0, 1, 0, 0, 0], np.float32),
            [plane_geom(friction=0.6)],
        )
        half = self.cube_half
        m = 400.0 * (2 * half) ** 3
        inertia = (2.0 / 3.0) * m * half * half * np.eye(3)
        self.cube = builder.add_free_body(
            "cube", m, inertia, [box_geom([half] * 3, friction=1.0)]
        )
        builder.exclude_groups(["cube"], ["ground"])

    def _default_extras(self):
        return dict(
            cum_angle=jnp.zeros(()),
            prev_quat=jnp.array([1.0, 0, 0, 0]),
        )

    def _initialize_episode(self, state: EnvState, key) -> EnvState:
        dxy = jax.random.uniform(key, (2,), minval=-0.01, maxval=0.01)
        pose = jnp.concatenate(
            [dxy + jnp.array([-0.02, 0.01]), jnp.array([0.26]),
             jnp.array([1.0, 0, 0, 0])]
        )
        sim = state.sim.replace(
            free_pose=state.sim.free_pose.at[self.cube].set(pose),
            free_vel=state.sim.free_vel * 0.0,
        )
        extras = dict(state.extras)
        extras["cum_angle"] = jnp.zeros(())
        extras["prev_quat"] = pose[3:7]
        return state.replace(sim=sim, extras=extras)

    def _update_extras(self, state: EnvState, ctx: TaskContext) -> EnvState:
        q = state.sim.free_pose[self.cube, 3:7]
        dq = quat_mul(q, quat_conjugate(state.extras["prev_quat"]))
        # signed z-rotation increment from the quaternion delta
        dang = 2.0 * jnp.arctan2(dq[3], jnp.maximum(jnp.abs(dq[0]), 1e-9))
        dang = dang * jnp.sign(dq[0])
        extras = dict(state.extras)
        extras["cum_angle"] = state.extras["cum_angle"] + dang
        extras["prev_quat"] = q
        return state.replace(extras=extras)

    def evaluate(self, state, ctx):
        dropped = state.sim.free_pose[self.cube, 2] < self.drop_height
        rotated = state.extras["cum_angle"] >= self.target_cum_angle
        return dict(
            success=rotated & ~dropped,
            fail=dropped,
            cum_angle=state.extras["cum_angle"],
        )

    def _get_obs_extra(self, state, ctx, info):
        if "state" in self.obs_mode:
            return dict(
                cube_pose=ctx.actor_pose("cube").raw,
                cum_angle=state.extras["cum_angle"][None],
            )
        return {}

    def compute_dense_reward(self, state, action, info, ctx):
        prog = jnp.clip(
            state.extras["cum_angle"] / self.target_cum_angle, 0.0, 1.0
        )
        alive = 1.0 - info["fail"].astype(jnp.float32)
        reward = alive * (0.1 + 2.0 * prog)
        return jnp.where(info["success"], 3.0, reward)

    def compute_normalized_dense_reward(self, state, action, info, ctx):
        return self.compute_dense_reward(state, action, info, ctx) / 3.0
