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


class _RotateSingleObjectLevelEnv(RotateCubeInHandAllegroEnv):
    """Reference RotateSingleObjectInHand difficulty ladder
    (``mani_skill/envs/tasks/dexterity/rotate_single_object_in_hand.py:
    98-150, 320-375``): level 0 — fixed 0.04 cube; level 1 — per-env
    random cube sizes; levels 2-3 — per-env YCB objects (here: the
    procedural hull library via SimState.hull_verts, level 3 additionally
    randomizes density). All object variation is per-env SimState, zero
    recompiles."""

    random_size = False   # level 1
    use_hulls = False     # level >= 2
    random_density = False  # level 3
    cube_half = 0.04  # ref :100
    density = 400.0

    def _load_scene(self, builder):
        builder.add_static_body(
            "ground", np.array([0, 0, 0, 1, 0, 0, 0], np.float32),
            [plane_geom(friction=0.6)],
        )
        if self.use_hulls:
            from ...physics.hulls import pad_library, standard_object_library

            self._lib = standard_object_library()
            (self._verts_t, self._faces_t, self._vol_t, self._inert_t,
             self._aabb_t) = pad_library(self._lib)
            self.cube = builder.add_free_hull(
                "cube", self._lib[0], density=self.density
            )
        else:
            half = self.cube_half
            m = self.density * (2 * half) ** 3
            inertia = (2.0 / 3.0) * m * half * half * np.eye(3)
            self.cube = builder.add_free_body(
                "cube", m, inertia, [box_geom([half] * 3, friction=1.0)]
            )
        builder.exclude_groups(["cube"], ["ground"])

    def _initialize_episode(self, state: EnvState, key) -> EnvState:
        state = super()._initialize_episode(state, key)
        ks, km, kd = jax.random.split(jax.random.fold_in(key, 31), 3)
        sim = state.sim
        if self.random_size:
            # ref :107: half = (randn*0.1 + 1) * 0.04
            half = jnp.clip(
                (jax.random.normal(ks, ()) * 0.1 + 1.0) * 0.04, 0.025, 0.055
            )
            gidx = self.model.geom_indices("cube")[0]
            m = self.density * (2.0 * half) ** 3
            inertia = (2.0 / 3.0) * m * half * half * jnp.eye(3)
            sim = sim.replace(
                geom_size=sim.geom_size.at[gidx].set(
                    jnp.stack([half, half, half])
                ),
                free_mass=sim.free_mass.at[self.cube].set(m),
                free_inertia=sim.free_inertia.at[self.cube].set(inertia),
            )
        if self.use_hulls:
            mid = jax.random.randint(km, (), 0, len(self._lib))
            dens = jnp.where(
                self.random_density,
                jax.random.uniform(kd, (), minval=200.0, maxval=1200.0),
                self.density,
            )
            sim = sim.replace(
                hull_verts=sim.hull_verts.at[0].set(
                    jnp.asarray(self._verts_t)[mid]
                ),
                hull_faces=sim.hull_faces.at[0].set(
                    jnp.asarray(self._faces_t)[mid]
                ),
                free_mass=sim.free_mass.at[self.cube].set(
                    jnp.asarray(self._vol_t)[mid] * dens
                ),
                free_inertia=sim.free_inertia.at[self.cube].set(
                    jnp.asarray(self._inert_t)[mid] * dens
                ),
                geom_size=sim.geom_size.at[
                    self.model.geom_indices("cube")[0]
                ].set(jnp.asarray(self._aabb_t)[mid]),
            )
        return state.replace(sim=sim)


@register_env("RotateSingleObjectInHandLevel0-v1", max_episode_steps=300)
class RotateSingleObjectLevel0Env(_RotateSingleObjectLevelEnv):
    pass


@register_env("RotateSingleObjectInHandLevel1-v1", max_episode_steps=300)
class RotateSingleObjectLevel1Env(_RotateSingleObjectLevelEnv):
    random_size = True


@register_env("RotateSingleObjectInHandLevel2-v1", max_episode_steps=300)
class RotateSingleObjectLevel2Env(_RotateSingleObjectLevelEnv):
    use_hulls = True


@register_env("RotateSingleObjectInHandLevel3-v1", max_episode_steps=300)
class RotateSingleObjectLevel3Env(_RotateSingleObjectLevelEnv):
    use_hulls = True
    random_density = True
