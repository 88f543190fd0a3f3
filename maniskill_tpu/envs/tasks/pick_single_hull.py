"""PickSingleHull-v1: per-env heterogeneous CONVEX-HULL object pick-up.

The full analogue of the reference PickSingleYCB
(``mani_skill/envs/tasks/tabletop/pick_single_ycb.py:28,81-124``): every
sub-env grasps a DIFFERENT non-primitive convex object. The reference
rebuilds per-scene YCB meshes under ``reconfiguration_freq``; here the
hull contact cloud + face planes are per-env simulation STATE
(``SimState.hull_verts/hull_faces``, physics/hulls.py), so each env
selects its object by indexing a static asset table — zero recompiles
across resets, exactly the heterogeneous-batch design SURVEY §2.10 calls
for. Objects come from the procedural 8-hull library (YCB-silhouette
stand-ins: can, box, wedge, cup frustum, octahedron, lemon, domino,
prism).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...physics.hulls import pad_library, standard_object_library
from ..base_env import EnvState
from ..registration import register_env
from .pick_cube import PickCubeEnv


@register_env("PickSingleHull-v1", max_episode_steps=50)
class PickSingleHullEnv(PickCubeEnv):
    density = 1000.0

    def __init__(self, *args, reconfiguration_freq: int = 1, **kwargs):
        self.reconfiguration_freq = max(int(reconfiguration_freq), 1)
        self._lib = standard_object_library()
        (self._verts_t, self._faces_t, self._vol_t, self._inert_t,
         self._aabb_t) = pad_library(self._lib)
        super().__init__(*args, **kwargs)

    def _load_scene(self, builder):
        self.table_scene.build(builder)
        # body keeps the name "cube" so the inherited grasp checker,
        # rewards, and obs extras apply verbatim
        self.cube = builder.add_free_hull(
            "cube", self._lib[0], density=self.density
        )
        self.goal_site = builder.add_kinematic_body("goal_site")

    def _default_extras(self):
        ex = super()._default_extras()
        ex["episode_count"] = jnp.zeros((), jnp.int32)
        ex["model_id"] = jnp.zeros((), jnp.int32)
        return ex

    def compute_dense_reward(self, state, action, info, ctx):
        # reference pick_single_ycb.py:238-262 (differs from PickCube's):
        # reach + grasped + place*grasped + placed*grasped +
        # static*placed*grasped, success -> 6
        obj_p = ctx.actor_pose("cube").p
        goal_p = ctx.actor_pose("goal_site").p
        reward = 1.0 - jnp.tanh(
            5.0 * jnp.linalg.norm(obj_p - ctx.tcp_pose.p))
        grasped = info["is_grasped"].astype(jnp.float32)
        reward = reward + grasped
        place = 1.0 - jnp.tanh(5.0 * jnp.linalg.norm(goal_p - obj_p))
        reward = reward + place * grasped
        placed = info["is_obj_placed"].astype(jnp.float32)
        reward = reward + placed * grasped
        static = 1.0 - jnp.tanh(
            5.0 * jnp.linalg.norm(state.sim.qvel[:-2]))
        reward = reward + static * placed * grasped
        return jnp.where(info["success"], 6.0, reward)

    def compute_normalized_dense_reward(self, state, action, info, ctx):
        return self.compute_dense_reward(state, action, info, ctx) / 6.0

    def _initialize_episode(self, state: EnvState, key) -> EnvState:
        return self._init_with_prev(state, key, prev=None)

    def _initialize_episode_prev(self, state, key, prev):
        return self._init_with_prev(state, key, prev=prev)

    def _init_with_prev(self, state, key, prev) -> EnvState:
        state = super()._initialize_episode(state, key)
        km = jax.random.fold_in(key, 23)
        mid_new = jax.random.randint(km, (), 0, len(self._lib))
        if prev is None:
            count = jnp.zeros((), jnp.int32)
            mid = mid_new
        else:
            count = prev.extras["episode_count"]
            resample = (count % self.reconfiguration_freq) == 0
            mid = jnp.where(resample, mid_new, prev.extras["model_id"])
        verts = jnp.asarray(self._verts_t)[mid]
        faces = jnp.asarray(self._faces_t)[mid]
        m = jnp.asarray(self._vol_t)[mid] * self.density
        inertia = jnp.asarray(self._inert_t)[mid] * self.density
        zrest = jnp.asarray(self._aabb_t)[mid, 2]
        slot = int(self.model.geom_hull_slot[
            self.model.geom_indices("cube")[0]])
        sim = state.sim.replace(
            hull_verts=state.sim.hull_verts.at[slot].set(verts),
            hull_faces=state.sim.hull_faces.at[slot].set(faces),
            free_mass=state.sim.free_mass.at[self.cube].set(m),
            free_inertia=state.sim.free_inertia.at[self.cube].set(inertia),
            # respawn resting at the model's own height (super() used the
            # cube half size)
            free_pose=state.sim.free_pose.at[self.cube, 2].set(zrest),
            geom_size=state.sim.geom_size.at[
                self.model.geom_indices("cube")[0]
            ].set(jnp.asarray(self._aabb_t)[mid]),
        )
        extras = dict(state.extras)
        extras["episode_count"] = count + 1
        extras["model_id"] = mid
        return state.replace(sim=sim, extras=extras)

    def _get_obs_extra(self, state, ctx, info):
        obs = super()._get_obs_extra(state, ctx, info)
        if "state" in self.obs_mode:
            obs["obj_aabb_half"] = state.sim.geom_size[
                self.model.geom_indices("cube")[0]
            ]
            obs["obj_mass"] = state.sim.free_mass[self.cube][None]
        return obs
