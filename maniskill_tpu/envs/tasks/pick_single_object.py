"""PickSingleObject-v1: per-env heterogeneous object pick-up.

Analogue of the reference PickSingleYCB
(``mani_skill/envs/tasks/tabletop/pick_single_ycb.py:28,81-124``): every
sub-env grasps a DIFFERENT object. The reference realizes this by building
per-scene YCB meshes and re-running ``_reconfigure`` every
``reconfiguration_freq`` resets; here object geometry (box half-extents)
AND inertial properties (mass/inertia from a sampled density) are
simulation STATE (``SimState.geom_size`` / ``free_mass`` /
``free_inertia``), so every env carries its own object with zero
recompilation and per-episode resampling.

``reconfiguration_freq``: like the reference, the object is resampled only
every k-th episode of each sub-env (k=1 resamples every reset).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..base_env import EnvState
from ..registration import register_env
from .pick_cube import PickCubeEnv


@register_env("PickSingleObject-v1", max_episode_steps=50)
class PickSingleObjectEnv(PickCubeEnv):
    half_lo = 0.015
    half_hi = 0.030
    density_lo = 300.0
    density_hi = 1500.0

    def __init__(self, *args, reconfiguration_freq: int = 1, **kwargs):
        self.reconfiguration_freq = max(int(reconfiguration_freq), 1)
        super().__init__(*args, **kwargs)

    def _default_extras(self):
        ex = super()._default_extras()
        ex["episode_count"] = jnp.zeros((), jnp.int32)
        return ex

    def _initialize_episode(self, state: EnvState, key) -> EnvState:
        return self._init_with_prev(state, key, prev=None)

    def _initialize_episode_prev(self, state, key, prev):
        return self._init_with_prev(state, key, prev=prev)

    def _init_with_prev(self, state, key, prev) -> EnvState:
        state = super()._initialize_episode(state, key)
        kh, kd = jax.random.split(jax.random.fold_in(key, 17))
        half = jax.random.uniform(
            kh, (3,), minval=self.half_lo, maxval=self.half_hi
        )
        density = jax.random.uniform(
            kd, (), minval=self.density_lo, maxval=self.density_hi
        )
        if prev is None:
            count = jnp.zeros((), jnp.int32)
            resample = jnp.asarray(True)
            old_half = state.sim.geom_size[self.model.geom_indices("cube")[0]]
            old_m = state.sim.free_mass[self.cube]
            old_I = state.sim.free_inertia[self.cube]
        else:
            count = prev.extras["episode_count"]
            resample = (count % self.reconfiguration_freq) == 0
            old_half = prev.sim.geom_size[self.model.geom_indices("cube")[0]]
            old_m = prev.sim.free_mass[self.cube]
            old_I = prev.sim.free_inertia[self.cube]
        gidx = self.model.geom_indices("cube")[0]
        half = jnp.where(resample, half, old_half)
        vol = 8.0 * half[0] * half[1] * half[2]
        m = jnp.where(resample, density * vol, old_m)
        hx, hy, hz = half[0], half[1], half[2]
        inertia = (m / 3.0) * jnp.diag(
            jnp.stack([hy * hy + hz * hz, hx * hx + hz * hz,
                       hx * hx + hy * hy])
        )
        inertia = jnp.where(resample, inertia, old_I)
        # respawn resting on the table at the sampled height
        fp = state.sim.free_pose.at[self.cube, 2].set(half[2])
        sim = state.sim.replace(
            geom_size=state.sim.geom_size.at[gidx].set(half),
            free_mass=state.sim.free_mass.at[self.cube].set(m),
            free_inertia=state.sim.free_inertia.at[self.cube].set(inertia),
            free_pose=fp,
        )
        extras = dict(state.extras)
        extras["episode_count"] = count + 1
        return state.replace(sim=sim, extras=extras)

    def _get_obs_extra(self, state, ctx, info):
        obs = super()._get_obs_extra(state, ctx, info)
        if "state" in self.obs_mode:
            gidx = self.model.geom_indices("cube")[0]
            obs["obj_half_size"] = state.sim.geom_size[gidx]
            obs["obj_mass"] = state.sim.free_mass[self.cube][None]
        return obs
