"""RotateValveDClaw-v1: D'Claw dexterity over an articulated valve.

Parity port of the reference ROBEL task
(``mani_skill/envs/tasks/dexterity/rotate_valve.py``: a D'Claw suspended
over a tri-spoke valve must rotate the hinge past a target angle).
The valve is a programmatic articulation (three spoke boxes on one
revolute hub) — same contract, no meshes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...kinematics.articulation import ArticulationBuilder
from ...physics.model import SceneSpecBuilder, box_geom, plane_geom
from ..base_env import BaseEnv, TaskContext
from ..registration import register_env


@register_env("RotateValveDClaw-v1", max_episode_steps=200)
class RotateValveDClawEnv(BaseEnv):
    SUPPORTED_ROBOTS = ["dclaw"]
    DEFAULT_ROBOT = "dclaw"

    target_angle_diff = np.pi / 2  # reference rotate_valve difficulty 2-ish
    spoke_len = 0.09
    valve_z = 0.05

    def _load_agent(self, builder: SceneSpecBuilder):
        # claw hangs over the valve, fingers downward (URDF -z reach)
        pose = np.array([0.0, 0.0, 0.30, 0, 1, 0, 0], np.float32)
        self.agent.install(builder, pose)

    def _load_scene(self, builder: SceneSpecBuilder):
        builder.add_static_body(
            "ground", np.array([0, 0, 0, 1, 0, 0, 0], np.float32),
            [plane_geom(friction=0.6)],
        )
        ab = ArticulationBuilder("valve")
        hub = ab.add_revolute_link(
            "hub", parent=None, axis=(0.0, 0.0, 1.0),
            limits=(-100.0, 100.0),
            joint_pose=((0.0, 0.0, self.valve_z), (1, 0, 0, 0)),
            mass=0.2, damping=0.3, friction=0.1,
        )
        for k in range(3):
            ang = 2.0 * np.pi * k / 3.0
            q = np.array([np.cos(ang / 2), 0, 0, np.sin(ang / 2)])
            off = 0.5 * self.spoke_len * np.array(
                [np.cos(ang), np.sin(ang), 0.0]
            )
            ab.add_geom(hub, box_geom(
                [self.spoke_len / 2, 0.012, 0.015],
                offset_p=tuple(off), offset_q=tuple(q), friction=1.0,
            ))
        builder.add_articulation(ab, np.array([0, 0, 0, 1, 0, 0, 0]))
        builder.exclude_pair("valve:hub", "valve:base")
        builder.exclude_groups(["valve:*"], ["ground"])

    def _post_build(self):
        self._hub = int(self.model.art_dof_index["valve"][0])

    def _default_extras(self):
        return dict(init_angle=jnp.zeros(()), target_angle=jnp.zeros(()))

    def _initialize_episode(self, state, key):
        q0 = jax.random.uniform(key, (), minval=-np.pi, maxval=np.pi)
        sim = state.sim.replace(
            qpos=state.sim.qpos.at[self._hub].set(q0),
            qvel=state.sim.qvel.at[self._hub].set(0.0),
        )
        extras = dict(state.extras)
        extras["init_angle"] = q0
        extras["target_angle"] = q0 + self.target_angle_diff
        return state.replace(sim=sim, extras=extras)

    def evaluate(self, state, ctx):
        q = state.sim.qpos[self._hub]
        return dict(success=q >= state.extras["target_angle"])

    def _get_obs_extra(self, state, ctx, info):
        if "state" in self.obs_mode:
            return dict(
                valve_qpos=state.sim.qpos[self._hub][None],
                valve_qvel=state.sim.qvel[self._hub][None],
                target_angle=state.extras["target_angle"][None],
            )
        return {}

    def compute_dense_reward(self, state, action, info, ctx):
        q = state.sim.qpos[self._hub]
        prog = jnp.clip(
            (q - state.extras["init_angle"]) / self.target_angle_diff,
            0.0, 1.0,
        )
        spin = jnp.clip(state.sim.qvel[self._hub], 0.0, 2.0) / 2.0
        reward = 2.0 * prog + 0.5 * spin
        return jnp.where(info["success"], 3.0, reward)

    def compute_normalized_dense_reward(self, state, action, info, ctx):
        return self.compute_dense_reward(state, action, info, ctx) / 3.0


class _RotateValveLevelEnv(BaseEnv):
    """Reference RotateValve difficulty ladder
    (``mani_skill/envs/tasks/dexterity/rotate_valve.py:44-62, 255-315``):
    level 0 — quarter turn, fixed 3-head valve, fixed direction;
    levels 1-3 — half turn, random direction, randomized valve (head
    count on 2-3, lengths on 3); level 4 — full turn.

    TPU-native valve randomization: the valve is built once with
    MAX_HEADS spokes at fixed 60° spacing; per-env head count/length ride
    in ``SimState.geom_size`` (inactive spokes shrink to 1 mm), so every
    env carries a different valve with zero recompiles. Approximations vs
    the reference (documented): spoke ANGLES come from the fixed 60° grid
    (a random subset) rather than continuous sampling, and per-env length
    scaling moves a spoke's outer tip about its static midpoint by <=20%.
    """

    SUPPORTED_ROBOTS = ["dclaw"]
    DEFAULT_ROBOT = "dclaw"
    MAX_HEADS = 6
    spoke_len = 0.09
    valve_z = 0.05

    success_threshold = np.pi  # levels 1-3 (ref :55)
    random_direction = True
    random_heads = False  # level >= 2
    random_lengths = False  # level >= 3
    min_heads = 3

    def _load_agent(self, builder: SceneSpecBuilder):
        pose = np.array([0.0, 0.0, 0.30, 0, 1, 0, 0], np.float32)
        self.agent.install(builder, pose)

    def _load_scene(self, builder: SceneSpecBuilder):
        builder.add_static_body(
            "ground", np.array([0, 0, 0, 1, 0, 0, 0], np.float32),
            [plane_geom(friction=0.6)],
        )
        ab = ArticulationBuilder("valve")
        hub = ab.add_revolute_link(
            "hub", parent=None, axis=(0.0, 0.0, 1.0),
            limits=(-100.0, 100.0),
            joint_pose=((0.0, 0.0, self.valve_z), (1, 0, 0, 0)),
            mass=0.2, damping=0.3, friction=0.1,
        )
        for k in range(self.MAX_HEADS):
            ang = 2.0 * np.pi * k / self.MAX_HEADS
            q = np.array([np.cos(ang / 2), 0, 0, np.sin(ang / 2)])
            off = 0.5 * self.spoke_len * np.array(
                [np.cos(ang), np.sin(ang), 0.0]
            )
            ab.add_geom(hub, box_geom(
                [self.spoke_len / 2, 0.012, 0.015],
                offset_p=tuple(off), offset_q=tuple(q), friction=1.0,
            ))
        builder.add_articulation(ab, np.array([0, 0, 0, 1, 0, 0, 0]))
        builder.exclude_pair("valve:hub", "valve:base")
        builder.exclude_groups(["valve:*"], ["ground"])

    def _post_build(self):
        self._hub = int(self.model.art_dof_index["valve"][0])
        self._spoke_geoms = np.asarray(
            self.model.geom_indices("valve:hub"), np.int32
        )
        assert len(self._spoke_geoms) == self.MAX_HEADS

    def _default_extras(self):
        return dict(
            init_angle=jnp.zeros(()),
            rotate_dir=jnp.ones(()),
        )

    def _initialize_episode(self, state, key):
        kq, kd, kh, kl = jax.random.split(key, 4)
        q0 = jax.random.uniform(kq, (), minval=-np.pi, maxval=np.pi)
        sim = state.sim.replace(
            qpos=state.sim.qpos.at[self._hub].set(q0),
            qvel=state.sim.qvel.at[self._hub].set(0.0),
        )
        # per-env valve geometry via geom_size state
        H = self.MAX_HEADS
        base = jnp.tile(
            jnp.array([self.spoke_len / 2, 0.012, 0.015]), (H, 1)
        )
        if self.random_lengths:
            scale = jax.random.uniform(kl, (H,), minval=0.8, maxval=1.2)
            base = base.at[:, 0].mul(scale)
        if self.random_heads:
            kn, kperm = jax.random.split(kh)
            n = jax.random.randint(kn, (), self.min_heads, H + 1)
            order = jax.random.permutation(kperm, H)
            active = (jnp.argsort(order) < n)
            base = jnp.where(active[:, None], base,
                             jnp.full((H, 3), 1e-3))
        else:
            # fixed 3 evenly spaced heads (ref level 0-1: 0, 120°, 240°)
            active = jnp.asarray(
                np.arange(H) % (H // 3) == 0
            )
            base = jnp.where(active[:, None], base,
                             jnp.full((H, 3), 1e-3))
        sim = sim.replace(
            geom_size=sim.geom_size.at[jnp.asarray(self._spoke_geoms)].set(
                base
            )
        )
        direction = jnp.where(
            self.random_direction
            & (jax.random.uniform(kd, ()) < 0.5),
            -1.0, 1.0,
        )
        extras = dict(state.extras)
        extras["init_angle"] = q0
        extras["rotate_dir"] = direction
        return state.replace(sim=sim, extras=extras)

    def evaluate(self, state, ctx):
        rot = (
            (state.sim.qpos[self._hub] - state.extras["init_angle"])
            * state.extras["rotate_dir"]
        )
        return dict(
            success=rot > self.success_threshold,
            valve_rotation=rot,
        )

    def _get_obs_extra(self, state, ctx, info):
        if "state" in self.obs_mode:
            return dict(
                valve_qpos=state.sim.qpos[self._hub][None],
                valve_qvel=state.sim.qvel[self._hub][None],
                rotate_dir=state.extras["rotate_dir"][None],
                spoke_sizes=state.sim.geom_size[
                    jnp.asarray(self._spoke_geoms)
                ][:, 0],
            )
        return {}

    def compute_dense_reward(self, state, action, info, ctx):
        prog = jnp.clip(
            info["valve_rotation"] / self.success_threshold, 0.0, 1.0
        )
        spin = jnp.clip(
            state.sim.qvel[self._hub] * state.extras["rotate_dir"],
            0.0, 2.0,
        ) / 2.0
        reward = 2.0 * prog + 0.5 * spin
        return jnp.where(info["success"], 3.0, reward)

    def compute_normalized_dense_reward(self, state, action, info, ctx):
        return self.compute_dense_reward(state, action, info, ctx) / 3.0


@register_env("RotateValveLevel0-v1", max_episode_steps=80)
class RotateValveLevel0Env(_RotateValveLevelEnv):
    success_threshold = np.pi / 2
    random_direction = False


@register_env("RotateValveLevel1-v1", max_episode_steps=150)
class RotateValveLevel1Env(_RotateValveLevelEnv):
    pass


@register_env("RotateValveLevel2-v1", max_episode_steps=150)
class RotateValveLevel2Env(_RotateValveLevelEnv):
    random_heads = True


@register_env("RotateValveLevel3-v1", max_episode_steps=150)
class RotateValveLevel3Env(_RotateValveLevelEnv):
    random_heads = True
    random_lengths = True


@register_env("RotateValveLevel4-v1", max_episode_steps=300)
class RotateValveLevel4Env(_RotateValveLevelEnv):
    success_threshold = 2 * np.pi
    random_heads = True
    random_lengths = True
