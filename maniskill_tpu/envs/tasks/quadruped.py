"""Quadruped locomotion tasks: AnymalC-Reach/Spin, UnitreeGo2-Reach.

Parity ports of the reference quadruped family
(``mani_skill/envs/tasks/quadruped/quadruped_reach.py`` and
``quadruped_spin.py``): same goal distribution (2.5±0.5 m ahead, ±1 m
lateral), success (within 0.35 m and not fallen), fail (base touches the
ground), and dense rewards (reach/spin term + z-velocity, xy angular
velocity, undesired shank contact, and posture penalties).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...physics.engine import _trace_metadata
from ...physics.model import BodyKind, SceneSpecBuilder, SimParams, plane_geom
from ..base_env import BaseEnv, EnvState, TaskContext
from ..registration import register_env


def _body_contact_mask(model, body_names):
    """Static (P,) mask of contact points touching any of the named robot
    bodies (net-contact-force analogue of the reference's
    ``get_net_contact_forces``, base.py:128)."""
    idx = {model.robot.link_index[n] for n in body_names}
    meta = _trace_metadata(model)
    meta_a, meta_b = meta[-2], meta[-1]
    mask = np.zeros(len(meta_a), np.float32)
    for p, ((ka, ba), (kb, bb)) in enumerate(zip(meta_a, meta_b)):
        if (ka == BodyKind.ROBOT_LINK and ba in idx) or (
            kb == BodyKind.ROBOT_LINK and bb in idx
        ):
            mask[p] = 1.0
    return mask


class _QuadrupedEnv(BaseEnv):
    SUPPORTED_ROBOTS = ["anymal_c", "unitree_go2"]
    DEFAULT_ROBOT = "anymal_c"
    SUPPORTED_OBS_MODES = ("state", "state_dict", "none")
    SIM_FREQ = 100
    CONTROL_FREQ = 50

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
        self.goal_site = builder.add_kinematic_body("goal")

    def _post_build(self):
        self._base_mask = jnp.asarray(
            _body_contact_mask(self.model, [self.agent.base_link])
        )
        self._shank_mask = jnp.asarray(
            _body_contact_mask(self.model, self.agent.shank_links)
        )
        kf = self.agent.keyframes["standing"].qpos
        self._default_qpos = jnp.asarray(kf)
        # leg-joint slice of qpos (root 6 dofs first)
        names = list(self.model.robot.joint_names)
        self._leg_idx = np.array(
            [names.index(n) for n in self.agent.leg_joint_names]
        )

    # -- shared quantities ---------------------------------------------------
    def _root_vel(self, state):
        """(linear_xyz, angular_xyz) of the floating base from the synthetic
        6-dof root chain (slides x,y,z then hinges z,y,x)."""
        qv = state.sim.qvel
        lin = qv[0:3]
        ang = jnp.stack([qv[5], qv[4], qv[3]])  # hinge_0=x, hinge_1=y, 2=z
        return lin, ang

    def _root_xy(self, ctx: TaskContext):
        base_idx = self.model.robot.link_index[self.agent.base_link]
        return ctx.body_pos[base_idx][:2]

    def _contact_force_mag(self, ctx, mask):
        f = ctx.contact_forces()
        return jnp.max(mask * jnp.linalg.norm(f, axis=-1))

    def _is_fallen(self, ctx):
        """Reference anymal_c.py:112-115 — the base touching anything."""
        return self._contact_force_mag(ctx, self._base_mask) > 1.0

    def _penalties(self, state, ctx):
        lin, ang = self._root_vel(state)
        undesired = (
            self._contact_force_mag(ctx, self._shank_mask) > 1.0
        ).astype(jnp.float32)
        posture = jnp.linalg.norm(
            state.sim.qpos[self._leg_idx]
            - self._default_qpos[self._leg_idx]
        )
        return (
            -2.0 * lin[2] ** 2
            - 0.05 * (ang[0] ** 2 + ang[1] ** 2)
            - 1.0 * undesired
            - 0.05 * posture
        )

    def _initialize_episode(self, state: EnvState, key) -> EnvState:
        qpos = self._default_qpos
        sim = state.sim.replace(
            qpos=qpos, qvel=jnp.zeros_like(state.sim.qvel)
        )
        return state.replace(sim=sim)

    def _get_obs_extra(self, state, ctx, info):
        lin, ang = self._root_vel(state)
        return dict(
            root_linear_velocity=lin,
            root_angular_velocity=ang,
        )


class QuadrupedReachEnv(_QuadrupedEnv):
    """Reference quadruped_reach.py: walk to a goal 2.5 m ahead."""

    goal_radius = 0.35

    def _initialize_episode(self, state: EnvState, key) -> EnvState:
        state = super()._initialize_episode(state, key)
        kx, ky = jax.random.split(key)
        gx = 2.5 + jax.random.uniform(kx, (), minval=-0.5, maxval=0.5)
        gy = jax.random.uniform(ky, (), minval=-1.0, maxval=1.0)
        goal = jnp.concatenate(
            [jnp.stack([gx, gy, jnp.asarray(0.2)]),
             jnp.array([1.0, 0, 0, 0])]
        )
        sim = state.sim.replace(
            kin_pose=state.sim.kin_pose.at[self.goal_site].set(goal)
        )
        return state.replace(sim=sim)

    def evaluate(self, state, ctx: TaskContext):
        is_fallen = self._is_fallen(ctx)
        goal_xy = ctx.actor_pose("goal").p[:2]
        dist = jnp.linalg.norm(goal_xy - self._root_xy(ctx))
        reached = dist < self.goal_radius
        return dict(
            success=reached & ~is_fallen,
            fail=is_fallen,
            robot_to_goal_dist=dist,
            reached_goal=reached,
            is_fallen=is_fallen,
        )

    def _get_obs_extra(self, state, ctx, info):
        obs = super()._get_obs_extra(state, ctx, info)
        obs["reached_goal"] = info["success"]
        if "state" in self.obs_mode:
            goal_xy = ctx.actor_pose("goal").p[:2]
            obs["goal_pos"] = goal_xy
            obs["robot_to_goal"] = goal_xy - self._root_xy(ctx)
        return obs

    def compute_dense_reward(self, state, action, info, ctx: TaskContext):
        reaching = 1.0 - jnp.tanh(info["robot_to_goal_dist"])
        reward = 1.0 + 2.0 * reaching + self._penalties(state, ctx)
        return jnp.where(info["fail"], 0.0, reward)

    def compute_normalized_dense_reward(self, state, action, info, ctx):
        return self.compute_dense_reward(state, action, info, ctx) / 3.0


class QuadrupedSpinEnv(_QuadrupedEnv):
    """Reference quadruped_spin.py: spin in place about +z."""

    def evaluate(self, state, ctx: TaskContext):
        is_fallen = self._is_fallen(ctx)
        return dict(
            success=jnp.zeros((), bool),
            fail=is_fallen,
            is_fallen=is_fallen,
        )

    def compute_dense_reward(self, state, action, info, ctx: TaskContext):
        _, ang = self._root_vel(state)
        reward = 2.0 * ang[2] + self._penalties(state, ctx)
        return jnp.where(info["fail"], -100.0, reward)

    def compute_normalized_dense_reward(self, state, action, info, ctx):
        return self.compute_dense_reward(state, action, info, ctx) / 2.0


@register_env("AnymalC-Reach-v1", max_episode_steps=200)
class AnymalCReachEnv(QuadrupedReachEnv):
    DEFAULT_ROBOT = "anymal_c"


@register_env("AnymalC-Spin-v1", max_episode_steps=200)
class AnymalCSpinEnv(QuadrupedSpinEnv):
    DEFAULT_ROBOT = "anymal_c"


@register_env("UnitreeGo2-Reach-v1", max_episode_steps=200)
class UnitreeGo2ReachEnv(QuadrupedReachEnv):
    DEFAULT_ROBOT = "unitree_go2"
