"""Control-suite locomotion tasks: MS-HopperStand/Hop, MS-AntWalk/Run.

Parity ports of the reference control suite
(``mani_skill/envs/tasks/control/hopper.py`` / ``ant.py`` — dm_control
reward structures over MJCF robots). The robots load through the
TPU-native MJCF parser (kinematics/mjcf.py): the planar hopper root is a
slide-slide-hinge chain straight from the XML; the ant's ``<freejoint>``
expands to a 6-dof chain. Torque actuation via TorqueController (MJCF
``<motor>`` gears).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...agents.base_agent import BaseAgent, Keyframe, register_agent
from ...agents.controllers.base import TorqueControllerConfig
from ...kinematics.mjcf import load_mjcf
from ...utils.assets import ASSET_DIR
from ..base_env import BaseEnv, TaskContext
from ..registration import register_env
from ...envs import rewards
from ...physics.model import SceneSpecBuilder, plane_geom

_STAND_HEIGHT_HOPPER = 0.6  # reference hopper.py:27
_HOP_SPEED = 2.0  # reference hopper.py:30
_STAND_HEIGHT_ANT = 0.35  # reference ant.py torso height bar
_WALK_SPEED = 0.5
_RUN_SPEED = 4.0


class _MJCFAgent(BaseAgent):
    mjcf_path: str = ""
    balance_passive_force = False  # locomotion: gravity acts on the robot

    def _make_robot_spec(self):
        self._mjcf = load_mjcf(str(self.mjcf_path))
        return self._mjcf.spec

    def collision_geoms(self):
        return [dict(g) for g in self._mjcf.collision_geoms]

    def _controller_configs(self):
        acts = self._mjcf.actuators
        return {
            "torque": {
                "body": TorqueControllerConfig(
                    joint_names=[a["joint"] for a in acts],
                    gear=np.array([a["gear"] for a in acts], np.float32),
                    ctrlrange=acts[0]["ctrlrange"],
                )
            }
        }


@register_agent
class HopperRobot(_MJCFAgent):
    uid = "hopper"
    mjcf_path = ASSET_DIR / "control/hopper.xml"
    keyframes = {"rest": Keyframe(qpos=np.zeros(7, np.float32))}


@register_agent
class AntRobot(_MJCFAgent):
    uid = "ant"
    mjcf_path = ASSET_DIR / "control/ant.xml"
    keyframes = {"rest": Keyframe(qpos=np.zeros(14, np.float32))}


class _ControlEnv(BaseEnv):
    """Shared locomotion scaffolding: ground plane from the MJCF world,
    whole-robot COM velocity, link-height helpers."""

    SUPPORTED_OBS_MODES = ("state", "state_dict", "none")
    SIM_FREQ = 100
    CONTROL_FREQ = 25  # reference control SimConfig (hopper.py:117-124)

    def __init__(self, *args, control_mode=None, sim_params=None, **kwargs):
        from ...physics.model import SimParams

        # stiff gym-style gears (ant: 150) on light links need h=5ms; the
        # velocity-level contact law is still restitution-free there
        if sim_params is None:
            sim_params = SimParams(dt=1.0 / self.SIM_FREQ, substeps=2)
        super().__init__(*args, control_mode=control_mode or "torque",
                         sim_params=sim_params, **kwargs)

    def _load_agent(self, builder: SceneSpecBuilder):
        self.agent.install(
            builder, np.array([0, 0, 0, 1, 0, 0, 0], np.float32)
        )

    def _load_scene(self, builder: SceneSpecBuilder):
        floor_fric = 1.0
        for g in self.agent._mjcf.world_geoms:
            if g["type"] == "plane":
                floor_fric = float(g["friction"])
        builder.add_static_body(
            "floor", np.array([0, 0, 0, 1, 0, 0, 0], np.float32),
            [plane_geom(friction=floor_fric)],
        )

    def _link_velocities(self, ctx: TaskContext, qvel):
        """(nb, 6) [ω; v_ref] spatial velocities of every body."""
        from ...physics.engine import joint_columns

        model = self.model
        ref = jnp.asarray(model.robot_base_pose[:3])
        cols = joint_columns(model, ctx.body_pos, ctx.axis_w, ref)
        anc = jnp.asarray(model.ancestor_mask)
        return (anc[:, :, None] * cols[None, :, :]).swapaxes(1, 2) @ qvel

    def _com_vel(self, state, ctx):
        """Mass-weighted COM linear velocity of the whole robot (the
        reference's ``subtreelinvel``, hopper.py:191-199; link-origin
        velocities stand in for per-link COM velocities, as the reference
        does with ``link.get_linear_velocity()``)."""
        model = self.model
        vb = self._link_velocities(ctx, state.sim.qvel)  # (nb, 6)
        ref = jnp.asarray(model.robot_base_pose[:3])
        v_lin = vb[:, 3:] + jnp.cross(vb[:, :3], ctx.body_pos - ref)
        m = jnp.asarray(model.robot.mass)
        return (m[:, None] * v_lin).sum(0) / m.sum()

    def evaluate(self, state, ctx):
        return dict(success=jnp.zeros((), bool))

    def _get_obs_extra(self, state, ctx, info):
        return {}


class _HopperEnv(_ControlEnv):
    SUPPORTED_ROBOTS = ["hopper"]
    DEFAULT_ROBOT = "hopper"

    def _initialize_episode(self, state, key):
        """dm_control-style: rotation joint ~U(-pi, pi), leg joints within
        limits (reference hopper.py:166-182)."""
        k1, k2 = jax.random.split(key)
        qlim = jnp.asarray(self.model.robot_qlim)
        nq = self.model.nq
        u = jax.random.uniform(k1, (nq,))
        q = qlim[:, 0] + u * (qlim[:, 1] - qlim[:, 0])
        q = q.at[0].set(0.0).at[1].set(0.0)
        q = q.at[2].set(jax.random.uniform(k2, (), minval=-np.pi / 6,
                                           maxval=np.pi / 6))
        sim = state.sim.replace(qpos=q, qvel=jnp.zeros(nq))
        return state.replace(sim=sim)

    def _height(self, ctx):
        torso = self.model.robot.link_index["torso"]
        heel = self.model.robot.link_index["foot_heel"]
        return ctx.body_pos[torso, 2] - ctx.body_pos[heel, 2]


@register_env("MS-HopperStand-v1", max_episode_steps=600)
class HopperStandEnv(_HopperEnv):
    """Stand upright (reference hopper.py:218-243)."""

    def compute_dense_reward(self, state, action, info, ctx):
        return rewards.tolerance(
            self._height(ctx), lower=_STAND_HEIGHT_HOPPER, upper=2.0
        )

    def compute_normalized_dense_reward(self, state, action, info, ctx):
        return self.compute_dense_reward(state, action, info, ctx)


@register_env("MS-HopperHop-v1", max_episode_steps=600)
class HopperHopEnv(_HopperEnv):
    """Hop in +x (reference hopper.py:245-276)."""

    def compute_dense_reward(self, state, action, info, ctx):
        standing = rewards.tolerance(
            self._height(ctx), lower=_STAND_HEIGHT_HOPPER, upper=2.0
        )
        hopping = rewards.tolerance(
            self._com_vel(state, ctx)[0],
            lower=_HOP_SPEED, upper=jnp.inf, margin=_HOP_SPEED / 2,
            value_at_margin=0.5, sigmoid="linear",
        )
        return standing * hopping

    def compute_normalized_dense_reward(self, state, action, info, ctx):
        return self.compute_dense_reward(state, action, info, ctx)


class _AntEnv(_ControlEnv):
    SUPPORTED_ROBOTS = ["ant"]
    DEFAULT_ROBOT = "ant"
    move_speed = _WALK_SPEED

    def _initialize_episode(self, state, key):
        nq = self.model.nq
        k1, k2 = jax.random.split(key)
        dq = jax.random.uniform(k1, (nq,), minval=-1e-2, maxval=1e-2)
        dv = jax.random.uniform(k2, (nq,), minval=-1e-2, maxval=1e-2)
        # legs posed inside their joint limits (reference ant.py keyframe:
        # ankles ~1 rad into their range, hips 0), root z -0.175 so the
        # feet touch the floor with the torso at ~0.575
        qlim = jnp.asarray(self.model.robot_qlim)
        q = jnp.clip(jnp.zeros(nq), qlim[:, 0] + 0.3, qlim[:, 1] - 0.3)
        q = q + dq
        q = q.at[2].set(-0.175)
        sim = state.sim.replace(qpos=q, qvel=dv)
        return state.replace(sim=sim)

    def compute_dense_reward(self, state, action, info, ctx):
        torso = self.model.robot.link_index["torso"]
        height = ctx.body_pos[torso, 2]
        standing = rewards.tolerance(
            height, lower=_STAND_HEIGHT_ANT, upper=jnp.inf,
            margin=_STAND_HEIGHT_ANT / 4,
        )
        move = rewards.tolerance(
            self._com_vel(state, ctx)[0],
            lower=self.move_speed, upper=jnp.inf, margin=self.move_speed,
            value_at_margin=0.0, sigmoid="linear",
        )
        small_control = (
            4 + rewards.tolerance(action, margin=1, value_at_margin=0,
                                  sigmoid="quadratic").mean()
        ) / 5
        return small_control * move * standing

    def compute_normalized_dense_reward(self, state, action, info, ctx):
        return self.compute_dense_reward(state, action, info, ctx)


@register_env("MS-AntWalk-v1", max_episode_steps=1000)
class AntWalkEnv(_AntEnv):
    """Walk at 0.5 m/s (reference ant.py:297-312)."""

    move_speed = _WALK_SPEED


@register_env("MS-AntRun-v1", max_episode_steps=1000)
class AntRunEnv(_AntEnv):
    """Run at 4 m/s (reference ant.py:314-330)."""

    move_speed = _RUN_SPEED


_STAND_HEIGHT_HUM = 1.4  # reference humanoid.py:21
_WALK_SPEED_HUM = 1.0
_RUN_SPEED_HUM = 10.0


@register_agent
class HumanoidRobot(_MJCFAgent):
    uid = "humanoid"
    mjcf_path = ASSET_DIR / "robots/humanoid/humanoid.xml"
    keyframes = {"rest": Keyframe(qpos=np.zeros(27, np.float32))}


class _HumanoidEnv(_ControlEnv):
    """dm_control humanoid locomotion scaffolding (reference
    ``mani_skill/envs/tasks/control/humanoid.py``)."""

    SUPPORTED_ROBOTS = ["humanoid"]
    DEFAULT_ROBOT = "humanoid"
    move_speed = 0.0

    def _initialize_episode(self, state, key):
        nq = self.model.nq
        k1, k2 = jax.random.split(key)
        dq = jax.random.uniform(k1, (nq,), minval=-1e-2, maxval=1e-2)
        dv = jax.random.uniform(k2, (nq,), minval=-1e-2, maxval=1e-2)
        qlim = jnp.asarray(self.model.robot_qlim)
        q = jnp.clip(jnp.zeros(nq), qlim[:, 0] + 0.1, qlim[:, 1] - 0.1) + dq
        # torso at the XML origin; feet reach z=-0.98 -> lift the root
        q = q.at[2].set(1.23)
        sim = state.sim.replace(qpos=q, qvel=dv)
        return state.replace(sim=sim)

    def _head_height(self, ctx):
        head = self.model.robot.frame_of("head")
        b, off, _ = head
        from ...math.rotations import quat_apply as _qa

        return (ctx.body_pos[b]
                + _qa(ctx.body_quat[b], jnp.asarray(off, jnp.float32)))[2]

    def _torso_upright(self, ctx):
        torso = self.model.robot.link_index["torso"]
        q = ctx.body_quat[torso]
        # world z-component of the torso z axis = R[2,2]
        w, x, y, z = q[0], q[1], q[2], q[3]
        return 1.0 - 2.0 * (x * x + y * y)

    def compute_dense_reward(self, state, action, info, ctx):
        standing = rewards.tolerance(
            self._head_height(ctx), lower=_STAND_HEIGHT_HUM, upper=jnp.inf,
            margin=_STAND_HEIGHT_HUM / 4,
        )
        upright = rewards.tolerance(
            self._torso_upright(ctx), lower=0.9, upper=jnp.inf,
            sigmoid="linear", margin=1.9, value_at_margin=0,
        )
        small_control = (
            4 + rewards.tolerance(action, margin=1, value_at_margin=0,
                                  sigmoid="quadratic").mean()
        ) / 5
        stand_reward = standing * upright
        com_xy = self._com_vel(state, ctx)[:2]
        if self.move_speed == 0.0:
            dont_move = rewards.tolerance(com_xy, margin=2.0).mean()
            return small_control * stand_reward * dont_move
        move = rewards.tolerance(
            jnp.linalg.norm(com_xy), lower=self.move_speed, upper=jnp.inf,
            margin=self.move_speed, value_at_margin=0, sigmoid="linear",
        )
        return small_control * stand_reward * move

    def compute_normalized_dense_reward(self, state, action, info, ctx):
        return self.compute_dense_reward(state, action, info, ctx)


@register_env("MS-HumanoidStand-v1", max_episode_steps=1000)
class HumanoidStandEnv(_HumanoidEnv):
    """Stand upright without moving (reference humanoid.py:284)."""

    move_speed = 0.0


@register_env("MS-HumanoidWalk-v1", max_episode_steps=1000)
class HumanoidWalkEnv(_HumanoidEnv):
    """Walk at 1 m/s (reference humanoid.py:354)."""

    move_speed = _WALK_SPEED_HUM


@register_env("MS-HumanoidRun-v1", max_episode_steps=1000)
class HumanoidRunEnv(_HumanoidEnv):
    """Run at 10 m/s (reference humanoid.py:386)."""

    move_speed = _RUN_SPEED_HUM
