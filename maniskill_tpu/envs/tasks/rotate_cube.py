"""RotateCube-v1 (dexterity family).

Parity port of the reference RotateSingleObjectInHand / RotateCube
(``mani_skill/envs/tasks/dexterity/rotate_single_object_in_hand.py``): a
TriFingerPro rotates a cube held above the platform about a target axis.
Same evaluation machinery (per-step rotation angle via the projected unit
vector, cumulative angle success threshold 4π, fall detection) and dense
reward (20·angle − 0.1·|v| − 50·fall − effort/torque penalties + fingertip
distance reward, :reference compute_dense_reward). Task accumulators
(previous unit vector, cumulative angle) live in ``state.extras``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...math.rotations import quat_apply
from ...physics.model import SceneSpecBuilder, SimParams, box_geom, plane_geom
from ..base_env import BaseEnv, EnvState, TaskContext
from ..registration import register_env


@register_env("RotateCube-v1", max_episode_steps=300)
class RotateCubeEnv(BaseEnv):
    SUPPORTED_ROBOTS = ["trifingerpro"]
    DEFAULT_ROBOT = "trifingerpro"

    hand_init_height = 0.25  # reference :27
    cube_half_size = 0.035  # reference RRC cube
    success_threshold = float(np.pi * 4)  # reference :191

    def __init__(self, **kwargs):
        kwargs.setdefault("robot_init_qpos_noise", 0.0)
        super().__init__(**kwargs)

    def _load_agent(self, builder: SceneSpecBuilder):
        # Deviation from the reference's in-hand levitation setup
        # (rotate_single_object_in_hand.py:204-217): we use the physical RRC
        # arena configuration — platform upright, fingers reaching down to a
        # cube on the arena floor (same robot, same reward machinery).
        self.agent.install(
            builder,
            np.array([0, 0, 0, 1, 0, 0, 0], np.float32),
            init_qpos=np.tile(np.array([0.0, 0.65, -1.2], np.float32), 3),
        )

    def _load_scene(self, builder: SceneSpecBuilder):
        builder.add_static_body(
            "table", np.array([0, 0, 0, 1, 0, 0, 0], np.float32), [plane_geom()]
        )
        half = self.cube_half_size
        m = 0.094  # RRC cube mass
        inertia = (2.0 / 3.0) * m * half * half * np.eye(3)
        self.obj = builder.add_free_body(
            "cube", m, inertia, [box_geom([half] * 3, friction=1.0)]
        )

    def _default_extras(self):
        return dict(
            prev_unit_vector=jnp.zeros(3),
            unit_vector=jnp.zeros(3),
            rot_dir=jnp.zeros(3),
            cum_rotation_angle=jnp.zeros(()),
            rotation_angle=jnp.zeros(()),
        )

    def _initialize_episode(self, state: EnvState, key) -> EnvState:
        k1, k2 = jax.random.split(key)
        xy = jax.random.uniform(k1, (2,), minval=-0.02, maxval=0.02)
        z = self.cube_half_size
        pose = jnp.concatenate([xy, jnp.array([z, 1.0, 0, 0, 0])])
        sim = state.sim.replace(
            free_pose=state.sim.free_pose.at[self.obj].set(pose),
            free_vel=jnp.zeros_like(state.sim.free_vel),
        )
        # target rotation axis +z; tracking vector = random horizontal unit
        # vector (reference :177-190)
        ang = jax.random.uniform(k2, (), minval=-jnp.pi, maxval=jnp.pi)
        vec = jnp.array([jnp.cos(ang), jnp.sin(ang), 0.0])
        extras = dict(
            prev_unit_vector=vec,
            unit_vector=vec,
            rot_dir=jnp.array([0.0, 0.0, 1.0]),
            cum_rotation_angle=jnp.zeros(()),
            rotation_angle=jnp.zeros(()),
        )
        return state.replace(sim=sim, extras=extras)

    def _update_extras(self, state: EnvState, ctx: TaskContext) -> EnvState:
        ex = state.extras
        obj_q = ctx.actor_pose("cube").q
        new_vec = quat_apply(obj_q, ex["unit_vector"])
        rot_dir = ex["rot_dir"]
        new_vec = new_vec - jnp.sum(new_vec * rot_dir) * rot_dir
        new_vec = new_vec / jnp.sqrt(jnp.sum(new_vec * new_vec) + 1e-12)
        angle = jnp.arccos(
            jnp.clip(jnp.sum(new_vec * ex["prev_unit_vector"]), 0.0, 1.0 - 1e-7)
        )
        angle = jnp.clip(angle, -jnp.pi / 20, jnp.pi / 20)  # reference :~
        extras = dict(
            ex,
            prev_unit_vector=new_vec,
            rotation_angle=angle,
            cum_rotation_angle=ex["cum_rotation_angle"] + angle,
        )
        return state.replace(extras=extras)

    def _tip_positions(self, ctx: TaskContext):
        return jnp.stack(
            [ctx.frame_pose(n).p for n in self.agent.tip_link_names]
        )  # (3, 3)

    def evaluate(self, state: EnvState, ctx: TaskContext):
        ex = state.extras
        obj = ctx.actor_pose("cube")
        obj_vel = jnp.sqrt(jnp.sum(ctx.actor_vel("cube")[:3] ** 2) + 1e-18)
        # "fall" here = cube escaped the arena (floor-based variant)
        obj_fall = jnp.linalg.norm(obj.p[:2]) > 0.19
        tip_vec = self._tip_positions(ctx) - obj.p[None]
        tip_dist = jnp.sqrt(jnp.sum(tip_vec * tip_vec, axis=-1) + 1e-18)
        # controller effort (reference :evaluate 6.)
        kp, kd, flim = 1e2, 1e1, 2e1
        qf = jnp.clip(
            kp * (state.cmd.target_qpos - state.sim.qpos) - kd * state.sim.qvel,
            -flim, flim,
        )
        power = jnp.sum(qf * state.sim.qvel)
        return dict(
            success=ex["cum_rotation_angle"] > self.success_threshold,
            fail=obj_fall,
            rotation_angle=ex["rotation_angle"],
            obj_vel=obj_vel,
            obj_fall=obj_fall,
            obj_tip_dist=tip_dist,
            qf=qf,
            power=power,
        )

    def _get_obs_extra(self, state: EnvState, ctx: TaskContext, info):
        obs = dict(rot_dir=state.extras["rot_dir"])
        if "state" in self.obs_mode:
            obs.update(
                obj_pose=ctx.actor_pose("cube").raw,
                obj_tip_vec=(self._tip_positions(ctx) - ctx.actor_pose("cube").p[None]).reshape(-1),
            )
        return obs

    def compute_dense_reward(self, state, action, info, ctx):
        reward = 20.0 * info["rotation_angle"]
        reward = reward - 0.1 * info["obj_vel"]
        reward = reward - 50.0 * info["obj_fall"]
        reward = reward - 0.0003 * jnp.abs(info["power"])
        reward = reward - 0.0003 * jnp.sqrt(jnp.sum(info["qf"] ** 2) + 1e-18)
        distance_rew = 0.1 / (0.02 + 4.0 * info["obj_tip_dist"])
        reward = reward + jnp.mean(jnp.clip(distance_rew, 0.0, 1.0))
        return reward

    def compute_normalized_dense_reward(self, state, action, info, ctx):
        return self.compute_dense_reward(state, action, info, ctx) / 4.0
