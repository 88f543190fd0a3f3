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


class TriFingerRotateCubeEnv(RotateCubeEnv):
    """Goal-pose variant (reference ``envs/tasks/rotate_cube.py:59-259``
    TriFingerRotateCubeLevelN): move the 6.5 cm cube to a sampled goal
    pose whose distribution hardens with the level —
    0: random table position; 1: + yaw; 2: fixed aerial (z=0.0825);
    3: random aerial position; 4: full random aerial pose. Success =
    position within goal_radius (2 cm) AND orientation within 0.1 rad.
    """

    difficulty_level = 0
    goal_radius = 0.02
    size = 0.065
    cube_half_size = 0.0325
    min_height = 0.0325
    max_height = 0.1
    radius_3d = 0.065 * np.sqrt(3) / 2
    max_com_dist = 0.195 - 0.065 * np.sqrt(3) / 2

    def _load_scene(self, builder: SceneSpecBuilder):
        super()._load_scene(builder)
        self.obj_goal = builder.add_kinematic_body("cube_goal")

    def _default_extras(self):
        return {}

    def _update_extras(self, state, ctx):
        return state

    def _initialize_episode(self, state: EnvState, key) -> EnvState:
        from ...math.rotations import random_quaternion

        k1, k2, k3, k4 = jax.random.split(key, 4)
        xy0 = jax.random.uniform(k1, (2,), minval=-0.02, maxval=0.02)
        pose0 = jnp.concatenate(
            [xy0, jnp.array([self.cube_half_size, 1.0, 0, 0, 0])])
        # goal sampling per level (reference :175-215)
        kr, kth = jax.random.split(k2)
        r = jnp.sqrt(jax.random.uniform(kr, ())) * self.max_com_dist
        th = jax.random.uniform(kth, (), minval=0.0, maxval=2 * jnp.pi)
        gx, gy = r * jnp.cos(th), r * jnp.sin(th)
        lvl = self.difficulty_level
        if lvl == 0:
            gp = jnp.array([gx, gy, self.cube_half_size])
            gq = jnp.array([1.0, 0, 0, 0])
        elif lvl == 1:
            gp = jnp.array([gx, gy, self.cube_half_size])
            gq = random_quaternion(k3, lock_x=True, lock_y=True)
        elif lvl == 2:
            gp = jnp.array([0.0, 0.0, self.min_height + 0.05])
            gq = jnp.array([1.0, 0, 0, 0])
        elif lvl == 3:
            gz = jax.random.uniform(k4, (), minval=self.min_height,
                                    maxval=self.max_height)
            gp = jnp.array([gx, gy, gz])
            gq = jnp.array([1.0, 0, 0, 0])
        else:
            gz = jax.random.uniform(k4, (), minval=self.radius_3d,
                                    maxval=self.max_height)
            gp = jnp.array([gx, gy, gz])
            gq = random_quaternion(k3)
        sim = state.sim.replace(
            free_pose=state.sim.free_pose.at[self.obj].set(pose0),
            free_vel=jnp.zeros_like(state.sim.free_vel),
            kin_pose=state.sim.kin_pose.at[self.obj_goal].set(
                jnp.concatenate([gp, gq])),
        )
        return state.replace(sim=sim)

    def evaluate(self, state: EnvState, ctx: TaskContext):
        obj = ctx.actor_pose("cube")
        goal = ctx.actor_pose("cube_goal")
        pos_close = jnp.linalg.norm(obj.p - goal.p) < self.goal_radius
        # quat angle difference (reference common.quat_diff_rad)
        d = jnp.abs(jnp.sum(obj.q * goal.q))
        ang = 2.0 * jnp.arccos(jnp.clip(d, 0.0, 1.0))
        return dict(success=pos_close & (ang < 0.1))

    def _get_obs_extra(self, state, ctx, info):
        obs = dict(
            goal_pos=ctx.actor_pose("cube_goal").p,
            goal_q=ctx.actor_pose("cube_goal").q,
        )
        if "state" in self.obs_mode:
            obs.update(obj_pose=ctx.actor_pose("cube").raw)
        return obs

    def compute_dense_reward(self, state, action, info, ctx):
        # reference :265-320: finger-reach + weighted pos/rot progress
        obj = ctx.actor_pose("cube")
        goal = ctx.actor_pose("cube_goal")
        tips = self._tip_positions(ctx)
        reach = jnp.sum(1.0 - jnp.tanh(
            5.0 * jnp.linalg.norm(tips - obj.p[None], axis=-1)))
        pos_rew = 5.0 * (1.0 - jnp.tanh(5.0 * jnp.linalg.norm(obj.p - goal.p)))
        d = jnp.abs(jnp.sum(obj.q * goal.q))
        ang = 2.0 * jnp.arccos(jnp.clip(d, 0.0, 1.0))
        rot_rew = 5.0 * (1.0 - jnp.tanh(ang))
        reward = reach + pos_rew + rot_rew
        return jnp.where(info["success"], 20.0, reward)

    def compute_normalized_dense_reward(self, state, action, info, ctx):
        return self.compute_dense_reward(state, action, info, ctx) / 20.0


for _lvl in range(5):
    register_env(f"TriFingerRotateCubeLevel{_lvl}-v1",
                 max_episode_steps=250)(
        type(f"TriFingerRotateCubeLevel{_lvl}Env",
             (TriFingerRotateCubeEnv,), dict(difficulty_level=_lvl))
    )
