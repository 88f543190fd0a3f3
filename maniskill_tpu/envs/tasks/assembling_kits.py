"""AssemblingKits-v1: insert a piece into the board slot.

Primitive-lite parity port of the reference kit-assembly task
(``mani_skill/envs/tasks/tabletop/assembling_kits.py``): the reference
builds mesh kits with per-episode shape cutouts; here the board is a
4-box plate forming one square slot (real insertion physics — the piece
must pass THROUGH the hole) and the piece is a per-env-sized box
(SimState.geom_size heterogeneity). Success keeps the reference
thresholds exactly: xy within 2 cm of the slot, yaw within 4° (mod the
piece's π/2 symmetry), piece dropped below the board top
(assembling_kits.py:242-279).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...math.rotations import quat_from_axis_angle
from ...physics.model import SceneSpecBuilder, box_geom
from ..base_env import BaseEnv, EnvState, TaskContext
from ..registration import register_env
from .pick_cube import PickCubeEnv


@register_env("AssemblingKits-v1", max_episode_steps=100)
class AssemblingKitsEnv(PickCubeEnv):
    SUPPORTED_ROBOTS = ["panda", "panda_wristcam"]
    DEFAULT_ROBOT = "panda"

    slot_half = 0.030  # half width of the square slot opening
    board_half = 0.12  # board half extent
    board_thick = 0.004  # half thickness
    board_z = 0.008  # board top sits at 2*thick + small feet
    piece_lo = 0.018
    piece_hi = 0.024
    pos_eps = 2e-2  # reference :242
    rot_eps = np.deg2rad(4)  # reference :247

    def _load_scene(self, builder: SceneSpecBuilder):
        self.table_scene.build(builder)
        s, b, t = self.slot_half, self.board_half, self.board_thick
        z = self.board_z
        # 4 static boxes forming a plate with a square hole at the center
        self.board_center = np.array([0.1, 0.0], np.float32)
        cx, cy = self.board_center
        w = (b - s) / 2
        for name, (ox, oy, hx, hy) in dict(
            north=(0.0, s + w, b, w),
            south=(0.0, -(s + w), b, w),
            east=(s + w, 0.0, w, s),
            west=(-(s + w), 0.0, w, s),
        ).items():
            builder.add_static_body(
                f"board_{name}",
                np.array([cx + ox, cy + oy, z, 1, 0, 0, 0], np.float32),
                [box_geom([hx, hy, t], friction=0.4)],
            )
        half = 0.021
        m = 1000.0 * (2 * half) ** 3
        inertia = (2.0 / 3.0) * m * half * half * np.eye(3)
        self.cube = builder.add_free_body(
            "cube", m, inertia, [box_geom([half, half, half], friction=0.6)]
        )
        self.goal_site = builder.add_kinematic_body("goal_site")

    def _initialize_episode(self, state: EnvState, key) -> EnvState:
        k1, k2, k3 = jax.random.split(key, 3)
        # per-env piece size (always fits the slot with >=6mm clearance)
        half_xy = jax.random.uniform(
            k1, (), minval=self.piece_lo, maxval=self.piece_hi
        )
        half = jnp.stack([half_xy, half_xy, jnp.asarray(0.02)])
        gidx = self.model.geom_indices("cube")[0]
        xy = jax.random.uniform(k2, (2,), minval=-0.08, maxval=-0.02)
        xy = xy + jnp.array([-0.1, 0.15])  # spawn area left of the board
        yaw = jax.random.uniform(k3, (), minval=-jnp.pi, maxval=jnp.pi)
        q = quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), yaw)
        pose = jnp.concatenate([xy, jnp.stack([half[2]]), q])
        goal = jnp.concatenate([
            jnp.asarray(self.board_center), jnp.asarray([0.02]),
            jnp.array([1.0, 0, 0, 0]),
        ])
        m = 1000.0 * 8.0 * half[0] * half[1] * half[2]
        inertia = (m / 3.0) * jnp.diag(jnp.stack([
            half[1] ** 2 + half[2] ** 2, half[0] ** 2 + half[2] ** 2,
            half[0] ** 2 + half[1] ** 2,
        ]))
        sim = state.sim.replace(
            free_pose=state.sim.free_pose.at[self.cube].set(pose),
            free_vel=state.sim.free_vel.at[self.cube].set(jnp.zeros(6)),
            kin_pose=state.sim.kin_pose.at[self.goal_site].set(goal),
            geom_size=state.sim.geom_size.at[gidx].set(half),
            free_mass=state.sim.free_mass.at[self.cube].set(m),
            free_inertia=state.sim.free_inertia.at[self.cube].set(inertia),
        )
        return state.replace(sim=sim)

    def evaluate(self, state: EnvState, ctx: TaskContext):
        p = ctx.actor_pose("cube")
        pos_diff = jnp.linalg.norm(
            p.p[:2] - jnp.asarray(self.board_center)
        )
        pos_correct = pos_diff < self.pos_eps
        # yaw mod π/2 (square piece symmetry, reference symmetry table)
        q = p.q
        yaw = jnp.arctan2(
            2.0 * (q[0] * q[3] + q[1] * q[2]),
            1.0 - 2.0 * (q[2] ** 2 + q[3] ** 2),
        )
        rot_diff = jnp.abs(
            (yaw + jnp.pi / 4) % (jnp.pi / 2) - jnp.pi / 4
        )
        rot_correct = rot_diff < self.rot_eps
        # in slot: dropped through the board opening
        in_slot = p.p[2] < 2 * self.board_thick + 0.021
        f_pt = ctx.contact_forces()
        is_grasped = self._is_grasping(ctx.body_quat, f_pt)
        return dict(
            success=pos_correct & rot_correct & in_slot & ~is_grasped,
            pos_diff_norm=pos_diff,
            rot_diff=rot_diff,
            pos_correct=pos_correct,
            rot_correct=rot_correct,
            in_slot=in_slot,
            is_grasped=is_grasped,
            is_obj_placed=pos_correct & in_slot,
            is_robot_static=self.agent.is_static(state.sim.qvel, 0.2),
        )

    def _get_obs_extra(self, state, ctx, info):
        obs = dict(
            is_grasped=info["is_grasped"],
            tcp_pose=ctx.tcp_pose.raw,
            goal_pos=ctx.actor_pose("goal_site").p,
        )
        if "state" in self.obs_mode:
            cube = ctx.actor_pose("cube")
            obs.update(
                obj_pose=cube.raw,
                tcp_to_obj_pos=cube.p - ctx.tcp_pose.p,
                obj_to_goal_pos=ctx.actor_pose("goal_site").p - cube.p,
                obj_half=state.sim.geom_size[
                    self.model.geom_indices("cube")[0]
                ],
            )
        return obs

    def compute_dense_reward(self, state, action, info, ctx: TaskContext):
        cube_p = ctx.actor_pose("cube").p
        goal_p = ctx.actor_pose("goal_site").p
        reach = 1.0 - jnp.tanh(
            5.0 * jnp.linalg.norm(cube_p - ctx.tcp_pose.p)
        )
        grasped = info["is_grasped"].astype(jnp.float32)
        carry = 1.0 - jnp.tanh(5.0 * jnp.linalg.norm(goal_p - cube_p))
        align = 1.0 - jnp.tanh(10.0 * info["rot_diff"])
        insert = 1.0 - jnp.tanh(
            20.0 * jnp.maximum(cube_p[2] - 0.02, 0.0)
        )
        reward = (
            reach + grasped + grasped * carry
            + info["pos_correct"].astype(jnp.float32) * (align + insert)
        )
        return jnp.where(info["success"], 6.0, reward)

    def compute_normalized_dense_reward(self, state, action, info, ctx):
        return self.compute_dense_reward(state, action, info, ctx) / 6.0
