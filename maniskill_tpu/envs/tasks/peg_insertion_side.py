"""PegInsertionSide-v1.

Port of the reference PegInsertionSide
(``mani_skill/envs/tasks/tabletop/peg_insertion_side.py``): grasp a peg lying
on the table and insert it sideways into a box with a hole. Same pose
randomizations, success condition (peg head inside the hole past half depth,
:269-288), and 4-stage dense reward (:300-355).

Heterogeneous batches: the peg's half-length/radius are randomized PER
EPISODE and PER ENV through ``SimState.geom_size`` (sizes-as-state — the
TPU-native form of the reference's per-sub-scene reconfiguration,
:97-136). The hole is built at the maximum radius + clearance, so the
effective clearance varies with the sampled peg radius.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...math.pose import Pose
from ...math.rotations import quat_from_axis_angle
from ...physics.model import SceneSpecBuilder, box_geom
from ..base_env import BaseEnv, EnvState, TaskContext
from ..registration import register_env
from ..scene_builders import TableSceneBuilder


@register_env("PegInsertionSide-v1", max_episode_steps=100)
class PegInsertionSideEnv(BaseEnv):
    SUPPORTED_ROBOTS = ["panda", "panda_wristcam"]
    DEFAULT_ROBOT = "panda_wristcam"

    peg_len_range = (0.085, 0.125)  # reference :97
    peg_radius_range = (0.015, 0.025)  # reference :98
    peg_half_length = 0.105  # nominal (hole depth / spawn defaults)
    peg_radius = 0.025  # max radius sizes the hole
    _clearance = 0.003

    def _load_agent(self, builder: SceneSpecBuilder):
        self.table_scene = TableSceneBuilder(self)
        pose, qpos = self.table_scene.robot_pose_and_qpos("panda_wristcam")
        self.agent.install(builder, pose, init_qpos=qpos)

    def _load_scene(self, builder: SceneSpecBuilder):
        self.table_scene.build(builder)
        L, r = self.peg_half_length, self.peg_radius
        m = 1000.0 * (2 * L) * (2 * r) * (2 * r)
        inertia = (
            m / 3.0 * np.diag([2 * r * r, L * L + r * r, L * L + r * r])
        )
        self.peg = builder.add_free_body(
            "peg", m, inertia, [box_geom([L, r, r])]
        )
        # box with hole: 4 walls (reference _build_box_with_hole :19-48),
        # x-axis = hole direction, kinematic
        inner = r + self._clearance
        outer = L
        depth = L
        thickness = (outer - inner) * 0.5
        offset = thickness + inner
        walls = [
            box_geom([depth, thickness, outer], offset_p=[0, offset, 0]),
            box_geom([depth, thickness, outer], offset_p=[0, -offset, 0]),
            box_geom([depth, outer, thickness], offset_p=[0, 0, offset]),
            box_geom([depth, outer, thickness], offset_p=[0, 0, -offset]),
        ]
        self.box = builder.add_kinematic_body("box_with_hole", walls)
        self.box_hole_radius = inner

    def _post_build(self):
        self._is_grasping_peg = self.agent.build_grasp_checker(
            self.model, "peg", max_angle=20
        )

    def _default_extras(self):
        return dict(peg_half_size=jnp.zeros(3))

    def _initialize_episode(self, state: EnvState, key) -> EnvState:
        ks = jax.random.split(key, 6)
        # per-env peg dimensions via sizes-as-state
        L = jax.random.uniform(ks[4], (), minval=self.peg_len_range[0],
                               maxval=self.peg_len_range[1])
        r = jax.random.uniform(ks[5], (), minval=self.peg_radius_range[0],
                               maxval=self.peg_radius_range[1])
        peg_size = jnp.stack([L, r, r])
        gidx = self.model.geom_indices("peg")[0]
        up = jnp.array([0.0, 0.0, 1.0])
        # peg flat on table, yaw in pi/2 +- pi/3 (reference :199-208)
        peg_xy = jax.random.uniform(
            ks[0], (2,), minval=jnp.array([-0.1, -0.3]), maxval=jnp.array([0.1, 0.0])
        )
        peg_yaw = jnp.pi / 2 + jax.random.uniform(
            ks[1], (), minval=-jnp.pi / 3, maxval=jnp.pi / 3
        )
        peg_pose = jnp.concatenate(
            [peg_xy, r[None], quat_from_axis_angle(up, peg_yaw)]
        )
        # box on the far side, yaw in pi/2 +- pi/8 (reference :210-221)
        box_xy = jax.random.uniform(
            ks[2], (2,), minval=jnp.array([-0.05, 0.2]), maxval=jnp.array([0.05, 0.4])
        )
        box_yaw = jnp.pi / 2 + jax.random.uniform(
            ks[3], (), minval=-jnp.pi / 8, maxval=jnp.pi / 8
        )
        box_pose = jnp.concatenate(
            [box_xy, jnp.array([self.peg_half_length]),
             quat_from_axis_angle(up, box_yaw)]
        )
        sim = state.sim.replace(
            free_pose=state.sim.free_pose.at[self.peg].set(peg_pose),
            free_vel=jnp.zeros_like(state.sim.free_vel),
            kin_pose=state.sim.kin_pose.at[self.box].set(box_pose),
            geom_size=state.sim.geom_size.at[gidx].set(peg_size),
        )
        return state.replace(sim=sim, extras=dict(peg_half_size=peg_size))

    # -- geometry helpers (reference :249-267) -----------------------------
    def _peg_head_pose(self, ctx) -> Pose:
        L = ctx.state.extras["peg_half_size"][0]
        return ctx.actor_pose("peg") * Pose.create(
            p=jnp.stack([L, jnp.zeros(()), jnp.zeros(())])
        )

    def _box_hole_pose(self, ctx) -> Pose:
        return ctx.actor_pose("box_with_hole")  # centered hole

    def _goal_pose(self, ctx) -> Pose:
        return self._box_hole_pose(ctx) * Pose.create(
            p=jnp.array([-self.peg_half_length, 0, 0])
        )

    def evaluate(self, state: EnvState, ctx: TaskContext):
        head_at_hole = (self._box_hole_pose(ctx).inv() * self._peg_head_pose(ctx)).p
        r = self.box_hole_radius
        success = (
            (head_at_hole[0] >= -0.015)
            & (jnp.abs(head_at_hole[1]) <= r)
            & (jnp.abs(head_at_hole[2]) <= r)
        )
        return dict(success=success, peg_head_pos_at_hole=head_at_hole)

    def _get_obs_extra(self, state: EnvState, ctx: TaskContext, info):
        obs = dict(tcp_pose=ctx.tcp_pose.raw)
        if "state" in self.obs_mode:
            obs.update(
                peg_pose=ctx.actor_pose("peg").raw,
                peg_half_size=state.extras["peg_half_size"],
                box_hole_pose=self._box_hole_pose(ctx).raw,
                box_hole_radius=jnp.array([self.box_hole_radius]),
            )
        return obs

    def compute_dense_reward(self, state, action, info, ctx: TaskContext):
        # stage 2: reach + grasp (reference :301-318)
        tgt = ctx.actor_pose("peg") * Pose.create(p=jnp.array([-0.06, 0, 0]))
        reach = 1.0 - jnp.tanh(4.0 * jnp.linalg.norm(ctx.tcp_pose.p - tgt.p))
        f_pt = ctx.contact_forces()
        is_grasped = self._is_grasping_peg(ctx.body_quat, f_pt)
        reward = reach + is_grasped

        # stage 3: align peg with the hole axis (reference :321-340)
        goal = self._goal_pose(ctx)
        head_wrt_goal = (goal.inv() * self._peg_head_pose(ctx)).p
        peg_wrt_goal = (goal.inv() * ctx.actor_pose("peg")).p
        d_head = jnp.linalg.norm(head_wrt_goal[1:])
        d_peg = jnp.linalg.norm(peg_wrt_goal[1:])
        pre_insertion = 3.0 * (
            1.0 - jnp.tanh(0.5 * (d_head + d_peg) + 4.5 * jnp.maximum(d_head, d_peg))
        )
        reward = reward + pre_insertion * is_grasped
        pre_inserted = (d_head < 0.01) & (d_peg < 0.01)

        # stage 4: insert (reference :343-350)
        head_in_hole = (self._box_hole_pose(ctx).inv() * self._peg_head_pose(ctx)).p
        insertion = 5.0 * (1.0 - jnp.tanh(5.0 * jnp.linalg.norm(head_in_hole)))
        reward = reward + insertion * (is_grasped & pre_inserted)

        return jnp.where(info["success"], 10.0, reward)

    def compute_normalized_dense_reward(self, state, action, info, ctx):
        return self.compute_dense_reward(state, action, info, ctx) / 10.0
