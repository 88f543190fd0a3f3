"""UnitreeG1TransportBox-v1: bimanual humanoid box transport.

Parity port of the reference humanoid task
(``mani_skill/envs/tasks/humanoid/transport_box.py``): a fixed-base
upper-body G1 between two tables must turn to the box table, grasp the
box with both hands (palm+finger contact force > 10 N per hand, palms
below the grasp points), carry it across, and release it on the other
table. Same randomizations (box xy, yaw in [0, π/6]), same staged dense
reward (face → grasp → carry → release, max 5), same success (box
resting on the target table, not grasped).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...math.pose import Pose
from ...math.rotations import quat_apply, quat_from_axis_angle
from ...physics.engine import _trace_metadata
from ...physics.model import BodyKind, SceneSpecBuilder, box_geom, plane_geom
from ..base_env import BaseEnv, EnvState, TaskContext
from ..registration import register_env

_TABLE_HALF = (0.829, 0.4145, 0.3153)  # transport_box.py:103-105 (×1.2 glb)
_BOX_HALF = (0.18, 0.12, 0.12)  # :129
_BOX_Z = 2 * _TABLE_HALF[2] + _BOX_HALF[2]  # 0.7506 (ref 0.7508)


def _hand_box_mask(model, hand_links, box_name):
    """Static (P,) mask: contact points between the named hand links and
    the box (the reference's summed get_pairwise_contact_forces,
    transport_box.py:159-188)."""
    # frame_of resolves fixed-fused links (e.g. palm) to their moving body
    idx = {int(model.robot.frame_of(n)[0]) for n in hand_links}
    bi = model.free_index[box_name]
    meta = _trace_metadata(model)
    meta_a, meta_b = meta[-2], meta[-1]
    mask = np.zeros(len(meta_a), np.float32)
    for p, ((ka, ba), (kb, bb)) in enumerate(zip(meta_a, meta_b)):
        robot_side = (ka == BodyKind.ROBOT_LINK and ba in idx) or (
            kb == BodyKind.ROBOT_LINK and bb in idx
        )
        box_side = (ka == BodyKind.FREE and ba == bi) or (
            kb == BodyKind.FREE and bb == bi
        )
        if robot_side and box_side:
            mask[p] = 1.0
    return mask


@register_env("UnitreeG1TransportBox-v1", max_episode_steps=100)
class TransportBoxEnv(BaseEnv):
    SUPPORTED_ROBOTS = ["unitree_g1_upper_body"]
    DEFAULT_ROBOT = "unitree_g1_upper_body"
    SUPPORTED_OBS_MODES = ("state", "state_dict", "none")

    def _default_sensor_configs(self):
        return []

    def _load_agent(self, builder: SceneSpecBuilder):
        self.agent.install(
            builder, np.array([-0.1, 0, 0.755, 1, 0, 0, 0], np.float32)
        )

    def _load_scene(self, builder: SceneSpecBuilder):
        builder.add_static_body(
            "ground", np.array([0, 0, 0, 1, 0, 0, 0], np.float32),
            [plane_geom(friction=0.5)],
        )
        for i, y in ((1, 0.66), (2, -0.66)):
            builder.add_static_body(
                f"table-{i}",
                np.array([0, y, _TABLE_HALF[2], 1, 0, 0, 0], np.float32),
                [box_geom(_TABLE_HALF, friction=0.6)],
            )
        m = 200.0 * 8 * np.prod(_BOX_HALF)  # density 200 (ref :129)
        hx, hy, hz = _BOX_HALF
        inertia = m / 3.0 * np.diag(
            [hy * hy + hz * hz, hx * hx + hz * hz, hx * hx + hy * hy]
        )
        self.box = builder.add_free_body(
            "box", m, inertia, [box_geom(_BOX_HALF, friction=0.8)]
        )
        # contact budget: only hands/forearms can touch the box; legs are
        # frozen and never reach the tables
        hand_pat = ("palm", "zero", "one", "two", "three", "four", "five",
                    "six", "elbow", "wrist")
        leg_pat = ("hip", "knee", "ankle", "pelvis")
        builder.exclude_groups(
            [f"robot:*{p}*" for p in leg_pat] + ["robot:*torso*"],
            ["box", "table-*", "ground"],
        )
        non_hand = [f"robot:*{p}*" for p in ("shoulder",)]
        builder.exclude_groups(non_hand, ["box"])

    def _post_build(self):
        model = self.model
        left = ["left_palm_link", "left_three_link", "left_five_link"]
        right = ["right_palm_link", "right_three_link", "right_five_link"]
        self._l_mask = jnp.asarray(_hand_box_mask(model, left, "box"))
        self._r_mask = jnp.asarray(_hand_box_mask(model, right, "box"))
        names = list(model.robot.joint_names)
        self._torso = names.index("torso_joint")
        self._lsp = names.index("left_shoulder_pitch_joint")
        self._rsp = names.index("right_shoulder_pitch_joint")

    def _initialize_episode(self, state: EnvState, key) -> EnvState:
        kx, ky, kq = jax.random.split(key, 3)
        x = -0.1 + jax.random.uniform(kx, (), minval=-0.05, maxval=0.2)
        # reference samples y ≈ -0.37±0.05, leaving yawed box corners up to
        # ~5 cm past the table edge. The point narrowphase gives an
        # overhanging corner no support (no manifold clipping), which tips
        # then walks the box — keep every corner on the table: worst-case
        # corner extent at yaw<=π/6 is 0.174+0.02 < |−0.45|−0.2455.
        y = -0.47 + jax.random.uniform(ky, (), minval=-0.02, maxval=0.02)
        yaw = jax.random.uniform(kq, (), minval=0.0, maxval=np.pi / 6)
        q = quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), yaw)
        pose = jnp.concatenate([jnp.stack([x, y, jnp.asarray(_BOX_Z)]), q])
        sim = state.sim.replace(
            free_pose=state.sim.free_pose.at[self.box].set(pose),
            free_vel=state.sim.free_vel.at[self.box].set(jnp.zeros(6)),
        )
        return state.replace(sim=sim)

    # -- grasp-point helpers (transport_box.py:243-253) ----------------------
    def _grasp_points(self, ctx: TaskContext):
        bp = ctx.actor_pose("box")
        right = bp.p + quat_apply(bp.q, jnp.array([-0.165, 0.07, 0.05]))
        left = bp.p + quat_apply(bp.q, jnp.array([0.165, 0.07, 0.05]))
        return left, right

    def evaluate(self, state: EnvState, ctx: TaskContext):
        f = jnp.linalg.norm(ctx.contact_forces(), axis=-1)
        l_force = jnp.sum(self._l_mask * f)
        r_force = jnp.sum(self._r_mask * f)
        gl, gr = self._grasp_points(ctx)
        l_tcp = ctx.frame_pose("left_palm_link").p
        r_tcp = ctx.frame_pose("right_palm_link").p
        box_grasped = (
            (l_force > 10.0) & (r_force > 10.0)
            & (r_tcp[2] < gr[2] + 0.04) & (l_tcp[2] < gl[2] + 0.04)
        )
        bp = ctx.actor_pose("box").p
        at_z = jnp.abs(bp[2] - _BOX_Z) < 0.006
        at_xy = (
            (bp[0] > -0.78) & (bp[0] < 0.78) & (bp[1] > 0.3) & (bp[1] < 1.0)
        )
        at_table = at_z & at_xy
        torso = state.sim.qpos[self._torso]
        facing = (torso > -1.7) & (torso < -1.4)
        return dict(
            success=(~box_grasped) & at_table,
            box_grasped=box_grasped,
            box_at_correct_table_xy=at_xy,
            facing_table_with_box=facing,
            left_hand_hit_box=l_force > 0,
            right_hand_hit_box=r_force > 0,
        )

    def _get_obs_extra(self, state, ctx, info):
        obs = dict(
            right_tcp_pose=ctx.frame_pose("right_palm_link").raw,
            left_tcp_pose=ctx.frame_pose("left_palm_link").raw,
        )
        if "state" in self.obs_mode:
            bp = ctx.actor_pose("box")
            obs.update(
                box_pose=bp.raw,
                right_tcp_to_box_pos=bp.p - ctx.frame_pose(
                    "right_palm_link").p,
                left_tcp_to_box_pos=bp.p - ctx.frame_pose(
                    "left_palm_link").p,
            )
        return obs

    def compute_dense_reward(self, state, action, info, ctx: TaskContext):
        q = state.sim.qpos
        # stage 1: turn the torso to face the box table (ref :256)
        reward = 1.0 - jnp.tanh(jnp.abs(q[self._torso] + 1.4))
        # stage 2: lower arms + bring palms to the grasp points (ref :260-286)
        gl, gr = self._grasp_points(ctx)
        l_tcp = ctx.frame_pose("left_palm_link").p
        r_tcp = ctx.frame_pose("right_palm_link").p
        stage2 = (
            1.0
            + (1.0 - jnp.tanh(jnp.abs(q[self._lsp]))) / 4
            + (1.0 - jnp.tanh(jnp.abs(q[self._rsp]))) / 4
            + (1.0 - jnp.tanh(3.0 * jnp.linalg.norm(r_tcp - gr))) / 4
            + (1.0 - jnp.tanh(3.0 * jnp.linalg.norm(l_tcp - gl))) / 4
        )
        reward = jnp.where(info["facing_table_with_box"], stage2, reward)
        # stage 3: carry toward the other table (ref :290-293)
        stage3 = 2.0 + 1.0 - jnp.tanh(jnp.abs(q[self._torso] - 1.4) / 5.0)
        reward = jnp.where(info["box_grasped"], stage3, reward)
        # stage 4: release, arms back up (ref :295-301)
        stage4 = (
            3.0
            + (1.0 - jnp.tanh(jnp.abs(q[self._lsp] - 1.25))) / 2
            + (1.0 - jnp.tanh(jnp.abs(q[self._rsp] + 1.25))) / 2
        )
        reward = jnp.where(info["box_at_correct_table_xy"], stage4, reward)
        return jnp.where(info["success"], 5.0, reward)

    def compute_normalized_dense_reward(self, state, action, info, ctx):
        return self.compute_dense_reward(state, action, info, ctx) / 5.0
