"""FoldSuitcase-v1 — the reference fork's flagship task addition.

Parity target: ``mani_skill/envs/tasks/tabletop/fold_suitcase.py`` — an
articulated container (suitcase / laptop / box lid) starts fully open on
the table and the robot folds the lid shut. Success = lid joint qpos at or
below ``qmin + max_close_frac*(qmax-qmin)`` (fold_suitcase.py:1052-1054,
max_close_frac=0.25) with the lid link static (:1102-1113). Obs extras and
staged reach/close reward mirror :1119-1146.

The reference samples PartNet-Mobility meshes (suitcase/box/laptop id
lists); here the suitcase is a programmatic primitive articulation (base
shell + revolute lid over a back hinge) built with ArticulationBuilder —
same contract, no mesh assets (cf. OpenCabinetDrawer's primitive cabinet).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...kinematics.articulation import ArticulationBuilder
from ...math.rotations import quat_apply
from ...physics.model import SceneSpecBuilder, box_geom
from ..base_env import BaseEnv, TaskContext
from ..registration import register_env
from ..scene_builders import TableSceneBuilder


@register_env("FoldSuitcase-v1", max_episode_steps=100)
class FoldSuitcaseEnv(BaseEnv):
    SUPPORTED_ROBOTS = ["panda", "panda_wristcam"]
    DEFAULT_ROBOT = "panda_wristcam"

    max_close_frac = 0.25  # reference :95
    base_half = (0.13, 0.09, 0.015)
    lid_half = (0.13, 0.09, 0.008)
    lid_qmax = 2.2  # rad past vertical; reference laptop_135-ish opening
    # base center on the table: close enough that the open lid's FAR face
    # (the only face whose contact produces a closing torque — pressing the
    # near face only opens the hinge further) is inside the panda's ~0.85 m
    # envelope, matching the reference layout's reachable lid rim
    # (reference fold_suitcase.py:341-405 waypoints grasp the rim directly)
    suitcase_x = -0.10

    def _load_agent(self, builder: SceneSpecBuilder):
        self.table_scene = TableSceneBuilder(self)
        pose, qpos = self.table_scene.robot_pose_and_qpos(self.robot_uids)
        self.agent.install(builder, pose, init_qpos=qpos)

    def _load_scene(self, builder: SceneSpecBuilder):
        self.table_scene.build(builder)
        bh, lh = self.base_half, self.lid_half
        hinge_x = self.suitcase_x + bh[0]
        hinge_z = 2 * bh[2]
        ab = ArticulationBuilder("suitcase")
        m = 0.4
        inertia = (m / 3.0) * np.diag(
            [lh[1] ** 2 + lh[2] ** 2, lh[0] ** 2 + lh[2] ** 2,
             lh[0] ** 2 + lh[1] ** 2])
        # lid: hinged at the back (+x) edge; axis +y so q>0 swings the lid
        # up and over to the +x side (away from the robot). q=0 closed.
        lid = ab.add_revolute_link(
            "lid", parent=None, axis=(0.0, 1.0, 0.0),
            limits=(0.0, self.lid_qmax),
            joint_pose=((hinge_x, 0.0, hinge_z), (1, 0, 0, 0)),
            mass=m, com=(-lh[0], 0.0, lh[2]), inertia=inertia,
            damping=0.3, friction=0.5,
        )
        ab.add_geom(
            lid, box_geom(lh, offset_p=(-lh[0], 0.0, lh[2]), friction=0.8))
        # base shell on the table
        ab.add_base_geom(
            box_geom(bh, offset_p=(self.suitcase_x, 0.0, bh[2]),
                     friction=0.8))
        builder.add_articulation(
            ab, np.array([0, 0, 0, 1, 0, 0, 0], np.float32), gravity=True)
        builder.exclude_pair("suitcase:lid", "suitcase:base")
        builder.exclude_groups(["suitcase:*"], ["ground"])

    def _post_build(self):
        self._lid_body = int(self.model.art_dof_index["suitcase"][0])
        # reference :1052-1054: qmin + frac * (qmax - qmin), qmin = 0
        self.target_qpos = self.max_close_frac * self.lid_qmax

    def _initialize_episode(self, state, key):
        i = self._lid_body
        q0 = jax.random.uniform(key, (), minval=self.lid_qmax - 0.35,
                                maxval=self.lid_qmax - 0.05)
        sim = state.sim.replace(
            qpos=state.sim.qpos.at[i].set(q0),
            qvel=state.sim.qvel.at[i].set(0.0),
        )
        return state.replace(sim=sim)

    def _lid_tip_pos(self, ctx: TaskContext):
        """World position of the lid's free edge (the reference's sampled
        lid_link_positions reach target, :1056-1065)."""
        b = self._lid_body
        off = jnp.array([-2.0 * self.lid_half[0], 0.0, self.lid_half[2]])
        return ctx.body_pos[b] + quat_apply(ctx.body_quat[b], off)

    def evaluate(self, state, ctx):
        q = state.sim.qpos[self._lid_body]
        qd = state.sim.qvel[self._lid_body]
        close_enough = q <= self.target_qpos
        # reference link_is_static: |w| <= 1, |v| <= 0.1; hinge rate bounds
        # both (lever arm < 0.27 m)
        static = jnp.abs(qd) <= 0.37
        return dict(
            success=close_enough & static,
            close_enough=close_enough,
            lid_qpos=q,
        )

    def _get_obs_extra(self, state, ctx, info):
        obs = dict(tcp_pose=ctx.tcp_pose.raw)
        if "state" in self.obs_mode:
            lp = self._lid_tip_pos(ctx)
            obs.update(
                tcp_to_lid_pos=lp - ctx.tcp_pose.p,
                target_link_qpos=state.sim.qpos[self._lid_body][None],
                target_lid_pos=lp,
            )
        return obs

    def compute_dense_reward(self, state, action, info, ctx):
        # reference :1133-1146: reach + closing progress staging
        lp = self._lid_tip_pos(ctx)
        d = jnp.linalg.norm(ctx.tcp_pose.p - lp)
        reaching = 1.0 - jnp.tanh(5.0 * d)
        q = state.sim.qpos[self._lid_body]
        frac_left = jnp.clip(
            (q - self.target_qpos) / (self.lid_qmax - self.target_qpos),
            0.0, 1.0)
        close_reward = 2.0 * (1.0 - frac_left)
        reward = reaching + close_reward
        return jnp.where(info["success"], 5.0, reward)

    def compute_normalized_dense_reward(self, state, action, info, ctx):
        return self.compute_dense_reward(state, action, info, ctx) / 5.0


@register_env("FoldSuitcaseModels-v1", max_episode_steps=100)
class FoldSuitcaseModelsEnv(FoldSuitcaseEnv):
    """Per-env MODEL VARIETY (the reference's PartNet model sampling,
    fold_suitcase.py:57 suitcase/box/laptop id lists): each sub-env holds a
    differently-proportioned container — lid/base dims AND their in-body
    offsets are SimState (geom_size + geom_pos), so the 4-model table
    selects per env with zero recompiles. The hinge line stays fixed in
    space; per-model base/lid extend from it. Per-model close fraction,
    like the reference's per-model joint targets (:1052-1054)."""

    # (name, base_half, lid_half, close_frac, open_range)
    MODELS = [
        ("suitcase", (0.13, 0.09, 0.015), (0.13, 0.09, 0.008), 0.25,
         (1.85, 2.15)),
        ("laptop", (0.15, 0.11, 0.008), (0.15, 0.11, 0.005), 0.15,
         (1.7, 2.0)),
        ("small_box", (0.09, 0.07, 0.02), (0.09, 0.07, 0.01), 0.3,
         (1.9, 2.15)),
        ("deep_case", (0.11, 0.08, 0.035), (0.11, 0.08, 0.008), 0.25,
         (1.8, 2.1)),
    ]

    def _post_build(self):
        super()._post_build()
        self._lid_geom = self.model.geom_indices("suitcase:lid")[0]
        self._base_geom = self.model.geom_indices("suitcase:base")[0]
        self._hinge_x = self.suitcase_x + self.base_half[0]
        self._bh_t = jnp.asarray([m[1] for m in self.MODELS])  # (M, 3)
        self._lh_t = jnp.asarray([m[2] for m in self.MODELS])
        self._frac_t = jnp.asarray([m[3] for m in self.MODELS])
        self._open_t = jnp.asarray([m[4] for m in self.MODELS])

    def _default_extras(self):
        ex = super()._default_extras()
        ex["model_id"] = jnp.zeros((), jnp.int32)
        ex["target_qpos"] = jnp.asarray(self.target_qpos)
        return ex

    def _initialize_episode(self, state, key):
        km, kq = jax.random.split(jax.random.fold_in(key, 7))
        mid = jax.random.randint(km, (), 0, len(self.MODELS))
        bh = self._bh_t[mid]
        lh = self._lh_t[mid]
        lo, hi = self._open_t[mid, 0], self._open_t[mid, 1]
        q0 = jax.random.uniform(kq, (), minval=lo, maxval=hi)
        i = self._lid_body
        hx = self._hinge_x
        sim = state.sim.replace(
            qpos=state.sim.qpos.at[i].set(q0),
            qvel=state.sim.qvel.at[i].set(0.0),
        )
        gs = sim.geom_size
        gp = sim.geom_pos
        gs = gs.at[self._lid_geom].set(lh)
        gs = gs.at[self._base_geom].set(bh)
        gp = gp.at[self._lid_geom].set(
            jnp.stack([-lh[0], jnp.asarray(0.0), lh[2]])
        )
        # base extends backward from the fixed hinge line
        gp = gp.at[self._base_geom].set(
            jnp.stack([hx - bh[0], jnp.asarray(0.0), bh[2]])
        )
        sim = sim.replace(geom_size=gs, geom_pos=gp)
        extras = dict(state.extras)
        extras["model_id"] = mid
        extras["target_qpos"] = self._frac_t[mid] * self.lid_qmax
        return state.replace(sim=sim, extras=extras)

    def _lid_tip_pos(self, ctx):
        b = self._lid_body
        lh = ctx.state.sim.geom_size[self._lid_geom]
        off = jnp.stack([-2.0 * lh[0], jnp.asarray(0.0), lh[2]])
        return ctx.body_pos[b] + quat_apply(ctx.body_quat[b], off)

    def evaluate(self, state, ctx):
        q = state.sim.qpos[self._lid_body]
        qd = state.sim.qvel[self._lid_body]
        close_enough = q <= state.extras["target_qpos"]
        static = jnp.abs(qd) <= 0.37
        return dict(
            success=close_enough & static,
            close_enough=close_enough,
            lid_qpos=q,
            model_id=state.extras["model_id"],
        )

    def compute_dense_reward(self, state, action, info, ctx):
        lp = self._lid_tip_pos(ctx)
        d = jnp.linalg.norm(ctx.tcp_pose.p - lp)
        reaching = 1.0 - jnp.tanh(5.0 * d)
        q = state.sim.qpos[self._lid_body]
        tq = state.extras["target_qpos"]
        frac_left = jnp.clip((q - tq) / (self.lid_qmax - tq), 0.0, 1.0)
        reward = reaching + 2.0 * (1.0 - frac_left)
        return jnp.where(info["success"], 5.0, reward)
