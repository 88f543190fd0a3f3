"""Articulated-object tasks: OpenCabinetDrawer-v1, TurnFaucet-v1.

First consumers of multi-articulation scenes (kinematic-forest merge,
physics/model.py ``add_articulation``): an articulated OBJECT shares the
robot's monolithic contact solve as extra passive dofs.

Parity targets:
  * OpenCabinetDrawer-v1 — reference
    ``mani_skill/envs/tasks/mobile_manipulation/open_cabinet_drawer.py``
    (Fetch; success = drawer >= min_open_frac of travel and link static,
    open_cabinet_drawer.py:307-321; staged reach/open reward :336-352).
    The reference samples PartNet-Mobility cabinet meshes; here the cabinet
    is a programmatic primitive articulation (carcass + one drawer) — same
    contract, no mesh assets.
  * TurnFaucet-v1 — reference
    ``mani_skill/envs/tasks/tabletop/turn_faucet.py`` (Panda; success =
    handle hinge rotated past a target angle).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...kinematics.articulation import ArticulationBuilder
from ...math.rotations import quat_apply
from ...physics.model import SceneSpecBuilder, box_geom, plane_geom
from ..base_env import BaseEnv, TaskContext
from ..registration import register_env
from ..scene_builders import TableSceneBuilder


@register_env("OpenCabinetDrawer-v1", max_episode_steps=100)
class OpenCabinetDrawerEnv(BaseEnv):
    """Pull the cabinet drawer out past ``min_open_frac`` of its travel."""

    SUPPORTED_ROBOTS = ["fetch", "panda"]
    DEFAULT_ROBOT = "fetch"

    min_open_frac = 0.75
    drawer_travel = 0.22
    drawer_z = 0.5

    def _load_agent(self, builder: SceneSpecBuilder):
        if self.robot_uids == "fetch":
            pose = np.array([-1.05, 0, 0.02, 1, 0, 0, 0], np.float32)
            self.agent.install(builder, pose)
        else:
            pose = np.array([-0.85, 0, 0.0, 1, 0, 0, 0], np.float32)
            self.agent.install(builder, pose)

    def _load_scene(self, builder: SceneSpecBuilder):
        builder.add_static_body(
            "ground", np.array([0, 0, 0, 1, 0, 0, 0], np.float32),
            [plane_geom(friction=0.5)],
        )
        z = self.drawer_z
        ab = ArticulationBuilder("cabinet")
        drawer = ab.add_prismatic_link(
            "drawer", parent=None, axis=(-1.0, 0.0, 0.0),
            limits=(0.0, self.drawer_travel),
            joint_pose=((0.0, 0.0, z), (1, 0, 0, 0)),
            mass=1.5, damping=5.0, friction=2.0,
        )
        # tray + handle bar on the front (-x) face
        ab.add_geom(drawer, box_geom([0.12, 0.16, 0.055], friction=0.6))
        ab.add_geom(
            drawer,
            box_geom([0.012, 0.05, 0.012], offset_p=(-0.16, 0.0, 0.0),
                     friction=1.0),
        )
        # carcass: top/bottom/left/right/back walls around the drawer cavity
        w = 0.02
        for (off, half) in [
            ((0.0, 0.0, 0.075 + w / 2), (0.14, 0.20, w / 2)),   # top
            ((0.0, 0.0, -0.075 - w / 2), (0.14, 0.20, w / 2)),  # bottom
            ((0.0, 0.19 + w / 2, 0.0), (0.14, w / 2, 0.075)),   # left
            ((0.0, -0.19 - w / 2, 0.0), (0.14, w / 2, 0.075)),  # right
            ((0.14 + w / 2, 0.0, 0.0), (w / 2, 0.20, 0.095)),   # back
        ]:
            ab.add_base_geom(
                box_geom(half, offset_p=(off[0], off[1], off[2] + z),
                         friction=0.5)
            )
        builder.add_articulation(ab, np.array([0, 0, 0, 1, 0, 0, 0]))
        # the prismatic joint already constrains drawer/carcass relative
        # motion; candidate contacts between them only churn the solver
        builder.exclude_pair("cabinet:drawer", "cabinet:base")
        builder.exclude_groups(["cabinet:*"], ["ground"])

    def _post_build(self):
        self._drawer_body = int(self.model.art_dof_index["cabinet"][0])
        self.target_qpos = self.min_open_frac * self.drawer_travel

    def _initialize_episode(self, state, key):
        # drawer starts closed; small robot base yaw/pos noise comes from the
        # agent keyframe noise in BaseEnv
        i = self._drawer_body
        sim = state.sim.replace(
            qpos=state.sim.qpos.at[i].set(0.0),
            qvel=state.sim.qvel.at[i].set(0.0),
        )
        return state.replace(sim=sim)

    def _handle_pos(self, ctx: TaskContext):
        b = self._drawer_body
        off = jnp.array([-0.172, 0.0, 0.0])
        return ctx.body_pos[b] + quat_apply(ctx.body_quat[b], off)

    def evaluate(self, state, ctx):
        q = state.sim.qpos[self._drawer_body]
        qd = state.sim.qvel[self._drawer_body]
        open_enough = q >= self.target_qpos
        static = jnp.abs(qd) <= 0.1
        return dict(
            success=open_enough & static,
            open_enough=open_enough,
            open_frac=q / self.drawer_travel,
        )

    def _get_obs_extra(self, state, ctx, info):
        obs = dict(tcp_pose=ctx.tcp_pose.raw)
        if "state" in self.obs_mode:
            hp = self._handle_pos(ctx)
            obs.update(
                tcp_to_handle_pos=hp - ctx.tcp_pose.p,
                target_link_qpos=state.sim.qpos[self._drawer_body][None],
                target_handle_pos=hp,
            )
        return obs

    def compute_dense_reward(self, state, action, info, ctx):
        # reference open_cabinet_drawer.py:336-352 staging
        hp = self._handle_pos(ctx)
        d = jnp.linalg.norm(ctx.tcp_pose.p - hp)
        reaching = 1.0 - jnp.tanh(5.0 * d)
        q = state.sim.qpos[self._drawer_body]
        frac_left = (self.target_qpos - q) / self.target_qpos
        open_reward = 2.0 * (1.0 - frac_left)
        reaching = jnp.where(frac_left < 0.999, 2.0, reaching)
        open_reward = jnp.where(info["open_enough"], 3.0, open_reward)
        reward = reaching + open_reward
        return jnp.where(info["success"], 5.0, reward)

    def compute_normalized_dense_reward(self, state, action, info, ctx):
        return self.compute_dense_reward(state, action, info, ctx) / 5.0


@register_env("TurnFaucet-v1", max_episode_steps=100)
class TurnFaucetEnv(BaseEnv):
    """Rotate the faucet handle past the target angle (reference
    ``mani_skill/envs/tasks/tabletop/turn_faucet.py``: success when the
    target hinge moves ``target_angle_diff`` past its initial angle)."""

    SUPPORTED_ROBOTS = ["panda", "panda_wristcam"]
    DEFAULT_ROBOT = "panda"

    target_angle_diff = np.pi / 4
    handle_len = 0.08
    column_h = 0.10

    def _load_agent(self, builder: SceneSpecBuilder):
        self.table_scene = TableSceneBuilder(self)
        pose, qpos = self.table_scene.robot_pose_and_qpos(self.robot_uids)
        self.agent.install(builder, pose, init_qpos=qpos)

    def _load_scene(self, builder: SceneSpecBuilder):
        self.table_scene.build(builder)
        ab = ArticulationBuilder("faucet")
        handle = ab.add_revolute_link(
            "handle", parent=None, axis=(0.0, 0.0, 1.0),
            limits=(-2.4, 2.4),
            joint_pose=((0.0, 0.0, self.column_h), (1, 0, 0, 0)),
            mass=0.3, damping=0.4, friction=0.25,
        )
        # lever arm extending +x from the hinge
        ab.add_geom(
            handle,
            box_geom([self.handle_len / 2, 0.012, 0.012],
                     offset_p=(self.handle_len / 2 + 0.02, 0.0, 0.0),
                     friction=1.0),
        )
        # faucet column (static base)
        ab.add_base_geom(
            box_geom([0.025, 0.025, self.column_h / 2],
                     offset_p=(0.0, 0.0, self.column_h / 2), friction=0.5)
        )
        builder.add_articulation(
            ab, np.array([0.0, 0.0, 0.0, 1, 0, 0, 0]), gravity=True
        )
        builder.exclude_pair("faucet:handle", "faucet:base")
        builder.exclude_groups(["faucet:*"], ["table", "ground"])

    def _post_build(self):
        self._handle_body = int(self.model.art_dof_index["faucet"][0])

    def _initialize_episode(self, state, key):
        i = self._handle_body
        q0 = jax.random.uniform(key, (), minval=-0.3, maxval=0.3)
        sim = state.sim.replace(
            qpos=state.sim.qpos.at[i].set(q0),
            qvel=state.sim.qvel.at[i].set(0.0),
        )
        extras = dict(state.extras)
        extras["init_angle"] = q0
        extras["target_angle"] = q0 + self.target_angle_diff
        return state.replace(sim=sim, extras=extras)

    def _default_extras(self):
        return dict(
            init_angle=jnp.zeros(()), target_angle=jnp.zeros(())
        )

    def _tip_pos(self, ctx: TaskContext):
        b = self._handle_body
        off = jnp.array([self.handle_len + 0.02, 0.0, 0.0])
        return ctx.body_pos[b] + quat_apply(ctx.body_quat[b], off)

    def evaluate(self, state, ctx):
        q = state.sim.qpos[self._handle_body]
        return dict(success=q >= state.extras["target_angle"])

    def _get_obs_extra(self, state, ctx, info):
        obs = dict(tcp_pose=ctx.tcp_pose.raw)
        if "state" in self.obs_mode:
            obs.update(
                handle_qpos=state.sim.qpos[self._handle_body][None],
                target_angle=state.extras["target_angle"][None],
                tip_pos=self._tip_pos(ctx),
            )
        return obs

    def compute_dense_reward(self, state, action, info, ctx):
        tip = self._tip_pos(ctx)
        d = jnp.linalg.norm(ctx.tcp_pose.p - tip)
        reaching = 1.0 - jnp.tanh(5.0 * d)
        q = state.sim.qpos[self._handle_body]
        prog = jnp.clip(
            (q - state.extras["init_angle"])
            / (state.extras["target_angle"] - state.extras["init_angle"]),
            0.0, 1.0,
        )
        reward = reaching + 2.0 * prog
        return jnp.where(info["success"], 5.0, reward)

    def compute_normalized_dense_reward(self, state, action, info, ctx):
        return self.compute_dense_reward(state, action, info, ctx) / 5.0


@register_env("OpenCabinetDoor-v1", max_episode_steps=100)
class OpenCabinetDoorEnv(OpenCabinetDrawerEnv):
    """Swing the cabinet door open past ``min_open_frac`` of its travel
    (reference open_cabinet_drawer.py:361 ``OpenCabinetDoorEnv`` — same
    contract with a revolute handle joint)."""

    door_travel = np.pi / 2

    def _load_scene(self, builder: SceneSpecBuilder):
        builder.add_static_body(
            "ground", np.array([0, 0, 0, 1, 0, 0, 0], np.float32),
            [plane_geom(friction=0.5)],
        )
        z = self.drawer_z
        ab = ArticulationBuilder("cabinet")
        door = ab.add_revolute_link(
            "door", parent=None, axis=(0.0, 0.0, 1.0),
            limits=(0.0, self.door_travel),
            # hinge on the left edge of the front face
            joint_pose=((-0.14, 0.19, z), (1, 0, 0, 0)),
            mass=1.2, damping=1.5, friction=0.8,
        )
        # door panel extends from the hinge toward -y; handle bar near the
        # free edge
        ab.add_geom(door, box_geom(
            [0.01, 0.18, 0.095], offset_p=(-0.01, -0.19, 0.0), friction=0.6,
        ))
        ab.add_geom(door, box_geom(
            [0.012, 0.012, 0.05], offset_p=(-0.035, -0.33, 0.0),
            friction=1.0,
        ))
        w = 0.02
        for (off, half) in [
            ((0.0, 0.0, 0.095 + w / 2), (0.14, 0.20, w / 2)),   # top
            ((0.0, 0.0, -0.095 - w / 2), (0.14, 0.20, w / 2)),  # bottom
            ((0.0, 0.21 + w / 2, 0.0), (0.14, w / 2, 0.095)),   # left
            ((0.0, -0.21 - w / 2, 0.0), (0.14, w / 2, 0.095)),  # right
            ((0.14 + w / 2, 0.0, 0.0), (w / 2, 0.22, 0.115)),   # back
        ]:
            ab.add_base_geom(
                box_geom(half, offset_p=(off[0], off[1], off[2] + z),
                         friction=0.5)
            )
        builder.add_articulation(ab, np.array([0, 0, 0, 1, 0, 0, 0]))
        builder.exclude_pair("cabinet:door", "cabinet:base")
        builder.exclude_groups(["cabinet:*"], ["ground"])

    def _post_build(self):
        self._drawer_body = int(self.model.art_dof_index["cabinet"][0])
        self.target_qpos = self.min_open_frac * self.door_travel

    @property
    def drawer_travel(self):  # reward/eval reuse (open_frac denominator)
        return self.door_travel

    def _handle_pos(self, ctx):
        b = self._drawer_body
        off = jnp.array([-0.047, -0.33, 0.0])
        return ctx.body_pos[b] + quat_apply(ctx.body_quat[b], off)


@register_env("OpenCabinetDrawerModels-v1", max_episode_steps=100)
class OpenCabinetDrawerModelsEnv(OpenCabinetDrawerEnv):
    """Per-env cabinet MODEL VARIETY + per-env target-drawer selection.

    The TPU analogue of the reference's per-env PartNet-Mobility cabinet
    sampling (``open_cabinet_drawer.py:64-137`` samples a cabinet model per
    sub-env and merges the per-env handle links via ``Articulation.merge`` +
    ``max_dof`` padding, ``utils/structs/articulation.py:220,305``). One
    padded TWO-drawer articulation is compiled once; a model table writes
    per-env drawer proportions and handle offsets through the heterogeneous
    ``SimState.geom_size``/``geom_pos`` channels, and every episode samples
    WHICH drawer is the task target — per-env link selection with static
    shapes and zero recompiles.
    """

    # cavity centers of the two drawers
    drawer_zs = (0.60, 0.40)

    # (name, tray_half, handle_y) — per-model drawer proportions; handle
    # bar sits on the front face at x = -(tray_x + 0.04)
    MODELS = [
        ("wide", (0.12, 0.16, 0.055), 0.0),
        ("narrow", (0.12, 0.10, 0.055), 0.0),
        ("shallow", (0.09, 0.14, 0.040), 0.05),
        ("deep", (0.14, 0.12, 0.050), -0.05),
    ]

    def _load_scene(self, builder: SceneSpecBuilder):
        builder.add_static_body(
            "ground", np.array([0, 0, 0, 1, 0, 0, 0], np.float32),
            [plane_geom(friction=0.5)],
        )
        ab = ArticulationBuilder("cabinet")
        for k, z in enumerate(self.drawer_zs):
            drawer = ab.add_prismatic_link(
                f"drawer{k}", parent=None, axis=(-1.0, 0.0, 0.0),
                limits=(0.0, self.drawer_travel),
                joint_pose=((0.0, 0.0, z), (1, 0, 0, 0)),
                mass=1.5, damping=5.0, friction=2.0,
            )
            ab.add_geom(drawer, box_geom([0.12, 0.16, 0.055], friction=0.6))
            ab.add_geom(
                drawer,
                box_geom([0.012, 0.05, 0.012], offset_p=(-0.16, 0.0, 0.0),
                         friction=1.0),
            )
        # carcass around both cavities: cavity k spans drawer_zs[k] +- 0.075
        w = 0.02
        z_top = self.drawer_zs[0] + 0.075
        z_mid = 0.5 * (self.drawer_zs[0] + self.drawer_zs[1])
        z_bot = self.drawer_zs[1] - 0.075
        side_c = 0.5 * (z_top + z_bot)
        side_h = 0.5 * (z_top - z_bot) + w
        for (off, half) in [
            ((0.0, 0.0, z_top + w / 2), (0.14, 0.20, w / 2)),   # top
            ((0.0, 0.0, z_mid), (0.14, 0.20, 0.025)),           # shelf
            ((0.0, 0.0, z_bot - w / 2), (0.14, 0.20, w / 2)),   # bottom
            ((0.0, 0.19 + w / 2, side_c), (0.14, w / 2, side_h)),   # left
            ((0.0, -0.19 - w / 2, side_c), (0.14, w / 2, side_h)),  # right
            ((0.14 + w / 2, 0.0, side_c), (w / 2, 0.20, side_h)),   # back
        ]:
            ab.add_base_geom(box_geom(half, offset_p=off, friction=0.5))
        builder.add_articulation(ab, np.array([0, 0, 0, 1, 0, 0, 0]))
        for k in range(2):
            builder.exclude_pair(f"cabinet:drawer{k}", "cabinet:base")
        builder.exclude_pair("cabinet:drawer0", "cabinet:drawer1")
        builder.exclude_groups(["cabinet:*"], ["ground"])

    def _post_build(self):
        self._dofs = [int(d) for d in self.model.art_dof_index["cabinet"]]
        self.target_qpos = self.min_open_frac * self.drawer_travel
        self._tray_geoms = [
            self.model.geom_indices(f"cabinet:drawer{k}")[0]
            for k in range(2)
        ]
        self._handle_geoms = [
            self.model.geom_indices(f"cabinet:drawer{k}")[1]
            for k in range(2)
        ]
        self._tray_t = jnp.asarray([m[1] for m in self.MODELS])  # (M, 3)
        self._hy_t = jnp.asarray([m[2] for m in self.MODELS])    # (M,)

    def _default_extras(self):
        return dict(target_link=jnp.zeros((), jnp.int32),
                    model_id=jnp.zeros((), jnp.int32))

    def _initialize_episode(self, state, key):
        km, kt = jax.random.split(jax.random.fold_in(key, 11))
        mid = jax.random.randint(km, (), 0, len(self.MODELS))
        target = jax.random.randint(kt, (), 0, 2)
        tray = self._tray_t[mid]
        hy = self._hy_t[mid]
        handle_off = jnp.stack(
            [-(tray[0] + 0.04), hy, jnp.asarray(0.0)])
        gs, gp = state.sim.geom_size, state.sim.geom_pos
        for k in range(2):
            gs = gs.at[self._tray_geoms[k]].set(tray)
            gp = gp.at[self._handle_geoms[k]].set(handle_off)
        qpos = state.sim.qpos
        qvel = state.sim.qvel
        for d in self._dofs:
            qpos = qpos.at[d].set(0.0)
            qvel = qvel.at[d].set(0.0)
        sim = state.sim.replace(qpos=qpos, qvel=qvel, geom_size=gs,
                                geom_pos=gp)
        extras = dict(state.extras)
        extras["model_id"] = mid
        extras["target_link"] = target
        return state.replace(sim=sim, extras=extras)

    def _target_dof(self, state):
        t = state.extras["target_link"]
        d0, d1 = self._dofs
        return jnp.where(t == 0, d0, d1)

    def _handle_pos(self, ctx: TaskContext):
        # per-env: handle offset lives in geom_pos; pick the target drawer
        state = ctx.state
        t = state.extras["target_link"]
        b = jnp.where(t == 0, self._dofs[0], self._dofs[1])
        g = jnp.where(t == 0, self._handle_geoms[0], self._handle_geoms[1])
        off = state.sim.geom_pos[g] - jnp.array([0.012, 0.0, 0.0])
        return ctx.body_pos[b] + quat_apply(ctx.body_quat[b], off)

    def evaluate(self, state, ctx):
        d = self._target_dof(state)
        q = state.sim.qpos[d]
        qd = state.sim.qvel[d]
        open_enough = q >= self.target_qpos
        static = jnp.abs(qd) <= 0.1
        return dict(
            success=open_enough & static,
            open_enough=open_enough,
            open_frac=q / self.drawer_travel,
            model_id=state.extras["model_id"],
            target_link=state.extras["target_link"],
        )

    def _get_obs_extra(self, state, ctx, info):
        obs = dict(tcp_pose=ctx.tcp_pose.raw)
        if "state" in self.obs_mode:
            hp = self._handle_pos(ctx)
            d = self._target_dof(state)
            obs.update(
                tcp_to_handle_pos=hp - ctx.tcp_pose.p,
                target_link_qpos=state.sim.qpos[d][None],
                target_handle_pos=hp,
                target_onehot=jax.nn.one_hot(
                    state.extras["target_link"], 2),
            )
        return obs

    def compute_dense_reward(self, state, action, info, ctx):
        hp = self._handle_pos(ctx)
        dist = jnp.linalg.norm(ctx.tcp_pose.p - hp)
        reaching = 1.0 - jnp.tanh(5.0 * dist)
        d = self._target_dof(state)
        q = state.sim.qpos[d]
        frac_left = (self.target_qpos - q) / self.target_qpos
        open_reward = 2.0 * (1.0 - frac_left)
        reaching = jnp.where(frac_left < 0.999, 2.0, reaching)
        open_reward = jnp.where(info["open_enough"], 3.0, open_reward)
        reward = reaching + open_reward
        return jnp.where(info["success"], 5.0, reward)
