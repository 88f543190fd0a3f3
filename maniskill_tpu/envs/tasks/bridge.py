"""BridgeData v2 digital-twin evaluation family (real2sim).

TPU-native analogue of the reference bridge-dataset eval envs
(``mani_skill/envs/tasks/digital_twins/bridge_dataset_eval/base_env.py``
and ``put_on_in_scene.py``): a WidowX-250S fixed at the measured real-rig
pose over a flat-table (or sink) digital-twin scene, source/target objects
spawned on the reference's discrete position/orientation grids, the
reference success logic (bbox-overlap xy/z flags + src-tgt contact +
consecutive-grasp tracking), the real evaluation camera mounted on the
robot base, greenscreen compositing of background pixels over the
real-scene image, and ``get_language_instruction`` for VLA evaluation.

Deviations (documented): the reference's object/scene meshes and real
inpainting photos are download-only assets (``bridge_v2_real2sim``); here
objects are procedural convex hulls of matching dimensions and the overlay
is a procedurally generated stand-in image wired through the same
compositing path (swap in the real PNG via ``rgb_overlay_images``).
Rewards: the reference exposes reward_mode="none" only; a shaped dense
reward is additionally provided so the MPC/RL stack runs on these scenes.
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ...physics.hulls import make_hull, _cylinder_pts, _frustum_pts
from ...physics.model import SceneSpecBuilder, box_geom, plane_geom
from ..base_env import BaseEnv, EnvState, TaskContext
from ..registration import register_env

TABLE_Z = 0.87  # real bridge rig table height; world tabletop sits at z=0


def _bridge_objects() -> Dict[str, object]:
    """Procedural hull stand-ins sized like the bridge real2sim models."""
    rng = {}
    # carrot: tapered spindle ~11 cm long, ~3.5 cm max diameter, axis +x
    rng["carrot"] = make_hull("carrot", np.concatenate([
        _frustum_pts(0.0175, 0.010, 0.055, 8) @ _ROT_YX,
        (_frustum_pts(0.0145, 0.0175, 0.055, 8)
         * np.array([1, 1, -1])) @ _ROT_YX,
    ]))
    # plate: shallow 16-gon disc, 17 cm across, 1.6 cm tall
    rng["plate"] = make_hull("plate", _cylinder_pts(0.085, 0.016, 16))
    # spoon: flat elongated utensil ~13 cm x 4 cm x 1.4 cm, axis +x
    spoon_pts = np.concatenate([
        _cylinder_pts(0.019, 0.012, 8) + np.array([0.04, 0, 0]),   # bowl
        np.array([[x, y, z] for x in (-0.065, 0.02)
                  for y in (-0.008, 0.008) for z in (-0.006, 0.006)]),
    ])
    rng["spoon"] = make_hull("spoon", spoon_pts)
    # eggplant: fat spindle ~12 cm long, 6 cm max diameter
    rng["eggplant"] = make_hull("eggplant", np.concatenate([
        _frustum_pts(0.030, 0.016, 0.060, 8) @ _ROT_YX,
        (_frustum_pts(0.024, 0.030, 0.060, 8)
         * np.array([1, 1, -1])) @ _ROT_YX,
    ]))
    return rng


# rotate a z-axis solid onto +x (hulls are point clouds: right-multiply)
_ROT_YX = np.array([[0.0, 0.0, -1.0], [0.0, 1.0, 0.0], [1.0, 0.0, 0.0]])


def _procedural_overlay(h: int = 128, w: int = 128) -> np.ndarray:
    """Deterministic stand-in for the real inpainting photo: warm table
    gradient below the horizon, grey wall above."""
    yy = np.linspace(0, 1, h)[:, None]
    xx = np.linspace(0, 1, w)[None, :]
    wall = np.stack([150 + 20 * xx, 148 + 18 * xx, 145 + 15 * xx], -1)
    table = np.stack(
        [170 - 40 * yy + 0 * xx, 140 - 35 * yy + 0 * xx,
         105 - 25 * yy + 0 * xx], -1
    )
    img = np.where(yy[..., None] < 0.45, wall, table)
    return np.clip(img, 0, 255).astype(np.uint8)


class BaseBridgeEnv(BaseEnv):
    """Flat-table bridge scene: WidowX at the measured rig pose, two
    objects (source, target) on discrete config grids."""

    SUPPORTED_ROBOTS = ["widowx250s_bridgedataset_flat_table", "widowx250s"]
    DEFAULT_ROBOT = "widowx250s_bridgedataset_flat_table"
    SIM_FREQ = 100
    CONTROL_FREQ = 5  # reference: SimConfig(sim_freq=500, control_freq=5)

    scene_setting = "flat_table"
    source_name = ""
    target_name = ""
    instruction = ""
    # success tuning (reference _evaluate kwargs)
    require_contact = True
    z_flag_required_offset = 0.02
    consecutive_grasp_needed = 5

    # filled by subclass __init__: (C, 2, 3) and (Q, 2, 4) config tables
    xyz_configs: np.ndarray = None
    quat_configs: np.ndarray = None

    def __init__(self, *args, **kwargs):
        self.rgb_overlay_images = {
            "3rd_view_camera": _procedural_overlay()
        }
        super().__init__(*args, **kwargs)

    # -- scene ---------------------------------------------------------
    def _default_sensor_configs(self):
        return []  # the eval camera rides the robot base (agent sensor)

    def _load_agent(self, builder: SceneSpecBuilder):
        # measured robot base pose on the rig (base_env.py:225-231), table
        # frame: world z=0 is the tabletop
        pose = np.array([0.147, 0.028, 0.0, 1, 0, 0, 0], np.float32)
        self.agent.install(
            builder, pose, init_qpos=self.agent.keyframes["rest"].qpos
        )

    def _load_scene(self, builder: SceneSpecBuilder):
        # tabletop digital twin: static slab top at z=0 + floor
        builder.add_static_body(
            "arena", np.array([0, 0, -TABLE_Z, 1, 0, 0, 0], np.float32),
            [plane_geom(friction=0.6)],
        )
        builder.add_static_body(
            "table", np.array([-0.1, 0, -0.02, 1, 0, 0, 0], np.float32),
            [box_geom([0.45, 0.6, 0.02], friction=0.6)],
        )
        self._load_objects(builder)

    def _load_objects(self, builder: SceneSpecBuilder):
        raise NotImplementedError

    def _post_build(self):
        self._is_grasping_src = self.agent.build_grasp_checker(
            self.model, self.source_name
        )
        from ...physics.engine import pair_force_signs
        from ...physics.model import BodyKind

        if self.require_contact:
            self._src_tgt_signs = jnp.asarray(pair_force_signs(
                self.model,
                (BodyKind.FREE, self.model.free_index[self.source_name]),
                (BodyKind.FREE, self.model.free_index[self.target_name]),
            ))

    # -- episode -------------------------------------------------------
    def _default_extras(self):
        ex = super()._default_extras()
        ex["consecutive_grasp"] = jnp.zeros((), jnp.int32)
        ex["is_src_obj_grasped"] = jnp.zeros((), bool)
        return ex

    def _src_tgt_rest_z(self):
        """(src_z, tgt_z) rest heights above the tabletop."""
        raise NotImplementedError

    def _set_obj_pose(self, sim, name, pose):
        idx = self.model.free_index[name]
        return sim.replace(
            free_pose=sim.free_pose.at[idx].set(pose),
            free_vel=sim.free_vel.at[idx].set(jnp.zeros(6)),
        )

    def _initialize_episode(self, state: EnvState, key) -> EnvState:
        kp, kq = jax.random.split(key)
        xyz_t = jnp.asarray(self.xyz_configs, jnp.float32)
        quat_t = jnp.asarray(self.quat_configs, jnp.float32)
        ci = jax.random.randint(kp, (), 0, xyz_t.shape[0])
        qi = jax.random.randint(kq, (), 0, quat_t.shape[0])
        src_z, tgt_z = self._src_tgt_rest_z()
        src_xy = xyz_t[ci, 0, :2]
        tgt_xy = xyz_t[ci, 1, :2]
        sim = state.sim
        sim = self._set_obj_pose(sim, self.source_name, jnp.concatenate(
            [src_xy, jnp.array([src_z]), quat_t[qi, 0]]))
        sim = self._set_obj_pose(sim, self.target_name, jnp.concatenate(
            [tgt_xy, jnp.array([tgt_z]), quat_t[qi, 1]]))
        extras = dict(state.extras)
        extras["consecutive_grasp"] = jnp.zeros((), jnp.int32)
        extras["is_src_obj_grasped"] = jnp.zeros((), bool)
        return state.replace(sim=sim, extras=extras)

    # -- evaluation (reference _evaluate, base_env.py:469-551) ---------
    def _half_bbox(self, which: str) -> np.ndarray:
        raise NotImplementedError

    def _update_extras(self, state: EnvState, ctx: TaskContext) -> EnvState:
        grasped = self._is_grasping_src(ctx.body_quat, ctx.contact_forces())
        cg = jnp.where(
            grasped, state.extras["consecutive_grasp"] + 1, 0
        ).astype(jnp.int32)
        extras = dict(state.extras)
        extras["consecutive_grasp"] = cg
        extras["is_src_obj_grasped"] = (
            state.extras["is_src_obj_grasped"] | grasped
        )
        return state.replace(extras=extras)

    def evaluate(self, state: EnvState, ctx: TaskContext):
        src_p = ctx.actor_pose(self.source_name).p
        tgt_p = ctx.actor_pose(self.target_name).p
        tgt_half = jnp.asarray(self._half_bbox("target"))
        src_half = jnp.asarray(self._half_bbox("source"))
        offset = src_p - tgt_p
        xy_flag = (
            jnp.linalg.norm(offset[..., :2])
            <= jnp.linalg.norm(tgt_half[:2]) + 0.003
        )
        z_flag = (offset[..., 2] > 0) & (
            offset[..., 2] - tgt_half[2] - src_half[2]
            <= self.z_flag_required_offset
        )
        src_on_target = xy_flag & z_flag
        if self.require_contact:
            net = self._src_tgt_signs @ ctx.contact_forces()
            src_on_target = src_on_target & (jnp.linalg.norm(net) > 0.05)
        grasped = state.extras["is_src_obj_grasped"]
        return dict(
            success=src_on_target,
            src_on_target=src_on_target,
            is_src_obj_grasped=grasped,
            consecutive_grasp=(
                state.extras["consecutive_grasp"]
                >= self.consecutive_grasp_needed
            ),
        )

    def get_language_instruction(self):
        return [self.instruction] * self.num_envs

    # -- extra capability beyond the reference (reward_mode="none") ----
    def _get_obs_extra(self, state: EnvState, ctx: TaskContext, info):
        obs = dict(tcp_pose=ctx.tcp_pose.raw)
        if self.obs_mode in ("state", "state_dict"):
            obs.update(
                src_pose=ctx.actor_pose(self.source_name).raw,
                tgt_pos=ctx.actor_pose(self.target_name).p,
            )
        return obs

    def compute_dense_reward(self, state, action, info, ctx: TaskContext):
        src_p = ctx.actor_pose(self.source_name).p
        tgt_p = ctx.actor_pose(self.target_name).p
        tcp_p = ctx.tcp_pose.p
        reach = 1.0 - jnp.tanh(5.0 * jnp.linalg.norm(src_p - tcp_p))
        grasped = self._is_grasping_src(ctx.body_quat, ctx.contact_forces())
        above = tgt_p + jnp.array([0.0, 0.0, 0.08])
        place = 1.0 - jnp.tanh(5.0 * jnp.linalg.norm(src_p - above))
        reward = reach + grasped * (1.0 + place)
        return jnp.where(info["success"], 5.0, reward)

    def compute_normalized_dense_reward(self, state, action, info, ctx):
        return self.compute_dense_reward(state, action, info, ctx) / 5.0


def _grid_xy(half_x: float, half_y: float,
             center=(-0.16, 0.00)) -> np.ndarray:
    g = np.array([[0, 0], [0, 1], [1, 0], [1, 1]]) * 2 - 1
    return g * np.array([half_x, half_y])[None] + np.asarray(center)[None]


def _pair_configs(grid: np.ndarray) -> np.ndarray:
    """All ordered (src, tgt) placements on distinct grid cells (C, 2, 2).
    Reference: put_on_in_scene.py:21-41."""
    out = []
    for i, a in enumerate(grid):
        for j, b in enumerate(grid):
            if i != j:
                out.append(np.stack([a, b]))
    return np.stack(out)


def _yaw_quat(yaw: float) -> np.ndarray:
    return np.array([np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)])


@register_env("PutCarrotOnPlateInScene-v1", max_episode_steps=60)
class PutCarrotOnPlateInScene(BaseBridgeEnv):
    """Reference: put_on_in_scene.py:12-67."""

    source_name = "carrot"
    target_name = "plate"
    instruction = "put carrot on plate"

    def __init__(self, *args, **kwargs):
        self._hulls = _bridge_objects()
        xy = _pair_configs(_grid_xy(0.075, 0.075))  # (C, 2, 2)
        z = np.zeros((len(xy), 2, 1))
        self.xyz_configs = np.concatenate([xy, z], axis=-1)
        self.quat_configs = np.stack([
            np.stack([_yaw_quat(np.pi), [1, 0, 0, 0]]),
            np.stack([_yaw_quat(-np.pi / 2), [1, 0, 0, 0]]),
        ]).astype(np.float32)
        super().__init__(*args, **kwargs)

    def _load_objects(self, builder):
        builder.add_free_hull("carrot", self._hulls["carrot"], density=600,
                              friction=0.5)
        builder.add_free_hull("plate", self._hulls["plate"], density=500,
                              friction=0.5)

    def _src_tgt_rest_z(self):
        return (float(self._hulls["carrot"].aabb_half[2]),
                float(self._hulls["plate"].aabb_half[2]))

    def _half_bbox(self, which):
        return (self._hulls["carrot"].aabb_half if which == "source"
                else self._hulls["plate"].aabb_half)


@register_env("PutSpoonOnTableClothInScene-v1", max_episode_steps=60)
class PutSpoonOnTableClothInScene(BaseBridgeEnv):
    """Reference: put_on_in_scene.py:211-260 (partial-on-target allowed,
    no contact-force requirement)."""

    source_name = "spoon"
    target_name = "towel"
    instruction = "put the spoon on the towel"
    require_contact = False
    towel_half = np.array([0.085, 0.085, 0.004], np.float32)

    def __init__(self, *args, **kwargs):
        self._hulls = _bridge_objects()
        xy = _pair_configs(_grid_xy(0.075, 0.075))
        z = np.zeros((len(xy), 2, 1))
        self.xyz_configs = np.concatenate([xy, z], axis=-1)
        self.quat_configs = np.stack([
            np.stack([[1, 0, 0, 0], [1, 0, 0, 0]]),
            np.stack([_yaw_quat(np.pi / 2), [1, 0, 0, 0]]),
        ]).astype(np.float32)
        super().__init__(*args, **kwargs)

    def _load_objects(self, builder):
        builder.add_free_hull("spoon", self._hulls["spoon"], density=800,
                              friction=0.5)
        # towel: thin soft sheet approximated as a low-density slab
        th = self.towel_half
        m = 8 * 60.0 * float(th[0] * th[1] * th[2])  # ~fabric density
        inertia = (m / 3.0) * np.diag([
            th[1] ** 2 + th[2] ** 2,
            th[0] ** 2 + th[2] ** 2,
            th[0] ** 2 + th[1] ** 2,
        ])
        builder.add_free_body("towel", m, inertia,
                              [box_geom(th, friction=0.8)])

    def _src_tgt_rest_z(self):
        return (float(self._hulls["spoon"].aabb_half[2]),
                float(self.towel_half[2]))

    def _half_bbox(self, which):
        return (self._hulls["spoon"].aabb_half if which == "source"
                else self.towel_half)


@register_env("StackGreenCubeOnYellowCubeBakedTexInScene-v1",
              max_episode_steps=60)
class StackGreenCubeOnYellowCubeInScene(BaseBridgeEnv):
    """Reference: put_on_in_scene.py:150-208 (3 cm baked-texture cubes,
    two grid spacings)."""

    source_name = "green_cube"
    target_name = "yellow_cube"
    instruction = "stack the green block on the yellow block"
    cube_half = 0.015

    def __init__(self, *args, **kwargs):
        cfgs = [
            np.concatenate(
                [_pair_configs(_grid_xy(h, h)),
                 np.zeros((12, 2, 1))], axis=-1)
            for h in (0.05, 0.1)
        ]
        self.xyz_configs = np.concatenate(cfgs)
        self.quat_configs = np.stack([
            np.stack([[1, 0, 0, 0], [1, 0, 0, 0]]),
        ]).astype(np.float32)
        super().__init__(*args, **kwargs)

    def _load_objects(self, builder):
        half = self.cube_half
        m = 1000.0 * (2 * half) ** 3
        inertia = (2.0 / 3.0) * m * half * half * np.eye(3)
        builder.add_free_body("green_cube", m, inertia,
                              [box_geom([half] * 3, friction=0.5)])
        builder.add_free_body("yellow_cube", m, inertia,
                              [box_geom([half] * 3, friction=0.5)])

    def _src_tgt_rest_z(self):
        return (self.cube_half, self.cube_half)

    def _half_bbox(self, which):
        return np.array([self.cube_half] * 3, np.float32)


@register_env("PutEggplantInBasketScene-v1", max_episode_steps=120)
class PutEggplantInBasketScene(BaseBridgeEnv):
    """Reference: put_on_in_scene.py:70-148 (sink setting; target is the
    invisible sink basin plane, no contact requirement, loose z flag)."""

    scene_setting = "sink"
    source_name = "eggplant"
    target_name = "basket_site"
    instruction = "put eggplant into yellow basket"
    require_contact = False
    z_flag_required_offset = 0.06
    basin_half = np.array([0.10, 0.11, 0.01], np.float32)

    def __init__(self, *args, **kwargs):
        self._hulls = _bridge_objects()
        xy_center = np.array([-0.105, 0.206])
        grid = []
        for x in np.linspace(-0.01, 0.01, 2):
            for y in np.linspace(-0.015, 0.015, 4):
                grid.append(np.array([x, y]) + xy_center)
        tgt = np.array([-0.125, 0.025])
        self.xyz_configs = np.stack([
            np.stack([np.append(g, 0.0), np.append(tgt, 0.0)])
            for g in grid
        ]).astype(np.float32)
        self.quat_configs = np.stack([
            np.stack([_yaw_quat(a), [1, 0, 0, 0]])
            for a in (-np.pi / 4, 0.0, np.pi / 4)
        ]).astype(np.float32)
        super().__init__(*args, **kwargs)

    def _load_scene(self, builder: SceneSpecBuilder):
        builder.add_static_body(
            "arena", np.array([0, 0, -TABLE_Z, 1, 0, 0, 0], np.float32),
            [plane_geom(friction=0.6)],
        )
        # counter with a sunken basin: slabs around the basin cutout
        bh = self.basin_half
        cx, cy = -0.125, 0.025
        builder.add_static_body(
            "counter", np.array([0, 0, 0, 1, 0, 0, 0], np.float32),
            [
                box_geom([0.45, 0.6, 0.02],
                         offset_p=[-0.1 - 0, 0, -0.02], friction=0.6,
                         collision=False),  # visual slab (basin area open)
                # basin floor, 6 cm below the counter top
                box_geom([bh[0], bh[1], 0.01],
                         offset_p=[cx, cy, -0.07], friction=0.6),
                # counter ring: four slabs surrounding the basin
                box_geom([0.45, (0.6 - (cy + bh[1])) / 2, 0.02],
                         offset_p=[-0.1, (cy + bh[1] + 0.6) / 2, -0.02],
                         friction=0.6),
                box_geom([0.45, (0.6 + (cy - bh[1])) / 2, 0.02],
                         offset_p=[-0.1, (cy - bh[1] - 0.6) / 2, -0.02],
                         friction=0.6),
                box_geom([(0.35 + (cx - bh[0])) / 2, bh[1], 0.02],
                         offset_p=[((cx - bh[0]) - 0.35) / 2, cy, -0.02],
                         friction=0.6),
                box_geom([(0.35 - (cx + bh[0])) / 2, bh[1], 0.02],
                         offset_p=[((cx + bh[0]) + 0.35) / 2, cy, -0.02],
                         friction=0.6),
            ],
        )
        self._load_objects(builder)

    def _load_objects(self, builder):
        builder.add_free_hull("eggplant", self._hulls["eggplant"],
                              density=400, friction=0.6)
        self.basket_site = builder.add_kinematic_body("basket_site")

    def _post_build(self):
        self._is_grasping_src = self.agent.build_grasp_checker(
            self.model, self.source_name
        )

    def _set_obj_pose(self, sim, name, pose):
        if name == "basket_site":
            # kinematic marker at the basin floor
            return sim.replace(
                kin_pose=sim.kin_pose.at[self.basket_site].set(
                    pose.at[2].set(-0.06)
                )
            )
        return super()._set_obj_pose(sim, name, pose)

    def evaluate(self, state: EnvState, ctx: TaskContext):
        # success: eggplant inside the basin footprint and below rim level
        src_p = ctx.actor_pose(self.source_name).p
        tgt_p = ctx.actor_pose("basket_site").p
        off = src_p - tgt_p
        xy_flag = (jnp.abs(off[..., 0]) <= self.basin_half[0]) & (
            jnp.abs(off[..., 1]) <= self.basin_half[1]
        )
        # below rim level: positive offset above the basin floor (reference
        # z_flag offset_z > 0) AND the eggplant body actually inside the
        # basin — its center no higher than one half-extent above the
        # counter-top plane (z=0), so a grasped eggplant hovering over the
        # basin does not count
        half_z = float(self._hulls["eggplant"].aabb_half[2])
        z_flag = (off[..., 2] > 0.0) & (src_p[..., 2] <= half_z + 0.005)
        grasped = state.extras["is_src_obj_grasped"]
        success = xy_flag & z_flag
        return dict(
            success=success,
            src_on_target=success,
            is_src_obj_grasped=grasped,
            consecutive_grasp=(
                state.extras["consecutive_grasp"]
                >= self.consecutive_grasp_needed
            ),
        )

    def _src_tgt_rest_z(self):
        return (float(self._hulls["eggplant"].aabb_half[2]), -0.06)

    def _half_bbox(self, which):
        return (self._hulls["eggplant"].aabb_half if which == "source"
                else self.basin_half)

    def _get_obs_extra(self, state: EnvState, ctx: TaskContext, info):
        obs = dict(tcp_pose=ctx.tcp_pose.raw)
        if self.obs_mode in ("state", "state_dict"):
            obs.update(
                src_pose=ctx.actor_pose(self.source_name).raw,
                tgt_pos=ctx.actor_pose("basket_site").p,
            )
        return obs

    def compute_dense_reward(self, state, action, info, ctx: TaskContext):
        src_p = ctx.actor_pose(self.source_name).p
        tgt_p = ctx.actor_pose("basket_site").p
        tcp_p = ctx.tcp_pose.p
        reach = 1.0 - jnp.tanh(5.0 * jnp.linalg.norm(src_p - tcp_p))
        grasped = self._is_grasping_src(ctx.body_quat, ctx.contact_forces())
        above = tgt_p + jnp.array([0.0, 0.0, 0.15])
        carry = 1.0 - jnp.tanh(5.0 * jnp.linalg.norm(src_p - above))
        reward = reach + grasped * (1.0 + carry)
        return jnp.where(info["success"], 5.0, reward)
