"""Batched environment runtime.

TPU-native rebuild of the reference core runtime (``mani_skill/envs/
sapien_env.py:BaseEnv``): obs/reward/control-mode dispatch, reset & episode
initialization, sim-vs-control frequency sub-stepping, seeding, state
get/set — but as a *functional core* (pure single-env ``reset``/``step``
transformed with vmap + jit) wrapped in a thin stateful class carrying the
batched ``EnvState`` pytree.

Reference call-stack parity (SURVEY.md §3.3): one ``env.step`` =
controller.set_action → physics step × (sim_freq/control_freq) → evaluate →
obs → reward, all fused into a single jitted function; partial resets are
``jnp.where`` masks instead of the reference's ``scene._reset_mask`` buffer
writes (scene.py:92-94).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..agents.base_agent import REGISTERED_AGENTS, BaseAgent
from ..kinematics import chain
from ..math.pose import Pose
from ..physics.engine import make_step_fn
from ..physics.model import (
    DriveCmd,
    SceneModel,
    SceneSpecBuilder,
    SimParams,
    SimState,
)


@struct.dataclass
class EnvState:
    """Complete per-env state: simulation + controller + episode bookkeeping.
    This is the full checkpoint/restart payload (reference analogue:
    ``env.get_state_dict()`` + controller state, sapien_env.py:1153-1199)."""

    sim: SimState
    cmd: DriveCmd
    elapsed_steps: jnp.ndarray  # () int32
    rng: jnp.ndarray  # per-env PRNG key
    extras: Dict[str, jnp.ndarray]  # task-specific episode data (goals, ...)


class TaskContext:
    """Per-step derived kinematic quantities handed to task hooks so FK is
    computed once per step (reference analogue: cached struct views)."""

    def __init__(self, env: "BaseEnv", state: EnvState, fk=None, f_pt=None):
        self.env = env
        self.state = state
        model = env.model
        if fk is not None:
            self.body_pos, self.body_quat, self.axis_w = fk
        elif model.nq > 0:
            self.body_pos, self.body_quat, self.axis_w = chain.fk(
                model.robot, jnp.asarray(model.robot_base_pose), state.sim.qpos
            )
        else:
            self.body_pos = jnp.zeros((0, 3))
            self.body_quat = jnp.zeros((0, 4))
            self.axis_w = jnp.zeros((0, 3))
        self._frames: Dict[str, Pose] = {}
        self._f_pt = f_pt

    def contact_forces(self) -> jnp.ndarray:
        """Per-candidate-point contact forces (P, 3) for pairwise force
        queries (is_grasping etc.). Reuses the physics step's last-substep
        forces on the planning fast path; computed on demand otherwise."""
        if self._f_pt is None:
            self._f_pt = self.env._force_query(
                self.state.sim,
                fk=(self.body_pos, self.body_quat, self.axis_w),
            )[0]
        return self._f_pt

    def frame_pose(self, name: str) -> Pose:
        if name not in self._frames:
            p, q = chain.frame_pose(
                self.env.model.robot,
                jnp.asarray(self.env.model.robot_base_pose),
                self.body_pos,
                self.body_quat,
                name,
            )
            self._frames[name] = Pose(p, q)
        return self._frames[name]

    @property
    def tcp_pose(self) -> Pose:
        return self.frame_pose(self.env.agent.ee_link_name)

    def body_velocity(self, body_idx: int):
        """(linear, angular) world velocity of a robot body's origin."""
        from ..physics.engine import joint_columns, joint_columns_to_jacobian

        model = self.env.model
        ref = jnp.asarray(model.robot_base_pose[:3])
        cols = joint_columns(model, self.body_pos, self.axis_w, ref)
        J = joint_columns_to_jacobian(model, cols)
        v = J[body_idx] @ self.state.sim.qvel  # (6,) [ω; v_ref]
        lin = v[3:] + jnp.cross(v[:3], self.body_pos[body_idx] - ref)
        return lin, v[:3]

    def link(self, name: str) -> "LinkView":
        """Per-link struct view (reference ``utils/structs/link.py`` Link:
        pose/velocity/bbox surface). ``name`` is a robot link/frame name."""
        return LinkView(self, name)

    def actor_pose(self, name: str) -> Pose:
        i = self.env.model.free_index.get(name)
        if i is not None:
            return Pose.from_raw(self.state.sim.free_pose[i])
        j = self.env.model.kin_index[name]
        return Pose.from_raw(self.state.sim.kin_pose[j])

    def actor_vel(self, name: str) -> jnp.ndarray:
        i = self.env.model.free_index.get(name)
        if i is not None:
            return self.state.sim.free_vel[i]
        return jnp.zeros(6)


class LinkView:
    """Read-only per-link view over a :class:`TaskContext` (reference
    ``utils/structs/link.py``: ``link.pose``, ``link.linear_velocity``,
    ``link.angular_velocity``, collision bbox). All values derive from the
    ctx's cached FK — building a view is free."""

    def __init__(self, ctx: TaskContext, name: str):
        self._ctx = ctx
        self.name = name
        spec = ctx.env.model.robot
        if name in spec.link_index:
            self.index = spec.link_index[name]
        else:  # fixed frame (e.g. panda_hand_tcp): resolve its parent body
            self.index = spec.frame_of(name)[0]

    @property
    def pose(self) -> Pose:
        return self._ctx.frame_pose(self.name)

    @property
    def linear_velocity(self) -> jnp.ndarray:
        return self._ctx.body_velocity(self.index)[0]

    @property
    def angular_velocity(self) -> jnp.ndarray:
        return self._ctx.body_velocity(self.index)[1]

    def collision_aabb_half(self) -> np.ndarray:
        """Half-extents of the link's collision geoms' combined local AABB
        (static, host-side) — the reference Link bbox surface."""
        from ..physics.model import BodyKind
        from ..physics.shapes import body_collision_aabb_half

        return body_collision_aabb_half(
            self._ctx.env.model.geoms, self.index, BodyKind.ROBOT_LINK)


class BaseEnv:
    """Subclass per task; override the task-authoring contract
    (reference sapien_env.py:371-443 / envs/template.py):
      _load_scene, _initialize_episode, evaluate, _get_obs_extra,
      compute_dense_reward, compute_normalized_dense_reward
    """

    SUPPORTED_ROBOTS = ["panda"]
    SUPPORTED_OBS_MODES = (
        "state", "state_dict", "none", "depth", "pointcloud", "sensor_data",
        "rgb", "rgbd",
    )
    SUPPORTED_REWARD_MODES = ("normalized_dense", "dense", "sparse", "none")
    DEFAULT_ROBOT = "panda"
    # reference SimConfig defaults: sim_freq=100, control_freq=20 (types.py:82)
    SIM_FREQ = 100
    CONTROL_FREQ = 20
    max_episode_steps: Optional[int] = None  # set by registry
    # greenscreen compositing (digital twins): camera uid -> (H, W, 3) uint8
    # overlay image; segmentation ids in rgb_overlay_mask_ids are treated as
    # background (reference rgb_always_overlay_objects). None at class level
    # — __init__ creates a fresh per-instance dict so mutating one env's
    # overlays never leaks into other instances.
    rgb_overlay_images: Optional[Dict[str, Any]] = None
    # body names forced onto the overlay even though they are dynamic
    # (reference rgb_always_overlay_objects, e.g. the sink)
    rgb_overlay_exclude_names: tuple = ()

    def _overlay_keep_table(self) -> np.ndarray:
        """(n_geoms+1,) bool: segmentation ids whose rendered pixels survive
        greenscreen compositing (robot links + free bodies, minus
        rgb_overlay_exclude_names). Index 0 = sky/background."""
        if getattr(self, "_overlay_keep_cache", None) is None:
            from ..physics.model import BodyKind

            keep = np.zeros(len(self.model.geoms) + 1, bool)
            for gi, g in enumerate(self.model.geoms):
                if g.kind in (BodyKind.ROBOT_LINK, BodyKind.FREE) and (
                    g.name not in self.rgb_overlay_exclude_names
                ):
                    keep[gi + 1] = True
            self._overlay_keep_cache = keep
        return self._overlay_keep_cache

    def get_language_instruction(self):
        """Natural-language task instruction, one per env (reference
        ``get_language_instruction``, digital-twin/VLA eval surface).
        None for tasks without one."""
        return None

    @property
    def scene(self):
        """Named object-struct views over the live state (reference
        ManiSkillScene + utils/structs surface; maniskill_tpu/structs.py)."""
        from ..structs import SceneView

        return SceneView(self)

    def __init__(
        self,
        num_envs: int = 1,
        obs_mode: str = "state",
        reward_mode: str = "normalized_dense",
        control_mode: Optional[str] = "pd_joint_delta_pos",
        robot_uids: Optional[str] = None,
        sim_params: Optional[SimParams] = None,
        robot_init_qpos_noise: float = 0.02,
        sim_backend: str = "auto",
        **kwargs,
    ):
        assert obs_mode in self.SUPPORTED_OBS_MODES, obs_mode
        assert reward_mode in self.SUPPORTED_REWARD_MODES, reward_mode
        assert sim_backend in ("auto", "xla", "pallas"), sim_backend
        self.num_envs = num_envs
        if self.rgb_overlay_images is None:
            self.rgb_overlay_images = {}
        self._overlay_keep_cache = None
        self.obs_mode = obs_mode
        self.reward_mode = reward_mode
        self.robot_uids = robot_uids or self.DEFAULT_ROBOT
        self.robot_init_qpos_noise = robot_init_qpos_noise
        self.sim_backend = sim_backend

        params = sim_params or SimParams(dt=1.0 / self.SIM_FREQ)
        self.sim_steps_per_control = self.SIM_FREQ // self.CONTROL_FREQ

        # --- build scene (reference _reconfigure path, sapien_env.py:648) ---
        if isinstance(self.robot_uids, (tuple, list)):
            from ..agents.multi_agent import MultiAgent

            self.agent = MultiAgent(self.robot_uids,
                                    control_mode=control_mode)
        else:
            agent_cls = REGISTERED_AGENTS[self.robot_uids]
            self.agent: BaseAgent = agent_cls(control_mode=control_mode)
        self.control_mode = self.agent.control_mode
        builder = SceneSpecBuilder(params)
        self._load_agent(builder)
        self._load_scene(builder)
        self.model: SceneModel = builder.build()
        if self.model.nq != self.agent.controller.nq:
            # articulated objects appended passive dofs to the kinematic
            # forest: widen the controller's full-dof drive arrays (its
            # joint_indices still address the robot's leading dofs)
            self.agent.controller.nq = self.model.nq
        self._physics_step = self._build_physics_dispatch()
        from ..physics.engine import make_force_query

        self._force_query = make_force_query(self.model)
        self._sensors = {}
        if self.obs_mode in ("depth", "pointcloud", "sensor_data", "rgb",
                             "rgbd"):
            from ..sensors.camera import Camera
            from ..sensors.depth_camera import (StereoDepthCamera,
                                                StereoDepthCameraConfig)

            cfgs = list(self._default_sensor_configs())
            cfgs += list(getattr(self.agent, "_sensor_configs", []))
            for cfg in cfgs:
                cls = (StereoDepthCamera
                       if isinstance(cfg, StereoDepthCameraConfig) else Camera)
                self._sensors[cfg.uid] = cls(cfg, self.model)
        self._post_build()

        # action space (flat Box like reference CombinedController)
        self.single_action_space = (
            self.agent.controller.action_low,
            self.agent.controller.action_high,
        )
        self.action_dim = self.agent.controller.action_dim

        # jitted batched fns
        self._jit_step = jax.jit(jax.vmap(self._step_one))
        self._jit_reset = jax.jit(jax.vmap(lambda k: self._reset_one(k)))
        self._jit_reset_prev = jax.jit(jax.vmap(self._reset_one))
        self._jit_masked_reset = jax.jit(self._masked_reset)

        self._state: Optional[EnvState] = None
        self._main_seed = None

    # ------------------------------------------------------------------
    # task-authoring contract (override in subclasses)
    # ------------------------------------------------------------------
    def _load_agent(self, builder: SceneSpecBuilder):
        self.agent.install(builder, np.array([0, 0, 0, 1, 0, 0, 0], np.float32))

    def _load_scene(self, builder: SceneSpecBuilder):
        raise NotImplementedError

    def _post_build(self):
        """Hook after the SceneModel exists (build contact queries etc.)."""

    def _default_sensor_configs(self):
        """Camera configs for visual obs modes (reference
        _default_sensor_configs, sapien_env.py:371). Tasks override."""
        return []

    def _default_human_render_camera_configs(self):
        """Camera config for :meth:`render` (reference
        _default_human_render_camera_configs, sapien_env.py:389)."""
        from ..math.pose import look_at
        from ..sensors.camera import CameraConfig

        # Framed on the workspace center; note only geoms with collision
        # shapes render (arm links are contact-budget-pruned — the
        # hand/fingers + objects carry the task-relevant visuals).
        pose = np.asarray(look_at([0.5, 0.6, 0.6], [-0.15, 0.0, 0.2]).raw)
        return CameraConfig("render_camera", pose, width=256, height=256,
                            fov=1.2)

    def render(self):
        """uint8 (H', W', 3) image: per-env flat-shaded Lambert RGB from
        the human render camera, tiled into one grid (reference render_mode
        "rgb_array", sapien_env.py:1290)."""
        assert self._state is not None, "call reset() before render()"
        from ..utils.visualization import tile_images

        if not hasattr(self, "_render_fn"):
            from ..sensors.camera import Camera

            cam = Camera(self._default_human_render_camera_configs(),
                         self.model)

            def one(state):
                ctx = TaskContext(self, state)
                return cam.render(state.sim, ctx.body_pos,
                                  ctx.body_quat)["rgb"]

            self._render_fn = jax.jit(jax.vmap(one))
            self._render_far = cam.cfg.far
        rgb = np.asarray(self._render_fn(self._state))  # (B, H, W, 3)
        return tile_images(list(rgb))

    def _initialize_episode(self, state: EnvState, key) -> EnvState:
        """Pure per-env episode randomization; return updated state."""
        return state

    def evaluate(self, state: EnvState, ctx: TaskContext) -> Dict[str, jnp.ndarray]:
        return dict(success=jnp.zeros((), dtype=bool))

    def _get_obs_extra(self, state: EnvState, ctx: TaskContext, info) -> Dict:
        return {}

    def compute_dense_reward(self, state, action, info, ctx) -> jnp.ndarray:
        return jnp.zeros(())

    def compute_normalized_dense_reward(self, state, action, info, ctx):
        return self.compute_dense_reward(state, action, info, ctx)

    def compute_sparse_reward(self, state, action, info, ctx):
        """info['success'] - info['fail'] (reference sapien_env.py:637-643)."""
        r = info["success"].astype(jnp.float32)
        if "fail" in info:
            r = r - info["fail"].astype(jnp.float32)
        return r

    # ------------------------------------------------------------------
    # functional core (single env; vmapped)
    # ------------------------------------------------------------------
    def _initial_sim_state(self, key) -> SimState:
        state = self.model.initial_state()
        if self.model.nq > 0 and self.robot_init_qpos_noise > 0:
            noise = self.robot_init_qpos_noise * jax.random.normal(
                key, (self.model.nq,)
            )
            # gripper joints excluded from noise in reference table scene
            # builder (scene_builder.py:80-84); noise only on arm joints
            mask = jnp.asarray(
                (self.model.robot.joint_type == 0).astype(np.float32)
            )
            state = state.replace(qpos=state.qpos + noise * mask)
        return state

    def _reset_one(self, key, prev: Optional[EnvState] = None
                   ) -> Tuple[EnvState, Any, Dict]:
        k_init, k_ep, k_next = jax.random.split(key, 3)
        sim = self._initial_sim_state(k_init)
        state = EnvState(
            sim=sim,
            cmd=DriveCmd(
                target_qpos=sim.qpos,
                target_qvel=jnp.zeros(self.model.nq),
                qf=jnp.zeros(self.model.nq),
            ),
            elapsed_steps=jnp.zeros((), jnp.int32),
            rng=k_next,
            extras=self._default_extras(),
        )
        if prev is None:
            state = self._initialize_episode(state, k_ep)
        else:
            state = self._initialize_episode_prev(state, k_ep, prev)
        # controller reset from (possibly task-modified) qpos
        state = state.replace(cmd=self.agent.controller.reset(state.sim.qpos))
        ctx = TaskContext(self, state)
        info = self.evaluate(state, ctx)
        obs = self._get_obs(state, ctx, info)
        return state, obs, info

    def _initialize_episode_prev(self, state: EnvState, key,
                                 prev: EnvState) -> EnvState:
        """Episode init with access to the env's PREVIOUS state — override
        for cross-episode persistence (e.g. reconfiguration_freq object
        reuse, reference sapien_env.py _reconfigure cadence). Default
        ignores ``prev``."""
        return self._initialize_episode(state, key)

    def _default_extras(self) -> Dict[str, jnp.ndarray]:
        """Zero-valued extras pytree (so reset/step have matching structure)."""
        return {}

    def _update_extras(self, state: EnvState, ctx: "TaskContext") -> EnvState:
        """Per-step task bookkeeping (accumulators etc.) before evaluate
        (reference analogue: stateful task attributes like
        ``cum_rotation_angle``, rotate_single_object_in_hand.py)."""
        return state

    def _build_physics_dispatch(self):
        """Single-env ``(sim, cmd, sim_steps) -> sim`` physics step that,
        when vmapped over a large batch on TPU, routes the WHOLE batch to
        the Pallas mega-kernel (physics/megakernel.py) via a custom_vmap
        batching rule; every other case (CPU, small batches, odd sim_steps,
        aux requests, differentiation for iLQR with sim_backend='xla')
        falls back to the vmapped XLA engine. TPU-native counterpart of
        the reference's sim-backend selection (physx_cpu vs physx_cuda,
        sapien_env.py backend plumbing)."""
        from ..physics import megakernel

        step_xla = make_step_fn(self.model)
        if self.sim_backend == "xla" or not megakernel.supports(self.model):
            return step_xla
        n_steps = self.sim_steps_per_control
        backend = self.sim_backend
        model = self.model
        # built OUTSIDE any trace: _Plan runs jnp ops (metadata trace) that
        # must not leak tracers into the custom_vmap batching rule
        cell = {"step": megakernel.make_pallas_step_fn(model, n_steps)}

        from jax import custom_batching

        @custom_batching.custom_vmap
        def phys(sim, cmd):
            return step_xla(sim, cmd, n_steps)

        @phys.def_vmap
        def _phys_batched(axis_size, in_batched, sim, cmd):
            def bc(x, b):
                return x if b else jnp.broadcast_to(
                    x, (axis_size,) + jnp.shape(x)
                )

            sim_b = jax.tree.map(bc, sim, in_batched[0])
            cmd_b = jax.tree.map(bc, cmd, in_batched[1])
            use_pallas = backend == "pallas" or (
                backend == "auto"
                and jax.default_backend() == "tpu"
                and axis_size >= 512
            )
            if use_pallas:
                new_sim, _aux = cell["step"](sim_b, cmd_b)
            else:
                new_sim = jax.vmap(
                    lambda s, c: step_xla(s, c, n_steps)
                )(sim_b, cmd_b)
            out_batched = jax.tree.map(lambda _: True, new_sim)
            return new_sim, out_batched

        # Differentiable fast path: custom_vmap has no JVP rule, so wrap
        # the dispatch in a custom_jvp whose PRIMAL rides the (possibly
        # Pallas) dispatch and whose TANGENT rides the XLA step's exact
        # JVP — legitimate because the two paths compute the same function
        # (equivalence-tested, tests/test_megakernel*.py). This unpins
        # iLQR/gradient-based planners from sim_backend='xla': forward
        # rollouts (the line-search bulk) run the mega-kernel, jacobians
        # differentiate the XLA trace.
        @jax.custom_jvp
        def phys_d(sim, cmd):
            return phys(sim, cmd)

        @phys_d.defjvp
        def _phys_jvp(primals, tangents):
            out = phys(*primals)
            _, t_out = jax.jvp(
                lambda s, c: step_xla(s, c, n_steps), primals, tangents
            )
            return out, t_out

        def stepper(sim, cmd, sim_steps=1, return_aux=False):
            if sim_steps != n_steps or return_aux:
                return step_xla(sim, cmd, sim_steps, return_aux)
            return phys_d(sim, cmd)

        return stepper

    def _step_one(self, state: EnvState, action) -> Tuple[EnvState, Any, Any, Any, Dict]:
        action = jnp.nan_to_num(jnp.asarray(action, jnp.float32))
        aux = None
        if self.agent.controller.needs_fk_aux:
            ctx0 = TaskContext(self, state)
            aux = (
                jnp.asarray(self.model.robot_base_pose),
                ctx0.body_pos,
                ctx0.body_quat,
                ctx0.axis_w,
            )
        cmd = self.agent.controller.set_action(
            state.cmd, state.sim.qpos, action, aux=aux
        )
        sim = self._physics_step(state.sim, cmd, self.sim_steps_per_control)
        state = state.replace(
            sim=sim, cmd=cmd, elapsed_steps=state.elapsed_steps + 1
        )
        ctx = TaskContext(self, state)
        state = self._update_extras(state, ctx)
        info = self.evaluate(state, ctx)
        obs = self._get_obs(state, ctx, info)
        reward = self._get_reward(state, action, info, ctx)
        terminated = info.get("success", jnp.zeros((), bool))
        if "fail" in info:
            terminated = terminated | info["fail"]
        return state, obs, reward, terminated, info

    def _rollout_step(self, state: EnvState, action) -> Tuple[EnvState, jnp.ndarray, jnp.ndarray]:
        """Planning-grade step: advances physics + returns (state', reward,
        success) without building observations. This is what MPPI/CEM/iLQR
        vmap over thousands of rollouts (BASELINE.json north star)."""
        aux = None
        if self.agent.controller.needs_fk_aux:
            ctx0 = TaskContext(self, state)
            aux = (
                jnp.asarray(self.model.robot_base_pose),
                ctx0.body_pos,
                ctx0.body_quat,
                ctx0.axis_w,
            )
        cmd = self.agent.controller.set_action(
            state.cmd, state.sim.qpos, action, aux=aux
        )
        sim = self._physics_step(state.sim, cmd, self.sim_steps_per_control)
        state = state.replace(
            sim=sim, cmd=cmd, elapsed_steps=state.elapsed_steps + 1
        )
        ctx = TaskContext(self, state)
        state = self._update_extras(state, ctx)
        info = self.evaluate(state, ctx)
        reward = self._get_reward(state, action, info, ctx)
        return state, reward, info.get("success", jnp.zeros((), bool))

    def _get_reward(self, state, action, info, ctx):
        if self.reward_mode == "dense":
            return self.compute_dense_reward(state, action, info, ctx)
        if self.reward_mode == "normalized_dense":
            return self.compute_normalized_dense_reward(state, action, info, ctx)
        if self.reward_mode == "sparse":
            return self.compute_sparse_reward(state, action, info, ctx)
        return jnp.zeros(())

    def _get_obs(self, state: EnvState, ctx: TaskContext, info):
        if self.obs_mode == "none":
            return jnp.zeros((0,))
        agent_obs = self.agent.proprioception(state.sim.qpos, state.sim.qvel)
        extra = self._get_obs_extra(state, ctx, info)
        obs = dict(agent=agent_obs, extra=extra)
        if self.obs_mode == "state_dict":
            return obs
        if self.obs_mode in ("depth", "pointcloud", "sensor_data", "rgb",
                             "rgbd"):
            # only trace the textures this obs mode consumes (the renderer
            # gates normal/shading/position work on this set)
            wanted = {
                "rgb": ("rgb", "segmentation") if self.rgb_overlay_images
                else ("rgb",),
                "rgbd": ("rgb", "depth", "segmentation"),
                "depth": ("depth", "segmentation"),
                "pointcloud": ("position", "segmentation"),
            }.get(self.obs_mode)  # sensor_data -> None = shader default
            # sensors that model per-capture noise (StereoDepthCamera
            # matcher jitter) get a key derived from the per-env episode
            # rng + step count, so noise is seeded-deterministic yet fresh
            # every capture.
            sensor_data = {
                uid: (cam.render(
                    state.sim, ctx.body_pos, ctx.body_quat,
                    key=jax.random.fold_in(
                        jax.random.fold_in(state.rng, state.elapsed_steps),
                        i),
                    wanted=wanted)
                    if getattr(cam, "needs_key", False)
                    else cam.render(state.sim, ctx.body_pos, ctx.body_quat,
                                    wanted=wanted))
                for i, (uid, cam) in enumerate(self._sensors.items())
            }
            # greenscreen compositing (digital-twin real2sim eval): keep
            # robot-link and free-body pixels, composite everything else
            # (tables, walls, sky) over the per-camera real-scene image.
            # Reference: BaseDigitalTwinEnv rgb_overlay_paths +
            # rgb_always_overlay_objects (digital_twins/base_env.py).
            if self.rgb_overlay_images:
                keep = jnp.asarray(self._overlay_keep_table())
                for uid, overlay in self.rgb_overlay_images.items():
                    if uid not in sensor_data or "rgb" not in sensor_data[uid]:
                        continue
                    d = sensor_data[uid]
                    bg = ~keep[d["segmentation"].astype(jnp.int32)]
                    d["rgb"] = jnp.where(
                        bg[..., None], jnp.asarray(overlay, jnp.uint8),
                        d["rgb"],
                    )
            if self.obs_mode == "rgb":
                obs["sensor_data"] = {
                    uid: dict(rgb=d["rgb"]) for uid, d in sensor_data.items()
                }
            elif self.obs_mode == "rgbd":
                obs["sensor_data"] = {
                    uid: dict(rgb=d["rgb"], depth=d["depth"],
                              segmentation=d["segmentation"])
                    for uid, d in sensor_data.items()
                }
            elif self.obs_mode == "depth":
                obs["sensor_data"] = {
                    uid: dict(depth=d["depth"], segmentation=d["segmentation"])
                    for uid, d in sensor_data.items()
                }
            elif self.obs_mode == "pointcloud":
                # merged world-frame pointcloud + per-point segmentation
                # (reference sensor_data_to_pointcloud, observations.py:17)
                xyz = jnp.concatenate(
                    [d["position"].reshape(-1, 3) for d in sensor_data.values()]
                )
                seg = jnp.concatenate(
                    [d["segmentation"].reshape(-1) for d in sensor_data.values()]
                )
                obs["pointcloud"] = dict(xyzw=xyz, segmentation=seg)
            else:
                obs["sensor_data"] = sensor_data
            return obs
        # "state": deterministic ordered flattening (reference
        # common.py:flatten_state_dict contract — insertion order)
        return flatten_state_dict(obs)

    def _masked_reset(self, state: EnvState, keys, mask):
        """Partial reset: reset envs where mask is True, keep others.
        Reference: reset(options={'env_idx': ...}), sapien_env.py:815-841."""
        new_state, obs, info = jax.vmap(self._reset_one)(keys, state)
        merged = jax.tree.map(
            lambda n, o: jnp.where(
                mask.reshape((-1,) + (1,) * (n.ndim - 1)), n, o
            ),
            new_state,
            state,
        )
        return merged, obs, info

    # ------------------------------------------------------------------
    # stateful batched API (reference gym-facing surface)
    # ------------------------------------------------------------------
    def reset(self, seed: Optional[int] = None, options: Optional[dict] = None):
        options = options or {}
        if seed is None:
            if self._main_seed is None:
                seed = 0
                self._main_seed = seed
            else:
                self._main_seed += 1
                seed = self._main_seed
        else:
            self._main_seed = seed
        base = jax.random.key(seed)
        keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
            jnp.arange(self.num_envs)
        )
        env_idx = options.get("env_idx", None)
        if env_idx is not None and self._state is not None:
            mask = jnp.zeros(self.num_envs, dtype=bool).at[jnp.asarray(env_idx)].set(True)
            self._state, obs, info = self._jit_masked_reset(self._state, keys, mask)
        elif self._state is not None:
            self._state, obs, info = self._jit_reset_prev(keys, self._state)
        else:
            self._state, obs, info = self._jit_reset(keys)
        return obs, info

    def step(self, action):
        action = jnp.asarray(action, dtype=jnp.float32)
        if action.ndim == 1:
            action = jnp.broadcast_to(action, (self.num_envs,) + action.shape)
        self._state, obs, reward, terminated, info = self._jit_step(
            self._state, action
        )
        truncated = (
            self._state.elapsed_steps >= self.max_episode_steps
            if self.max_episode_steps is not None
            else jnp.zeros(self.num_envs, dtype=bool)
        )
        return obs, reward, terminated, truncated, info

    @property
    def elapsed_steps(self):
        return self._state.elapsed_steps

    # -- state get/set (reference sapien_env.py:1153-1199 contract) --------
    def get_state_dict(self) -> Dict:
        """{'actors': {name: (B,13)}, 'articulations': {uid: (B,13+2nq)}} —
        exact reference layout (actor.py:132, articulation.py:273-279)."""
        s = self._state.sim
        actors = {}
        for name, i in self.model.free_index.items():
            actors[name] = jnp.concatenate(
                [s.free_pose[:, i], s.free_vel[:, i]], axis=-1
            )
        for name, i in self.model.kin_index.items():
            actors[name] = jnp.concatenate(
                [s.kin_pose[:, i], jnp.zeros((self.num_envs, 6))], axis=-1
            )
        arts = {}
        if self.model.nq > 0:
            root = jnp.broadcast_to(
                jnp.asarray(self.model.robot_base_pose),
                (self.num_envs, 7),
            )
            arts[self.robot_uids] = jnp.concatenate(
                [root, jnp.zeros((self.num_envs, 6)), s.qpos, s.qvel], axis=-1
            )
        out = dict(actors=actors, articulations=arts)
        out["controller"] = dict(target_qpos=self._state.cmd.target_qpos)
        # warm-started contact impulses (SimState.contact_lam): genuinely
        # part of solver state, carried so set_state_dict restores behavior
        # EXACTLY. (PhysX keeps an equivalent warm-start cache but hides it
        # from the reference's state dict — restoring without it is only
        # approximate; lam re-converges within ~2 substeps.)
        out["contacts"] = dict(lam=s.contact_lam, lam_t=s.contact_lam_t)
        return out

    def set_state_dict(self, sd: Dict):
        s = self._state.sim
        free_pose, free_vel = s.free_pose, s.free_vel
        kin_pose = s.kin_pose
        for name, val in sd.get("actors", {}).items():
            val = jnp.asarray(val)
            if name in self.model.free_index:
                i = self.model.free_index[name]
                free_pose = free_pose.at[:, i].set(val[:, :7])
                free_vel = free_vel.at[:, i].set(val[:, 7:13])
            elif name in self.model.kin_index:
                i = self.model.kin_index[name]
                kin_pose = kin_pose.at[:, i].set(val[:, :7])
        qpos, qvel = s.qpos, s.qvel
        for name, val in sd.get("articulations", {}).items():
            val = jnp.asarray(val)
            nq = self.model.nq
            qpos = val[:, 13 : 13 + nq]
            qvel = val[:, 13 + nq : 13 + 2 * nq]
        if "contacts" in sd:
            lam = jnp.asarray(sd["contacts"]["lam"])
            lam_t = jnp.asarray(sd["contacts"]["lam_t"])
        else:  # legacy payload: re-converges within ~2 substeps
            lam = jnp.zeros_like(s.contact_lam)
            lam_t = jnp.zeros_like(s.contact_lam_t)
        sim = s.replace(
            free_pose=free_pose, free_vel=free_vel, kin_pose=kin_pose,
            qpos=qpos, qvel=qvel, contact_lam=lam, contact_lam_t=lam_t,
        )
        cmd = self._state.cmd
        if "controller" in sd:
            cmd = cmd.replace(target_qpos=jnp.asarray(sd["controller"]["target_qpos"]))
        self._state = self._state.replace(sim=sim, cmd=cmd)

    def get_state(self) -> jnp.ndarray:
        return flatten_state_dict(self.get_state_dict())

    def set_drive_properties(self, stiffness=None, damping=None,
                             force_limit=None, joint_names=None,
                             env_idx=None):
        """Change PD drive gains at runtime (reference parity:
        ``ArticulationJoint.set_drive_property``,
        utils/structs/articulation_joint.py:25). Applies live — gains are
        per-env DriveCmd state — and persists until the next episode reset
        (which restores the controller-config gains).

        joint_names: subset of robot joints (default: all); env_idx:
        subset of envs (default: all)."""
        cmd = self._state.cmd
        names = list(self.model.robot.joint_names)
        jidx = (np.arange(self.model.nq) if joint_names is None
                else np.asarray([names.index(n) for n in joint_names]))
        eidx = (np.arange(self.num_envs) if env_idx is None
                else np.asarray(env_idx))

        def upd(cur, val):
            if val is None:
                return cur
            val = jnp.broadcast_to(
                jnp.asarray(val, jnp.float32), (len(eidx), len(jidx))
            )
            return cur.at[np.ix_(eidx, jidx)].set(val)

        cmd = cmd.replace(
            kp=upd(cmd.kp, stiffness),
            kd=upd(cmd.kd, damping),
            force_limit=upd(cmd.force_limit, force_limit),
        )
        self._state = self._state.replace(cmd=cmd)

    # convenience ----------------------------------------------------------
    def sample_action(self, rng: np.random.RandomState):
        lo, hi = self.single_action_space
        return rng.uniform(lo, hi, size=(self.num_envs, self.action_dim)).astype(
            np.float32
        )


def flatten_state_dict(d: Dict) -> jnp.ndarray:
    """Deterministic insertion-ordered flatten of a nested dict of arrays
    into one vector (batch dims preserved) — mirrors reference
    ``utils/common.py:flatten_state_dict:195``."""
    leaves = []

    def rec(x):
        if isinstance(x, dict):
            for k in x:
                rec(x[k])
        else:
            a = jnp.asarray(x)
            if a.dtype == bool:
                a = a.astype(jnp.float32)
            if a.ndim == 0:
                a = a[None]
            leaves.append(a)

    rec(d)
    return jnp.concatenate(leaves, axis=-1)
