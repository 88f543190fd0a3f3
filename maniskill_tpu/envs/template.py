"""Task-authoring template.

Reference analogue: ``mani_skill/envs/template.py`` (the documented skeleton
every new task starts from). Copy this file, rename the class, fill in the
hooks, and register an env id. Everything marked OPTIONAL has a sensible
default in :class:`~maniskill_tpu.envs.base_env.BaseEnv`.

The big picture
---------------
A task is a *pure-function* specialization of ``BaseEnv``:

- **Build time** (runs once, host-side numpy): ``_load_agent`` /
  ``_load_scene`` declare the static scene — bodies, geoms, articulations —
  through a :class:`~maniskill_tpu.physics.model.SceneSpecBuilder`. The
  result compiles to one :class:`SceneModel` shared by every env in the
  batch. Per-env *variation* (different sizes, masses, hull models, geom
  offsets) is declared here too, but materializes as leaves of ``SimState``
  so it can differ across the batch without recompiles.
- **Episode time** (traced JAX, vmapped over envs): ``_initialize_episode``
  randomizes poses/goals from a per-env PRNG key; ``evaluate`` computes
  success/fail; ``compute_dense_reward`` shapes the learning signal. These
  run inside jit — use ``jnp``/``jax.random`` only, no Python branching on
  traced values (``jnp.where`` instead of ``if``).

Unlike the reference there is no GPU buffer apply/fetch to manage: the
state pytree IS the simulation state, and a task hook returns a new one.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..math.pose import Pose, look_at
from ..physics.model import SceneSpecBuilder, box_geom, sphere_geom
from ..sensors.camera import CameraConfig
from .base_env import BaseEnv, EnvState, TaskContext
from .registration import register_env
from .scene_builders import TableSceneBuilder


# The template ships REGISTERED under the reference's template id
# (``envs/template.py:42`` registers "CustomEnv-v1") so `mst.make` can
# instantiate it directly; rename id + class when authoring a real task.
# ``max_episode_steps`` feeds the TimeLimit wrapper exactly like the
# reference's ``register_env(..., max_episode_steps=...)``.
@register_env("CustomEnv-v1", max_episode_steps=200)
class MyTaskEnv(BaseEnv):
    """One-line description of the task.

    **Task description:** what the robot must do.

    **Randomizations:** what varies per episode.

    **Success conditions:** when ``evaluate`` reports success.
    """

    # Robots the task supports (uids from maniskill_tpu.agents.REGISTERED_
    # AGENTS). The env kwarg ``robot_uids`` picks one at construction; pass
    # a tuple of uids for a multi-agent task (actions become per-agent
    # slices of one flat vector).
    SUPPORTED_ROBOTS = ["panda", "panda_wristcam", "fetch"]
    DEFAULT_ROBOT = "panda_wristcam"

    # task constants (host-side python; become jit-static)
    cube_half_size = 0.02
    goal_thresh = 0.025

    # ------------------------------------------------------------------
    # OPTIONAL: sensors. Default: no cameras (obs_mode="state" needs none).
    # Mounted cameras: pass mount=<link name> and a relative pose.
    # ------------------------------------------------------------------
    def _default_sensor_configs(self):
        pose = look_at(eye=[0.3, 0, 0.6], target=[-0.1, 0, 0.1])
        return [
            CameraConfig("base_camera", np.asarray(pose.raw), 128, 128,
                         np.pi / 2, 0.01, 100)
        ]

    # ------------------------------------------------------------------
    # Build time: the robot. Almost always: pick a scene builder, ask it
    # for the robot's mounting pose + rest qpos, install the agent.
    # ------------------------------------------------------------------
    def _load_agent(self, builder: SceneSpecBuilder):
        self.table_scene = TableSceneBuilder(self)
        pose, qpos = self.table_scene.robot_pose_and_qpos(self.robot_uids)
        self.agent.install(builder, pose, init_qpos=qpos)

    # ------------------------------------------------------------------
    # Build time: everything else. Free bodies need mass + inertia
    # (density-based helpers follow the reference's build_cube semantics);
    # kinematic bodies are pose-driven markers (goal sites, targets).
    # Articulated objects (cabinets, faucets) go through
    # builder.add_articulation(...) and merge into the kinematic forest.
    # Per-env heterogeneity: builder.add_free_body(...) then randomize
    # SimState.geom_size / geom_pos / mass_* in _initialize_episode, or use
    # a hull library for per-env mesh selection (see pick_single_hull.py).
    # ------------------------------------------------------------------
    def _load_scene(self, builder: SceneSpecBuilder):
        self.table_scene.build(builder)
        half = self.cube_half_size
        m = 1000.0 * (2 * half) ** 3
        inertia = (2.0 / 3.0) * m * half * half * np.eye(3)
        self.obj = builder.add_free_body(
            "cube", m, inertia, [box_geom([half] * 3)]
        )
        self.goal_site = builder.add_kinematic_body("goal_site")

    # ------------------------------------------------------------------
    # Episode time (traced, vmapped): place objects and goals from the
    # per-env key. Write through SimState .at[] setters; return the new
    # EnvState. Partial resets are handled by the runtime — this function
    # only ever sees "this env is being reset".
    # ------------------------------------------------------------------
    def _initialize_episode(self, state: EnvState, key) -> EnvState:
        k_obj, k_goal = jax.random.split(key)
        half = self.cube_half_size
        xy = jax.random.uniform(k_obj, (2,), minval=-0.1, maxval=0.1)
        obj_pose = jnp.concatenate([xy, jnp.array([half, 1.0, 0, 0, 0])])
        k_gxy, k_gz = jax.random.split(k_goal)
        goal_xyz = jnp.concatenate([
            jax.random.uniform(k_gxy, (2,), minval=-0.1, maxval=0.1),
            jax.random.uniform(k_gz, (1,), minval=0.1, maxval=0.3),
        ])
        goal_pose = jnp.concatenate([goal_xyz, jnp.array([1.0, 0, 0, 0])])
        sim = state.sim.replace(
            free_pose=state.sim.free_pose.at[self.obj].set(obj_pose),
            free_vel=state.sim.free_vel.at[self.obj].set(jnp.zeros(6)),
            kin_pose=state.sim.kin_pose.at[self.goal_site].set(goal_pose),
        )
        return state.replace(sim=sim)

    # ------------------------------------------------------------------
    # Episode time: success/fail. ``ctx`` gives named access to the scene
    # (actor_pose, tcp_pose, qpos slices, contact forces via
    # ctx.pairwise_contact_force / agent.is_grasping). Return a dict with
    # at least "success"; add "fail" for early-terminating failure.
    # ------------------------------------------------------------------
    def evaluate(self, state: EnvState, ctx: TaskContext):
        obj_p = ctx.actor_pose("cube").p
        goal_p = ctx.actor_pose("goal_site").p
        is_placed = jnp.linalg.norm(obj_p - goal_p) < self.goal_thresh
        is_static = jnp.linalg.norm(state.sim.qvel) < 0.2
        return dict(success=is_placed & is_static)

    # ------------------------------------------------------------------
    # OPTIONAL: extra observations beyond proprioception. Gate
    # ground-truth-ish signals behind state obs modes so visual policies
    # don't see oracle data (reference convention).
    # ------------------------------------------------------------------
    def _get_obs_extra(self, state: EnvState, ctx: TaskContext, info):
        obs = dict(tcp_pose=ctx.tcp_pose.raw)
        if self.obs_mode in ("state", "state_dict"):
            obs.update(
                goal_pos=ctx.actor_pose("goal_site").p,
                obj_pose=ctx.actor_pose("cube").raw,
            )
        return obs

    # ------------------------------------------------------------------
    # Episode time: shaped reward. Use staged tanh shaping (the reference
    # house style); jnp.where for stage gating. ``info`` is evaluate()'s
    # dict. sparse reward (success - fail) and "none" come for free.
    # ------------------------------------------------------------------
    def compute_dense_reward(self, state, action, info, ctx: TaskContext):
        obj_p = ctx.actor_pose("cube").p
        goal_p = ctx.actor_pose("goal_site").p
        tcp_p = ctx.tcp_pose.p
        reaching = 1.0 - jnp.tanh(5.0 * jnp.linalg.norm(obj_p - tcp_p))
        placing = 1.0 - jnp.tanh(5.0 * jnp.linalg.norm(obj_p - goal_p))
        reward = reaching + placing
        return jnp.where(info["success"], 5.0, reward)

    # Always provide the normalized variant: dense / max so rewards land in
    # [0, 1] — RL baselines default to reward_mode="normalized_dense".
    def compute_normalized_dense_reward(self, state, action, info, ctx):
        return self.compute_dense_reward(state, action, info, ctx) / 5.0
