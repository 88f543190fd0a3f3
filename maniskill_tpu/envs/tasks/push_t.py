"""PushT-v1.

Parity port of the reference PushT (``mani_skill/envs/tasks/tabletop/
push_t.py``): push a T-shaped block into a fixed goal-T outline with a
stick-equipped Panda. Same constants (goal at (-0.156,-0.1), goal yaw 5π/3,
spawn box, intersection threshold 0.90) and the pose-based dense reward
(:505-537). The overlap metric re-implements the reference's
"pseudo-render" intersection (:343) as a static sample-grid measure: points
covering the T in its local frame are transformed to the goal frame and
tested against the goal-T's two boxes — same quantity, no rasterizer.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...math.rotations import quat_apply, quat_from_axis_angle
from ...physics.model import SceneSpecBuilder, box_geom
from ..base_env import BaseEnv, EnvState, TaskContext
from ..registration import register_env
from ..scene_builders import TableSceneBuilder

# T geometry (reference :179-226): horizontal bar + stem, CoM at the origin
_BAR_HALF = np.array([0.1, 0.025])
_STEM_HALF = np.array([0.025, 0.075])
_A1 = 4 * _BAR_HALF[0] * _BAR_HALF[1]
_A2 = 4 * _STEM_HALF[0] * _STEM_HALF[1]
# stem hangs below the bar (flush), shift both so the CoM is at the origin
_STEM_CY = -_BAR_HALF[1] - _STEM_HALF[1]
_COM_Y = (_A2 * _STEM_CY) / (_A1 + _A2)
_BAR_OFF = np.array([0.0, -_COM_Y])
_STEM_OFF = np.array([0.0, _STEM_CY - _COM_Y])
_HALF_T = 0.02  # half thickness


def _t_sample_points(n_per_box: int = 16) -> np.ndarray:
    """Static grid of 2D points covering the T in its local frame."""
    pts = []
    for half, off in [(_BAR_HALF, _BAR_OFF), (_STEM_HALF, _STEM_OFF)]:
        # cell centers (strictly interior, so exact alignment scores 1.0)
        xs = ((np.arange(n_per_box) + 0.5) / n_per_box) * 2 * half[0] - half[0]
        ys = ((np.arange(n_per_box) + 0.5) / n_per_box) * 2 * half[1] - half[1]
        g = np.stack(np.meshgrid(xs, ys), axis=-1).reshape(-1, 2)
        pts.append(g + off)
    return np.concatenate(pts).astype(np.float32)


def _points_in_t(pts: jnp.ndarray) -> jnp.ndarray:
    """Boolean mask: which local-frame 2D points lie inside the T."""
    def in_box(p, half, off):
        d = jnp.abs(p - off)
        return (d[:, 0] <= half[0] + 1e-5) & (d[:, 1] <= half[1] + 1e-5)

    return in_box(pts, jnp.asarray(_BAR_HALF), jnp.asarray(_BAR_OFF)) | in_box(
        pts, jnp.asarray(_STEM_HALF), jnp.asarray(_STEM_OFF)
    )


@register_env("PushT-v1", max_episode_steps=100)
class PushTEnv(BaseEnv):
    SUPPORTED_ROBOTS = ["panda_stick"]
    DEFAULT_ROBOT = "panda_stick"

    goal_offset = np.array([-0.156, -0.1])  # reference :100
    goal_z_rot = (5 / 3) * np.pi  # reference :101
    intersection_thresh = 0.90  # reference :111

    def _load_agent(self, builder: SceneSpecBuilder):
        self.table_scene = TableSceneBuilder(self)
        pose, _ = self.table_scene.robot_pose_and_qpos("panda")
        self.agent.install(builder, pose)

    def _load_scene(self, builder: SceneSpecBuilder):
        self.table_scene.build(builder)
        rho = 1000.0
        m = rho * (_A1 + _A2) * 2 * _HALF_T
        # bounding-box inertia approximation about the CoM
        hx, hy, hz = 0.1, 0.1, _HALF_T
        inertia = m / 3.0 * np.diag(
            [hy * hy + hz * hz, hx * hx + hz * hz, hx * hx + hy * hy]
        )
        self.tee = builder.add_free_body(
            "tee", m, inertia,
            [
                box_geom([_BAR_HALF[0], _BAR_HALF[1], _HALF_T],
                         offset_p=[_BAR_OFF[0], _BAR_OFF[1], 0]),
                box_geom([_STEM_HALF[0], _STEM_HALF[1], _HALF_T],
                         offset_p=[_STEM_OFF[0], _STEM_OFF[1], 0]),
            ],
        )
        self.goal_tee = builder.add_kinematic_body("goal_tee")
        self._t_pts = jnp.asarray(_t_sample_points())

    def _initialize_episode(self, state: EnvState, key) -> EnvState:
        k1, k2, k3 = jax.random.split(key, 3)
        up = jnp.array([0.0, 0.0, 1.0])
        goal_pose = jnp.concatenate(
            [jnp.asarray(self.goal_offset), jnp.array([1e-3]),
             quat_from_axis_angle(up, self.goal_z_rot)]
        )
        # T spawn box relative to the goal (reference :452-470)
        x = self.goal_offset[0] + jax.random.uniform(k1, (), minval=-0.1, maxval=0.1)
        y = self.goal_offset[1] + jax.random.uniform(k2, (), minval=-0.1, maxval=0.2)
        yaw = jax.random.uniform(k3, (), minval=0.0, maxval=2 * jnp.pi)
        tee_pose = jnp.concatenate(
            [jnp.stack([x, y, jnp.asarray(_HALF_T + 1e-3)]),
             quat_from_axis_angle(up, yaw)]
        )
        sim = state.sim.replace(
            free_pose=state.sim.free_pose.at[self.tee].set(tee_pose),
            free_vel=jnp.zeros_like(state.sim.free_vel),
            kin_pose=state.sim.kin_pose.at[self.goal_tee].set(goal_pose),
        )
        return state.replace(sim=sim)

    def _intersection(self, ctx: TaskContext) -> jnp.ndarray:
        """Fraction of the T's area overlapping the goal T (reference
        pseudo_render_intersection, :343)."""
        tee = ctx.actor_pose("tee")
        goal = ctx.actor_pose("goal_tee")
        pts3 = jnp.concatenate(
            [self._t_pts, jnp.zeros((self._t_pts.shape[0], 1))], axis=-1
        )
        world = tee.apply(pts3)
        in_goal_frame = goal.apply_inv(world)[:, :2]
        inside = _points_in_t(in_goal_frame)
        return jnp.mean(inside.astype(jnp.float32))

    @staticmethod
    def _z_euler(q):
        v = quat_apply(q, jnp.array([1.0, 0.0, 0.0]))
        return jnp.arctan2(v[1], v[0])

    def evaluate(self, state: EnvState, ctx: TaskContext):
        inter = self._intersection(ctx)
        return dict(success=inter >= self.intersection_thresh,
                    intersection=inter)

    def _get_obs_extra(self, state, ctx, info):
        obs = dict(tcp_pose=ctx.tcp_pose.raw)
        if "state" in self.obs_mode:
            obs.update(
                goal_pos=ctx.actor_pose("goal_tee").p,
                obj_pose=ctx.actor_pose("tee").raw,
            )
        return obs

    def compute_dense_reward(self, state, action, info, ctx: TaskContext):
        # pose-based reward (reference :505-537)
        z = self._z_euler(ctx.actor_pose("tee").q)
        rot_rew = jnp.cos(z - self.goal_z_rot)
        reward = (((rot_rew + 1.0) / 2.0) ** 2) / 2.0

        d = jnp.linalg.norm(
            ctx.actor_pose("tee").p[:2] - ctx.actor_pose("goal_tee").p[:2]
        )
        reward = reward + ((1.0 - jnp.tanh(5.0 * d)) ** 2) / 2.0

        tcp_d = jnp.linalg.norm(ctx.actor_pose("tee").p - ctx.tcp_pose.p)
        reward = reward + jnp.sqrt(1.0 - jnp.tanh(5.0 * tcp_d) + 1e-12) / 20.0

        return jnp.where(info["success"], 3.0, reward)

    def compute_normalized_dense_reward(self, state, action, info, ctx):
        return self.compute_dense_reward(state, action, info, ctx) / 3.0
