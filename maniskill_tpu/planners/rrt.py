"""RRT-Connect joint-space motion planner over the engine's collision model.

The TPU-native analogue of the reference's mplib/OMPL planner
(``mani_skill/examples/motionplanning/panda/motionplanner.py:120``
``move_to_pose_with_RRTConnect``): a bidirectional rapidly-exploring
random tree in joint space whose collision oracle is the engine's own
static candidate-point narrowphase — a batched jitted query, so every
RRT extension checks its whole interpolated segment in ONE device call
(the tree search itself is cheap host control flow; the device does the
geometry, which is where the work is).

Usage::

    from maniskill_tpu.planners.rrt import RRTConnect
    rrt = RRTConnect(env)                  # collision model from the env
    path = rrt.plan(q_start, q_goal, seed=0)   # (W, nq_plan) or None
    actions = rrt.path_to_actions(path)        # pd_joint_pos targets
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class RRTConnect:
    def __init__(
        self,
        env,
        joint_names: Optional[Sequence[str]] = None,
        exclude_body_names: Sequence[str] = (),
        contact_eps: float = 1e-4,
        step_size: float = 0.05,
        check_resolution: float = 0.02,
    ):
        """joint_names: the planned subset (default: the robot's actuated
        arm joints = every dof with nonzero drive kp); other dofs stay at
        their current values. exclude_body_names: free/kinematic bodies
        whose contacts are ignored (e.g. the object about to be grasped).
        """
        from ..physics.engine import _trace_metadata, compute_contacts, robot_fk
        from ..physics.model import BodyKind

        self.env = env
        model = env.model
        names = list(model.robot.joint_names)
        if joint_names is None:
            joint_names = [
                n for n, kp in zip(names, model.drive_kp) if kp > 0
            ]
        self.joint_idx = np.asarray([names.index(n) for n in joint_names])
        self.nq_plan = len(self.joint_idx)
        qlim = np.asarray(model.robot_qlim)
        self.lo = qlim[self.joint_idx, 0]
        self.hi = qlim[self.joint_idx, 1]
        self.step_size = step_size
        self.check_resolution = check_resolution

        # static mask: contact points involving the robot, minus excluded
        # counterparts (so grasp targets don't block approach plans)
        meta = _trace_metadata(model)
        meta_a, meta_b = meta[-2], meta[-1]
        excl_free = {
            model.free_index[n] for n in exclude_body_names
            if n in model.free_index
        }
        mask = np.zeros(len(meta_a), np.float32)
        for p, ((ka, ba), (kb, bb)) in enumerate(zip(meta_a, meta_b)):
            robot_side = BodyKind.ROBOT_LINK in (ka, kb)
            excluded = (ka == BodyKind.FREE and ba in excl_free) or (
                kb == BodyKind.FREE and bb in excl_free
            )
            if robot_side and not excluded:
                mask[p] = 1.0
        mask_j = jnp.asarray(mask)

        def deepest(sim, q_full):
            sim = sim.replace(qpos=q_full)
            body_pos, body_quat, _ = robot_fk(model, q_full)
            _, _, dep, *_ = compute_contacts(model, sim, body_pos, body_quat)
            return jnp.max(mask_j * dep) if mask.any() else jnp.float32(-1.0)

        @jax.jit
        def in_collision(sim, q_plan_batch, q_template):
            def one(qp):
                q_full = q_template.at[jnp.asarray(self.joint_idx)].set(qp)
                return deepest(sim, q_full) > contact_eps

            return jax.vmap(one)(q_plan_batch)

        self._in_collision = in_collision

    # -- host-side search -----------------------------------------------
    def _segment_free(self, sim, q_template, a, b):
        n = max(int(np.linalg.norm(b - a) / self.check_resolution), 1) + 1
        t = np.linspace(0.0, 1.0, n)[:, None]
        pts = a[None] * (1 - t) + b[None] * t
        col = np.asarray(self._in_collision(sim, jnp.asarray(pts),
                                            q_template))
        return not bool(col.any())

    def plan(
        self,
        q_start: np.ndarray,
        q_goal: np.ndarray,
        seed: int = 0,
        max_iters: int = 2000,
        smooth_iters: int = 60,
        env_index: int = 0,
    ) -> Optional[np.ndarray]:
        """Bidirectional RRT-Connect from q_start to q_goal (planned-subset
        coordinates, (nq_plan,)). Returns waypoints (W, nq_plan) or None."""
        sim = jax.tree.map(lambda x: x[env_index], self.env._state.sim)
        q_template = jnp.asarray(
            np.asarray(self.env._state.sim.qpos[env_index], np.float32)
        )
        rng = np.random.RandomState(seed)
        q_start = np.asarray(q_start, np.float64)
        q_goal = np.asarray(q_goal, np.float64)
        if not self._segment_free(sim, q_template, q_start, q_start):
            return None
        if not self._segment_free(sim, q_template, q_goal, q_goal):
            return None
        # trivial case
        if self._segment_free(sim, q_template, q_start, q_goal):
            path = np.stack([q_start, q_goal])
            return self._smooth(sim, q_template, path, rng, smooth_iters)

        trees: List[List[dict]] = [
            [dict(q=q_start, parent=-1)], [dict(q=q_goal, parent=-1)]
        ]

        def nearest(tree, q):
            d = [np.linalg.norm(n["q"] - q) for n in tree]
            return int(np.argmin(d))

        def extend(tree, q_rand):
            """Greedily extend toward q_rand; returns index of last added
            node or None."""
            i = nearest(tree, q_rand)
            last = None
            while True:
                q_near = tree[i]["q"]
                d = q_rand - q_near
                dist = np.linalg.norm(d)
                if dist < 1e-9:
                    return last
                q_new = (q_rand if dist <= self.step_size
                         else q_near + d / dist * self.step_size)
                if not self._segment_free(sim, q_template, q_near, q_new):
                    return last
                tree.append(dict(q=q_new, parent=i))
                i = len(tree) - 1
                last = i
                if np.linalg.norm(q_new - q_rand) < 1e-9:
                    return last

        for it in range(max_iters):
            a, b = (0, 1) if it % 2 == 0 else (1, 0)
            q_rand = rng.uniform(self.lo, self.hi)
            ia = extend(trees[a], q_rand)
            if ia is None:
                continue
            ib = extend(trees[b], trees[a][ia]["q"])
            if ib is not None and np.linalg.norm(
                trees[a][ia]["q"] - trees[b][ib]["q"]
            ) < 1e-9:
                # connected: walk both trees to the roots
                def walk(tree, i):
                    out = []
                    while i >= 0:
                        out.append(tree[i]["q"])
                        i = tree[i]["parent"]
                    return out

                pa = walk(trees[a], ia)[::-1]
                pb = walk(trees[b], ib)
                path = pa + pb[1:]
                if a == 1:
                    path = path[::-1]
                path = np.stack(path)
                return self._smooth(sim, q_template, path, rng, smooth_iters)
        return None

    def _smooth(self, sim, q_template, path, rng, iters):
        """Shortcut smoothing: replace random sub-segments by straight
        lines when collision-free (mplib-style post-processing)."""
        path = [p for p in path]
        for _ in range(iters):
            if len(path) <= 2:
                break
            i = rng.randint(0, len(path) - 1)
            j = rng.randint(0, len(path) - 1)
            if abs(i - j) < 2:
                continue
            i, j = min(i, j), max(i, j)
            if self._segment_free(sim, q_template, path[i], path[j]):
                path = path[: i + 1] + path[j:]
        return np.stack(path)

    def path_to_actions(self, path: np.ndarray,
                        max_joint_step: float = 0.05) -> np.ndarray:
        """Densify waypoints into a pd_joint_pos target sequence (T, nq_plan)
        bounded by max_joint_step per control step."""
        out = []
        for a, b in zip(path[:-1], path[1:]):
            n = max(int(np.abs(b - a).max() / max_joint_step), 1)
            t = np.linspace(0.0, 1.0, n + 1)[1:, None]
            out.append(a[None] * (1 - t) + b[None] * t)
        return np.concatenate(out).astype(np.float32)
