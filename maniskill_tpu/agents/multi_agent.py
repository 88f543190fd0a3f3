"""Multi-agent support: several robots in one scene.

Parity port of the reference ``mani_skill/agents/multi_agent.py:11``
(``MultiAgent`` wrapping N sub-agents with per-agent action/obs dicts).
TPU-native realization: the sub-agents' kinematic trees merge into ONE
forest (kinematics/articulation.py ``merge_forest``) so all robots share
the engine's monolithic contact solve — no per-robot scene machinery.

The flat env action space is the concatenation of the sub-agents' action
spaces (the reference's ``Dict`` space flattened in sub-agent order);
``action_space_dict``/``split_action``/``proprioception`` expose the
per-agent views. v1 restriction: joint-space controllers only (task-space
EE controllers hold per-robot FK state that is not yet offset-aware).
"""
from __future__ import annotations

from dataclasses import replace as dc_replace
from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..kinematics.articulation import merge_forest
from ..kinematics.urdf import RobotSpec
from .base_agent import REGISTERED_AGENTS, BaseAgent
from .controllers.composite import CompositeController


def _prefix_spec(spec: RobotSpec, prefix: str) -> RobotSpec:
    """Rename every frame/link/joint of a spec with ``prefix`` so two
    identical robots coexist in one forest."""
    return dc_replace(
        spec,
        name=prefix + spec.name,
        frames={prefix + k: v for k, v in spec.frames.items()},
        link_index={prefix + k: v for k, v in spec.link_index.items()},
        joint_names=[prefix + n for n in spec.joint_names],
        link_names=[prefix + n for n in spec.link_names],
        base_link=prefix + spec.base_link,
    )


class MultiAgent:
    """N sub-agents acting in one scene (reference multi_agent.py)."""

    def __init__(self, uids: Sequence[str], control_mode=None):
        self.uids = list(uids)
        self.sub_agents: List[BaseAgent] = [
            REGISTERED_AGENTS[u](control_mode=control_mode) for u in uids
        ]
        self.control_mode = self.sub_agents[0].control_mode
        for a in self.sub_agents:
            for c in a.controller.controllers.values():
                if not hasattr(c, "joint_indices") or hasattr(c, "spec"):
                    raise NotImplementedError(
                        "MultiAgent v1 supports joint-space controllers only"
                    )
        self.nq = sum(a.nq for a in self.sub_agents)
        self._dof_offsets = np.cumsum(
            [0] + [a.nq for a in self.sub_agents]
        )[:-1]
        self._action_dims = [a.controller.action_dim
                             for a in self.sub_agents]
        self.action_dim = sum(self._action_dims)
        # flat action bounds (concat in agent order)
        self.action_low = np.concatenate(
            [a.controller.action_low for a in self.sub_agents]
        )
        self.action_high = np.concatenate(
            [a.controller.action_high for a in self.sub_agents]
        )
        self.balance_passive_force = all(
            a.balance_passive_force for a in self.sub_agents
        )
        self.ee_link_name = None  # per-agent; use tcp_pose_of
        self.keyframes = {}
        self.controller = _MultiController(self)

    # -- reference MultiAgent surface ----------------------------------
    @property
    def agents(self):
        return self.sub_agents

    def agent_prefix(self, i: int) -> str:
        return f"{self.uids[i]}-{i}:"

    def split_action(self, action):
        """Flat (A,) action -> list of per-agent actions."""
        out, off = [], 0
        for d in self._action_dims:
            out.append(action[..., off:off + d])
            off += d
        return out

    def proprioception(self, qpos, qvel):
        """Per-agent proprioception dict (reference get_proprioception
        returns {agent_uid: {...}})."""
        out = {}
        for i, a in enumerate(self.sub_agents):
            o = int(self._dof_offsets[i])
            out[f"{self.uids[i]}-{i}"] = a.proprioception(
                qpos[..., o:o + a.nq], qvel[..., o:o + a.nq]
            )
        return out

    def install(self, builder, base_poses: Sequence[np.ndarray],
                init_qpos: Sequence[np.ndarray] = None):
        """Merge all sub-agents into one forest robot and add it."""
        trees = []
        coll = []
        kps, kds, fls, inits = [], [], [], []
        for i, a in enumerate(self.sub_agents):
            pre = self.agent_prefix(i)
            spec = _prefix_spec(a.robot_spec, pre)
            trees.append((spec, np.asarray(base_poses[i], np.float32)))
            for g in a.collision_geoms():
                g = dict(g)
                g["link"] = pre + g["link"]
                coll.append(g)
            c = a.controller
            kps.append(c.kp)
            kds.append(c.kd)
            fls.append(c.force_limit)
            if init_qpos is not None:
                inits.append(np.asarray(init_qpos[i], np.float32))
            elif "rest" in a.keyframes:
                inits.append(np.asarray(a.keyframes["rest"].qpos,
                                        np.float32))
            else:
                inits.append(np.zeros(a.nq, np.float32))
        forest, tree_id, offs = merge_forest(
            trees, np.asarray(base_poses[0], np.float32)
        )
        assert list(offs) == list(self._dof_offsets)
        builder.add_robot(
            forest,
            np.asarray(base_poses[0], np.float32),
            collision_geoms=coll,
            init_qpos=np.concatenate(inits),
            balance_passive_force=self.balance_passive_force,
        )
        builder.set_drive_properties(
            np.concatenate(kps), np.concatenate(kds), np.concatenate(fls)
        )
        # cross-robot collisions: the builder skips same-tree pairs only;
        # the merge used ONE forest (tree 0), so enable robot-robot pairs
        # by marking per-agent tree ids
        builder._forest_tree_id = np.concatenate(
            [np.full(t[0].nb, i, np.int32) for i, t in enumerate(trees)]
        )

    def qpos_slice_of(self, i: int) -> slice:
        """qpos/qvel slice of agent i in the merged forest."""
        o = int(self._dof_offsets[i])
        return slice(o, o + self.sub_agents[i].nq)

    def tcp_pose_of(self, i: int, ctx):
        """TCP pose of sub-agent i via its (prefixed) ee link frame."""
        return ctx.frame_pose(
            self.agent_prefix(i) + self.sub_agents[i].ee_link_name
        )

    def build_grasp_checker_of(self, i: int, model, obj_name: str, **kw):
        """Grasp checker for sub-agent i against the MERGED scene model
        (reference ``self.left_agent.is_grasping(obj)`` in the two-robot
        tasks). The sub-agent's checker resolves finger links through its
        own ``robot_spec.link_index``; in the merged forest those links
        live under the agent prefix, so delegate with a link-index shim
        that maps the unprefixed names onto merged-forest indices."""
        sub = self.sub_agents[i]
        pre = self.agent_prefix(i)
        merged = model.robot.link_index
        shim = dc_replace(
            sub.robot_spec,
            link_index={k[len(pre):]: v for k, v in merged.items()
                        if k.startswith(pre)},
        )
        orig = sub.robot_spec
        sub.robot_spec = shim
        try:
            return sub.build_grasp_checker(model, obj_name, **kw)
        finally:
            sub.robot_spec = orig


class _MultiController:
    """Composite-of-composites over the merged dof space."""

    def __init__(self, ma: MultiAgent):
        self._ma = ma
        self.nq = ma.nq
        self.action_dim = ma.action_dim
        self.action_low = ma.action_low
        self.action_high = ma.action_high
        self.needs_fk_aux = False
        self.kp = np.concatenate([a.controller.kp for a in ma.sub_agents])
        self.kd = np.concatenate([a.controller.kd for a in ma.sub_agents])
        self.force_limit = np.concatenate(
            [a.controller.force_limit for a in ma.sub_agents]
        )

    def reset(self, qpos):
        from ..physics.model import DriveCmd

        return DriveCmd(
            target_qpos=jnp.asarray(qpos),
            target_qvel=jnp.zeros(self.nq),
            qf=jnp.zeros(self.nq),
        )

    def set_action(self, cmd, qpos, action, aux=None):
        ma = self._ma
        parts = ma.split_action(action)
        tq = cmd.target_qpos
        tv = jnp.zeros(self.nq)
        qf = None
        for i, (a, act) in enumerate(zip(ma.sub_agents, parts)):
            off = int(ma._dof_offsets[i])
            sub_cmd = cmd.replace(
                target_qpos=cmd.target_qpos[off:off + a.nq],
                target_qvel=cmd.target_qvel[off:off + a.nq],
                qf=cmd.qf[off:off + a.nq],
            )
            new_sub = a.controller.set_action(
                sub_cmd, qpos[off:off + a.nq], act
            )
            tq = tq.at[off:off + a.nq].set(new_sub.target_qpos)
            tv = tv.at[off:off + a.nq].set(new_sub.target_qvel)
            # static check: only torque controllers write qf
            if any(hasattr(c, "compute_qf")
                   for c in a.controller.controllers.values()):
                if qf is None:
                    qf = jnp.zeros(self.nq)
                qf = qf.at[off:off + a.nq].set(new_sub.qf)
        if qf is None:
            return cmd.replace(target_qpos=tq, target_qvel=tv)
        return cmd.replace(target_qpos=tq, target_qvel=tv, qf=qf)
