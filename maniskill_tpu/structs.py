"""Batched object-struct views: the reference's user-facing object model.

Reference analogue: ``mani_skill/utils/structs/`` (``Actor``,
``Articulation``, ``Link``, ``ArticulationJoint`` — python views over the
PhysX GPU buffers, SURVEY §2.2). In the TPU design the state IS the env's
pytree, so these views are thin named lenses over ``env._state``: reads
slice the batched arrays, writes produce a new state pytree and store it
back on the env (the functional analogue of the reference's masked GPU
setters). All quantities carry the leading ``num_envs`` batch dim, same as
the reference's torch tensors.

Usage::

    scene = env.scene                    # ManiSkillScene-analogue view
    cube = scene.actors["cube"]
    cube.pose.p                          # (B, 3)
    cube.set_pose(new_pose_raw)          # (B, 7) write-back
    robot = scene.articulations["robot"]
    robot.qpos                           # (B, nq_robot)
    link = robot.links_map["panda_hand"]
    link.pose.p                          # (B, 3) via FK
    link.bbox_half                       # (3,) collision AABB half extents
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .kinematics import chain
from .math.pose import Pose
from .physics.model import BodyKind


class ActorView:
    """Batched rigid-body view (reference ``structs/actor.py:25``)."""

    def __init__(self, env, name: str):
        self._env = env
        self.name = name
        self._idx = env.model.free_index[name]

    @property
    def pose(self) -> Pose:
        raw = self._env._state.sim.free_pose[:, self._idx]
        return Pose(raw[..., :3], raw[..., 3:7])

    @property
    def raw_pose(self) -> jnp.ndarray:
        return self._env._state.sim.free_pose[:, self._idx]

    @property
    def linear_velocity(self) -> jnp.ndarray:
        return self._env._state.sim.free_vel[:, self._idx, :3]

    @property
    def angular_velocity(self) -> jnp.ndarray:
        return self._env._state.sim.free_vel[:, self._idx, 3:]

    @property
    def mass(self) -> jnp.ndarray:
        return self._env._state.sim.free_mass[:, self._idx]

    def get_state(self) -> jnp.ndarray:
        """13-float layout [p, q, lin_vel, ang_vel] (reference
        ``actor.py:132`` contract)."""
        s = self._env._state.sim
        return jnp.concatenate(
            [s.free_pose[:, self._idx], s.free_vel[:, self._idx]], -1)

    def set_pose(self, raw_pose) -> None:
        st = self._env._state
        sim = st.sim.replace(
            free_pose=st.sim.free_pose.at[:, self._idx].set(
                jnp.asarray(raw_pose)))
        self._env._state = st.replace(sim=sim)

    def set_linear_velocity(self, v) -> None:
        st = self._env._state
        sim = st.sim.replace(
            free_vel=st.sim.free_vel.at[:, self._idx, :3].set(
                jnp.asarray(v)))
        self._env._state = st.replace(sim=sim)

    def set_angular_velocity(self, w) -> None:
        st = self._env._state
        sim = st.sim.replace(
            free_vel=st.sim.free_vel.at[:, self._idx, 3:].set(
                jnp.asarray(w)))
        self._env._state = st.replace(sim=sim)


class LinkView:
    """Batched articulation-link view (reference ``structs/link.py:27``):
    pose via shared FK, collision AABB from the link's primitive geoms."""

    def __init__(self, env, body_idx: int, name: str):
        self._env = env
        self.name = name
        self.index = body_idx

    def _fk(self):
        env = self._env
        st = env._state

        def one(sim):
            return chain.fk(env.model.robot,
                            jnp.asarray(env.model.robot_base_pose), sim.qpos)

        pos, quat, _ = jax.vmap(one)(st.sim)
        return pos, quat

    @property
    def pose(self) -> Pose:
        pos, quat = self._fk()
        return Pose(pos[:, self.index], quat[:, self.index])


    @property
    def bbox_half(self) -> np.ndarray:
        """AABB half-extents of the link's collision primitives in the
        link frame (reference Link mesh/bbox API, link.py:200s)."""
        from .physics.shapes import body_collision_aabb_half

        return body_collision_aabb_half(
            self._env.model.geoms, self.index, BodyKind.ROBOT_LINK)


class FrameView(LinkView):
    """Fused fixed-joint frame (e.g. ``panda_hand``): the URDF parser
    merges fixed links into their carrying body; pose comes from the
    stored frame offset, geoms from the carrying body."""

    def __init__(self, env, frame_name: str):
        bi, _, _ = env.model.robot.frames[frame_name]
        super().__init__(env, int(bi), frame_name)

    @property
    def pose(self) -> Pose:
        env = self._env

        def one(sim):
            pos, quat, _ = chain.fk(
                env.model.robot, jnp.asarray(env.model.robot_base_pose),
                sim.qpos)
            p, q = chain.frame_pose(
                env.model.robot, jnp.asarray(env.model.robot_base_pose),
                pos, quat, self.name)
            return p, q

        p, q = jax.vmap(one)(env._state.sim)
        return Pose(p, q)


class ArticulationView:
    """Batched articulation view (reference ``structs/articulation.py:24``):
    qpos/qvel/root pose + links/joints maps. ``dof_idx`` selects this
    articulation's slice of the merged forest."""

    def __init__(self, env, name: str, dof_idx: np.ndarray):
        self._env = env
        self.name = name
        self.dof_idx = np.asarray(dof_idx)

    @property
    def qpos(self) -> jnp.ndarray:
        return self._env._state.sim.qpos[:, self.dof_idx]

    @property
    def qvel(self) -> jnp.ndarray:
        return self._env._state.sim.qvel[:, self.dof_idx]

    @property
    def dof(self) -> int:
        return len(self.dof_idx)

    def set_qpos(self, q) -> None:
        st = self._env._state
        sim = st.sim.replace(
            qpos=st.sim.qpos.at[:, self.dof_idx].set(jnp.asarray(q)))
        self._env._state = st.replace(sim=sim)

    @property
    def links_map(self) -> Dict[str, LinkView]:
        # one joint per body in the forest: body indices == dof indices
        spec = self._env.model.robot
        own = set(int(d) for d in self.dof_idx)
        out = {
            n: LinkView(self._env, i, n)
            for i, n in enumerate(spec.link_names)
            if i in own
        }
        # fused fixed-joint frames on bodies we own (panda_hand etc.)
        for fname, (bi, _p, _q) in spec.frames.items():
            if int(bi) in own and fname not in out:
                out[fname] = FrameView(self._env, fname)
        return out

    def get_state(self) -> jnp.ndarray:
        """[qpos, qvel] slice (the root-pose prefix of the reference's
        13+2·dof layout is the fixed forest base here)."""
        return jnp.concatenate([self.qpos, self.qvel], -1)


class SceneView:
    """ManiSkillScene-analogue named access (reference ``envs/scene.py:39``
    minus the GPU buffer plumbing, which purity removes)."""

    def __init__(self, env):
        self._env = env

    @property
    def actors(self) -> Dict[str, ActorView]:
        return {
            n: ActorView(self._env, n)
            for n in self._env.model.free_index
        }

    @property
    def articulations(self) -> Dict[str, ArticulationView]:
        env = self._env
        out = {}
        if env.model.nq:
            robot_dofs = np.arange(env.agent.nq if hasattr(env.agent, "nq")
                                   else env.model.nq)
            out["robot"] = ArticulationView(env, "robot", robot_dofs)
        for name, idx in env.model.art_dof_index.items():
            out[name] = ArticulationView(env, name, idx)
        return out

    def get_sim_state(self) -> jnp.ndarray:
        """Flat batched sim state (reference ``scene.py:847``)."""
        s = self._env._state.sim
        parts = [s.qpos, s.qvel,
                 s.free_pose.reshape(s.free_pose.shape[0], -1),
                 s.free_vel.reshape(s.free_vel.shape[0], -1)]
        return jnp.concatenate(parts, -1)
