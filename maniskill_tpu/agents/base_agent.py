"""Agent layer: robot descriptors, controller assembly, proprioception.

TPU-native counterpart of the reference agent stack
(``mani_skill/agents/base_agent.py``): a robot class declares its URDF,
collision material overrides, extra primitive collision shapes (for mesh-only
links), keyframes, and controller configs; ``install`` wires it into a
SceneSpecBuilder with the selected control mode's drive gains.

Unlike the reference (stateful SAPIEN articulation wrapper), the runtime agent
here is a thin static object — all dynamic state lives in the env state
pytree; agent methods are pure functions over it.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..kinematics.urdf import RobotSpec, parse_urdf
from ..physics.model import SceneSpecBuilder
from ..physics.shapes import GeomType
from .controllers.base import (
    ControllerConfig,
    PDJointPosControllerConfig,
    PDJointVelControllerConfig,
    JointController,
)
from .controllers.composite import CompositeController

_GEOM_TYPE_BY_NAME = {
    "box": GeomType.BOX,
    "sphere": GeomType.SPHERE,
    "capsule": GeomType.CAPSULE,
    "plane": GeomType.PLANE,
}


@dataclass
class Keyframe:
    """Named robot configuration (reference base_agent.py:34)."""

    qpos: np.ndarray
    pose: np.ndarray = field(
        default_factory=lambda: np.array([0, 0, 0, 1, 0, 0, 0], dtype=np.float32)
    )


REGISTERED_AGENTS: Dict[str, type] = {}


def auto_capsule_collisions(
    spec, default_radius: float = 0.045, radius_map=None,
    tip_length: float = 0.08, friction: float = 0.3,
):
    """Generic primitive collision synthesis for mesh-only URDFs: one
    capsule per body spanning its origin to each child's joint anchor (the
    link's structural axis), plus a short tip capsule for leaf bodies.
    The TPU-native stand-in for convex-mesh collision (the reference cooks
    meshes through PhysX; this engine is primitive-narrowphase)."""
    radius_map = radius_map or {}
    out = []
    children = {b: [] for b in range(spec.nb)}
    for b in range(spec.nb):
        par = int(spec.parent[b])
        if par >= 0:
            children[par].append(b)
    for b in range(spec.nb):
        if spec.mass[b] <= 1e-5:
            continue  # massless synthetic frame (float_base chain links)
        name = spec.link_names[b]
        r = radius_map.get(name, default_radius)
        segs = [np.asarray(spec.joint_pos[c], np.float64)
                for c in children[b]]
        if not segs:
            segs = [np.array([0.0, 0.0, tip_length])]
        for seg in segs:
            L = float(np.linalg.norm(seg))
            if L < 1e-6:
                out.append(dict(link=name, type=_GEOM_TYPE_BY_NAME["sphere"],
                                size=np.array([r, 0, 0], np.float32),
                                offset_p=np.zeros(3, np.float32),
                                offset_q=np.array([1, 0, 0, 0], np.float32),
                                friction=friction))
                continue
            z = seg / L
            a = np.array([0.0, 0.0, 1.0])
            c = float(np.dot(a, z))
            if c > 1 - 1e-9:
                q = np.array([1.0, 0, 0, 0])
            elif c < -1 + 1e-9:
                q = np.array([0.0, 1.0, 0, 0])
            else:
                ax = np.cross(a, z)
                s_ = np.sqrt((1 + c) * 2)
                q = np.array([s_ / 2, *(ax / s_)])
            out.append(dict(
                link=name, type=_GEOM_TYPE_BY_NAME["capsule"],
                size=np.array([r, max(L / 2 - r / 2, 0.01), 0], np.float32),
                offset_p=(seg / 2).astype(np.float32),
                offset_q=q.astype(np.float32),
                friction=friction,
            ))
    return out


def register_agent(cls=None):
    """Agent registry decorator (reference agents/registration.py)."""

    def deco(c):
        REGISTERED_AGENTS[c.uid] = c
        return c

    return deco(cls) if cls is not None else deco


class BaseAgent:
    uid: str = "base"
    urdf_path: str = ""
    fix_root_link: bool = True  # False -> synthetic 6-dof floating root
    ee_link_name: Optional[str] = None
    keyframes: Dict[str, Keyframe] = {}
    # per-link friction override, e.g. {"panda_leftfinger": 2.0}
    link_friction: Dict[str, float] = {}
    default_friction: float = 0.3
    # extra primitive collisions for mesh-only links:
    # list of dicts {link, type, size, offset_p, offset_q, friction}
    extra_collisions: List[dict] = []
    # links whose URDF primitive collisions should be loaded (None = all)
    collision_links: Optional[Sequence[str]] = None
    # per-link: indices of URDF collision shapes to keep (None = all).
    # Contact candidates are a static budget on TPU; prune shapes that only
    # matter for self-collision or exotic poses.
    urdf_collision_filter: Dict[str, Sequence[int]] = {}

    balance_passive_force: bool = True  # reference base_agent.py:257

    def __init__(self, control_mode: Optional[str] = None):
        self.robot_spec: RobotSpec = self._make_robot_spec()
        self.nq = self.robot_spec.nb
        cfgs = self._controller_configs()
        if control_mode is None:
            control_mode = next(iter(cfgs))
        if control_mode not in cfgs:
            raise KeyError(
                f"unknown control mode {control_mode!r}; available: {list(cfgs)}"
            )
        self.control_mode = control_mode
        self.supported_control_modes = tuple(cfgs.keys())
        named = {}
        for name, cfg in cfgs[control_mode].items():
            cfg.joint_indices = self._resolve_joints(cfg.joint_names)
            named[name] = self._make_controller(cfg)
        self.controller = CompositeController(named, self.nq)

    # -- to override --------------------------------------------------------
    def _make_robot_spec(self) -> RobotSpec:
        """Default: parse the URDF; with ``fix_root_link = False`` the tree
        gets a synthetic 6-dof floating root (reference BaseAgent
        fix_root_link, base_agent.py — e.g. unitree G1 g1.py:16)."""
        spec = parse_urdf(self.urdf_path)
        if not getattr(self, "fix_root_link", True):
            from ..kinematics.urdf import float_base

            spec = float_base(spec)
        return spec

    def _controller_configs(self) -> Dict[str, Dict[str, ControllerConfig]]:
        raise NotImplementedError

    def _make_controller(self, cfg) -> JointController:
        from .controllers.ee import EEController, PDEEPosControllerConfig
        from .controllers.base import TorqueController, TorqueControllerConfig

        if isinstance(cfg, PDEEPosControllerConfig):
            return EEController(cfg, self)
        if isinstance(cfg, TorqueControllerConfig):
            return TorqueController(cfg)
        return JointController(cfg, self.robot_spec.qlim, self.nq)

    # -- helpers ------------------------------------------------------------
    def _resolve_joints(self, names: Sequence[str]) -> np.ndarray:
        order = {n: i for i, n in enumerate(self.robot_spec.joint_names)}
        return np.array([order[n] for n in names], dtype=np.int32)

    def collision_geoms(self) -> List[dict]:
        """Collision geoms for SceneSpecBuilder.add_robot: URDF primitives
        (with per-link materials applied) + declared extras."""
        out = []
        spec = self.robot_spec
        link_counts: Dict[str, int] = {}
        for body_i, cols in enumerate(spec.body_collisions):
            for (link_name, ctype, size, p, q) in cols:
                idx_in_link = link_counts.get(link_name, 0)
                link_counts[link_name] = idx_in_link + 1
                if (
                    self.collision_links is not None
                    and link_name not in self.collision_links
                ):
                    continue
                keep = self.urdf_collision_filter.get(link_name)
                if keep is not None and idx_in_link not in keep:
                    continue
                out.append(
                    dict(
                        link=spec.link_names[body_i],
                        type=_GEOM_TYPE_BY_NAME[ctype],
                        size=np.resize(np.asarray(size, np.float32), 3),
                        offset_p=p,
                        offset_q=q,
                        friction=self.link_friction.get(
                            link_name, self.default_friction
                        ),
                    )
                )
        for g in self.extra_collisions:
            g = dict(g)
            g.setdefault(
                "friction", self.link_friction.get(g["link"], self.default_friction)
            )
            out.append(g)
        return out

    def install(
        self,
        builder: SceneSpecBuilder,
        base_pose: np.ndarray,
        init_qpos: Optional[np.ndarray] = None,
    ):
        """Add this robot (with the active control mode's drive gains) to a
        scene spec."""
        if init_qpos is None and "rest" in self.keyframes:
            init_qpos = self.keyframes["rest"].qpos
        builder.add_robot(
            self.robot_spec,
            base_pose,
            collision_geoms=self.collision_geoms(),
            init_qpos=init_qpos,
            balance_passive_force=self.balance_passive_force,
        )
        c = self.controller
        builder.set_drive_properties(c.kp, c.kd, c.force_limit)

    # -- observation helpers (pure) ----------------------------------------
    def proprioception(self, qpos: jnp.ndarray, qvel: jnp.ndarray) -> dict:
        """qpos+qvel dict, mirroring reference ``get_proprioception``
        (base_agent.py:333)."""
        return dict(qpos=qpos, qvel=qvel)
