"""Programmatic articulation construction (ArticulationBuilder).

TPU-native analogue of the reference's
``mani_skill/utils/building/articulation_builder.py``: assemble articulated
OBJECTS (cabinets, faucets, doors ...) link by link. The result is a small
:class:`~maniskill_tpu.kinematics.urdf.RobotSpec` tree plus collision-geom
dicts, consumed by ``SceneSpecBuilder.add_articulation`` which merges every
articulation into ONE kinematic forest: the engine's tree machinery
(prefix/suffix sums, ancestor masks, CRBA, joint limits) already handles
multiple roots, so N articulations share the robot's monolithic contact
solve with zero solver changes — the reference needs PhysX articulation
instancing + ``Articulation.merge`` (structs/articulation.py) for the same.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from .urdf import (
    JOINT_PRISMATIC,
    JOINT_REVOLUTE,
    RobotSpec,
    _pose_mul,
    _quat_mul,
)


def _quat_conj(q):
    return np.array([q[0], -q[1], -q[2], -q[3]], dtype=np.float64)


def _rot(q, v):
    w, x, y, z = q
    u = np.array([x, y, z])
    return v + 2.0 * (w * np.cross(u, v) + np.cross(u, np.cross(u, v)))


def pose_inv(p, q):
    qi = _quat_conj(q)
    return -_rot(qi, np.asarray(p, np.float64)), qi


@dataclass
class _Link:
    name: str
    parent: int  # index into links; -1 = articulation base (fixed root)
    joint_type: int
    joint_pos: np.ndarray
    joint_quat: np.ndarray
    axis: np.ndarray
    mass: float
    com: np.ndarray
    inertia: np.ndarray
    qlim: Tuple[float, float]
    damping: float
    friction: float
    geoms: List[dict] = field(default_factory=list)


class ArticulationBuilder:
    """Build an articulated object programmatically.

    Example (drawer)::

        ab = ArticulationBuilder("cabinet")
        drawer = ab.add_prismatic_link(
            "drawer", parent=None, axis=(1, 0, 0), limits=(0.0, 0.3),
            joint_pose=((0, 0, 0.4), (1, 0, 0, 0)),
            mass=1.0, damping=5.0)
        ab.add_geom(drawer, box_geom([0.18, 0.18, 0.08]))
        spec, geoms, init_qpos = ab.build()
    """

    def __init__(self, name: str):
        self.name = name
        self.links: List[_Link] = []
        self.static_geoms: List[dict] = []  # attached to the fixed base
        self.init_qpos: List[float] = []

    def _add_link(
        self, name, parent, jtype, axis, limits, joint_pose, mass, com,
        inertia, damping, friction, init_q,
    ) -> int:
        jp, jq = joint_pose
        if inertia is None:
            # crude box-ish default inertia; tasks override for fidelity
            inertia = np.eye(3) * (mass * 0.01 + 1e-4)
        self.links.append(
            _Link(
                name=name,
                parent=-1 if parent is None else int(parent),
                joint_type=jtype,
                joint_pos=np.asarray(jp, np.float64),
                joint_quat=np.asarray(jq, np.float64),
                axis=np.asarray(axis, np.float64),
                mass=float(mass),
                com=np.asarray(com, np.float64),
                inertia=np.asarray(inertia, np.float64),
                qlim=(float(limits[0]), float(limits[1])),
                damping=float(damping),
                friction=float(friction),
            )
        )
        self.init_qpos.append(float(init_q))
        return len(self.links) - 1

    def add_revolute_link(
        self, name, parent=None, axis=(0, 0, 1), limits=(-1.57, 1.57),
        joint_pose=((0, 0, 0), (1, 0, 0, 0)), mass=1.0, com=(0, 0, 0),
        inertia=None, damping=0.1, friction=0.0, init_q=0.0,
    ) -> int:
        return self._add_link(name, parent, JOINT_REVOLUTE, axis, limits,
                              joint_pose, mass, com, inertia, damping,
                              friction, init_q)

    def add_prismatic_link(
        self, name, parent=None, axis=(1, 0, 0), limits=(0.0, 0.3),
        joint_pose=((0, 0, 0), (1, 0, 0, 0)), mass=1.0, com=(0, 0, 0),
        inertia=None, damping=0.1, friction=0.0, init_q=0.0,
    ) -> int:
        return self._add_link(name, parent, JOINT_PRISMATIC, axis, limits,
                              joint_pose, mass, com, inertia, damping,
                              friction, init_q)

    def add_geom(self, link: int, geom: dict):
        self.links[link].geoms.append(geom)

    def add_base_geom(self, geom: dict):
        """Collision geometry fixed to the articulation base (e.g. the
        cabinet carcass around a drawer)."""
        self.static_geoms.append(geom)

    def build(self):
        """Returns (RobotSpec tree, base_geoms, link_geoms, init_qpos).

        ``link_geoms[i]`` is the geom-dict list of movable link i;
        names inside the spec are ``{articulation}:{link}``.
        """
        nb = len(self.links)
        frames: Dict[str, Tuple[int, np.ndarray, np.ndarray]] = {}
        link_index: Dict[str, int] = {}
        for i, l in enumerate(self.links):
            full = f"{self.name}:{l.name}"
            link_index[full] = i
            frames[full] = (i, np.zeros(3), np.array([1.0, 0, 0, 0]))
        spec = RobotSpec(
            name=self.name,
            nb=nb,
            parent=np.array([l.parent for l in self.links], np.int32),
            joint_type=np.array([l.joint_type for l in self.links], np.int32),
            joint_pos=np.stack([l.joint_pos for l in self.links]),
            joint_quat=np.stack([l.joint_quat for l in self.links]),
            axis=np.stack([l.axis for l in self.links]),
            mass=np.array([l.mass for l in self.links]),
            com=np.stack([l.com for l in self.links]),
            inertia=np.stack(
                [
                    l.inertia
                    + l.mass
                    * (np.dot(l.com, l.com) * np.eye(3)
                       - np.outer(l.com, l.com))
                    for l in self.links
                ]
            ),  # spec stores inertia about body ORIGIN (model.py converts)
            qlim=np.array([l.qlim for l in self.links]),
            effort=np.full(nb, 1e3),
            vel_limit=np.full(nb, 1e3),
            joint_damping=np.array([l.damping for l in self.links]),
            joint_friction=np.array([l.friction for l in self.links]),
            frames=frames,
            link_index=link_index,
            joint_names=[f"{self.name}:{l.name}_joint" for l in self.links],
            link_names=[f"{self.name}:{l.name}" for l in self.links],
            base_link=f"{self.name}:base",
        )
        return (
            spec,
            list(self.static_geoms),
            [list(l.geoms) for l in self.links],
            np.asarray(self.init_qpos, np.float32),
        )


def merge_forest(
    trees: List[Tuple[RobotSpec, np.ndarray]],
    base_pose: np.ndarray,
) -> Tuple[RobotSpec, np.ndarray, np.ndarray]:
    """Merge (spec, world_base_pose) trees into ONE forest RobotSpec whose
    roots carry baked base offsets relative to ``base_pose`` (the shared FK
    base). Returns (forest_spec, tree_id (nb,), dof_offset per tree)."""
    base_p = np.asarray(base_pose[:3], np.float64)
    base_q = np.asarray(base_pose[3:7], np.float64)
    inv_p, inv_q = pose_inv(base_p, base_q)

    fields = dict(parent=[], joint_type=[], joint_pos=[], joint_quat=[],
                  axis=[], mass=[], com=[], inertia=[], qlim=[], effort=[],
                  vel_limit=[], joint_damping=[], joint_friction=[])
    frames: Dict[str, Tuple[int, np.ndarray, np.ndarray]] = {}
    link_index: Dict[str, int] = {}
    joint_names: List[str] = []
    link_names: List[str] = []
    tree_id = []
    dof_offsets = []
    off = 0
    for t, (spec, pose) in enumerate(trees):
        dof_offsets.append(off)
        tp = np.asarray(pose[:3], np.float64)
        tq = np.asarray(pose[3:7], np.float64)
        rel_p, rel_q = _pose_mul(inv_p, inv_q, tp, tq)
        for i in range(spec.nb):
            par = int(spec.parent[i])
            fields["parent"].append(off + par if par >= 0 else -1)
            fields["joint_type"].append(int(spec.joint_type[i]))
            jp = np.asarray(spec.joint_pos[i], np.float64)
            jq = np.asarray(spec.joint_quat[i], np.float64)
            if par < 0:
                jp, jq = _pose_mul(rel_p, rel_q, jp, jq)
            fields["joint_pos"].append(jp)
            fields["joint_quat"].append(jq)
            fields["axis"].append(spec.axis[i])
            fields["mass"].append(spec.mass[i])
            fields["com"].append(spec.com[i])
            fields["inertia"].append(spec.inertia[i])
            fields["qlim"].append(spec.qlim[i])
            fields["effort"].append(spec.effort[i])
            fields["vel_limit"].append(spec.vel_limit[i])
            fields["joint_damping"].append(spec.joint_damping[i])
            fields["joint_friction"].append(spec.joint_friction[i])
            tree_id.append(t)
        for name, (bi, fp, fq) in spec.frames.items():
            if bi < 0 and t > 0:
                # fixed frame on a secondary tree's base: bake world offset
                fp2, fq2 = _pose_mul(rel_p, rel_q, np.asarray(fp, np.float64),
                                     np.asarray(fq, np.float64))
                frames[name] = (-1, fp2, fq2)
            else:
                frames[name] = (bi + off if bi >= 0 else -1, fp, fq)
        for name, bi in spec.link_index.items():
            link_index[name] = bi + off
        joint_names += list(spec.joint_names)
        link_names += list(spec.link_names)
        off += spec.nb

    forest = RobotSpec(
        name="+".join(s.name for s, _ in trees),
        nb=off,
        parent=np.asarray(fields["parent"], np.int32),
        joint_type=np.asarray(fields["joint_type"], np.int32),
        joint_pos=np.stack(fields["joint_pos"]),
        joint_quat=np.stack(fields["joint_quat"]),
        axis=np.stack(fields["axis"]),
        mass=np.asarray(fields["mass"]),
        com=np.stack(fields["com"]),
        inertia=np.stack(fields["inertia"]),
        qlim=np.stack(fields["qlim"]),
        effort=np.asarray(fields["effort"]),
        vel_limit=np.asarray(fields["vel_limit"]),
        joint_damping=np.asarray(fields["joint_damping"]),
        joint_friction=np.asarray(fields["joint_friction"]),
        frames=frames,
        link_index=link_index,
        joint_names=joint_names,
        link_names=link_names,
        base_link=trees[0][0].base_link,
    )
    return forest, np.asarray(tree_id, np.int32), np.asarray(dof_offsets)
