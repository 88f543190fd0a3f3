"""Scene model: static scene description + simulation state pytree.

This is the TPU-native replacement for the reference's scene layer
(``mani_skill/envs/scene.py`` + ``mani_skill/utils/structs``): where the
reference wraps opaque PhysX GPU buffers with torch views and explicit
apply/fetch round-trips (scene.py:941-977), here the state simply *is* a JAX
pytree (``SimState``) and the static scene description (``SceneModel``) is
closed over by the jitted step function. All reference semantics carried over:
batch-leading shapes, the 13-float actor state layout ``[p, q, lin_vel,
ang_vel]`` (structs/base.py:209), masked partial resets, merged heterogeneous
scenes via padding.

Bodies come in four kinds:
  * the robot articulation (generalized coordinates, fixed or mobile base)
  * free rigid bodies (13-dim state each)
  * kinematic bodies (pose settable, infinite mass — e.g. goal sites, tables)
  * static world geometry (ground plane)
"""
from __future__ import annotations

from dataclasses import dataclass, field
from enum import IntEnum
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..kinematics.urdf import JOINT_PRISMATIC, JOINT_REVOLUTE, RobotSpec
from .shapes import GeomType, contact_fn


class BodyKind(IntEnum):
    STATIC = 0
    KINEMATIC = 1
    FREE = 2
    ROBOT_LINK = 3


@dataclass(frozen=True)
class GeomSpec:
    """One collision geometry, attached to a body."""

    kind: BodyKind
    body: int  # robot body index / free index / kin index / static index
    gtype: GeomType
    size: np.ndarray  # (3,)
    offset_p: np.ndarray  # (3,) local offset in body frame
    offset_q: np.ndarray  # (4,)
    friction: float = 0.3
    name: str = ""
    hull: int = -1  # slot into the per-env hull tables (gtype == HULL)


@dataclass(frozen=True)
class SimParams:
    """Solver parameters (static). Loosely mirrors the reference's
    SceneConfig/SimConfig (``mani_skill/utils/structs/types.py:36-91``), with
    PhysX's iterative-solver knobs replaced by compliant-contact parameters."""

    dt: float = 0.01  # outer sim step (sim_freq=100, reference types.py:82)
    substeps: int = 1  # inner integrator substeps per sim step (the
    # velocity-level contact law is restitution-free and stable at h=10ms)
    gravity: Tuple[float, float, float] = (0.0, 0.0, -9.81)
    # -- contact law ---------------------------------------------------------
    # "velocity": TGS/Baumgarte velocity-level contact (PhysX-style, the
    #   reference solver's semantics, types.py:36-59): target normal velocity
    #   v* = beta*depth/h removes a fraction of penetration per substep with
    #   zero restitution by construction; separated points inside the margin
    #   get a speculative bound v* = depth/h (can't tunnel more than the gap
    #   in one substep). Constraint impedance d_n = contact_stiffness*h/beta
    #   (absolute, not mass-scaled) is folded implicitly into the solve LHS —
    #   static loads see an effective penetration stiffness of exactly
    #   contact_stiffness.
    # "spring": legacy compliant spring-damper (restitution ~0.46 at h=10ms;
    #   needs substeps=2; kept for A/B comparison).
    contact_mode: str = "velocity"
    contact_beta: float = 0.2  # Baumgarte: fraction of depth removed/substep
    # (β=0.5 chatters in a gripper squeeze: the pushout outruns the drive
    # influx and the contact limit-cycles, mm-scale per step — measured in
    # tools/sweep_contact.py; 0.2 is PhysX-typical and settles)
    # cap on the depenetration pushout velocity. With split impulse the bias
    # never enters the kinetic energy, so recovery is a monotone geometric
    # position correction (β·depth per substep) — the cap only guards
    # pathological spawn overlaps. Keeping it low throttles the static force
    # balance (force ∝ depth) and lets strong pushes bury objects.
    contact_bias_max: float = 10.0
    # under-relaxation of the warm-started impulse accumulators:
    # lam' = (1-relax)·lam + relax·f(v⁺). One linearized solve per substep
    # can't resolve the active-set switching a PGS loop iterates on; a full
    # update (relax=1) rings period-2 between clamp states (and limit-cycles
    # a two-finger squeeze into a ratchet). Relaxation damps the switching
    # transient; static convergence stays geometric at rate (1-relax).
    contact_relax: float = 0.5
    # effective penetration stiffness. Velocity mode folds it implicitly into
    # the LHS so near-rigid values are stable (a 100N-class arm pressing an
    # object against the table stalls at ~2mm penetration, like PhysX's
    # iterative near-rigid contact). 2e5 chatters in the gripper squeeze
    # (tools/sweep_contact.py sweep); 5e4 is the measured stable point with
    # sub-mm static penetration under 30N grip drives. Spring mode: 2e4.
    contact_stiffness: float = 5.0e4
    # mass-aware stiffness floor: per-pair k is raised to at least
    # m_eff*|g|/contact_ref_penetration so heavy bodies rest at the same
    # sub-mm penetration as light ones. Without it, a body much heavier
    # than contact_stiffness is tuned for (e.g. an 8 kg crate on a table:
    # 13 mm static budget) rocks itself sideways on its corner contacts —
    # the position-bias transients pump a diagonal-rocking limit cycle.
    contact_ref_penetration: float = 1.0e-4
    contact_damping_ratio: float = 1.0  # fraction of critical damping
    friction_vreg: float = 0.002  # m/s tangential regularization velocity
    joint_limit_stiffness: float = 4.0e3
    joint_limit_damping: float = 1.0e2
    contact_margin: float = 0.01  # activation margin (m): speculative band
    joint_friction_vreg: float = 0.02  # rad/s (or m/s) regularization of
    # dry joint friction: τ_f = -f·clip(q̇/vreg, -1, 1), slope folded into
    # the LHS inside the stiction band
    # free-body velocity clamps (PhysX parity: rigid bodies have
    # maxLinearVelocity / maxAngularVelocity ~1e2, which the reference
    # inherits). Without the angular clamp the EXPLICIT gyroscopic term is
    # super-exponentially unstable once a violent contact kicks |ω|h >> 1
    # (f32 rounding asymmetry of R·I·Rᵀ makes ω×I_wω ∝ |ω|² non-zero even
    # for isotropic inertias) — observed as a 1-in-1e3-envs NaN blow-up
    # under sustained random-action flailing.
    max_lin_vel: float = 25.0  # m/s (any legitimate tabletop/
    # locomotion speed is <5; the cap bounds contact energy injection)
    max_ang_vel: float = 50.0  # rad/s (PhysX default maxAngularVelocity=100;
    # 50 keeps |ω|·h ≤ 0.5 at h=10 ms, inside the explicit-gyro stable band)


@struct.dataclass
class SimState:
    """Per-environment simulation state (leading batch dims allowed).

    ``geom_size`` makes collision-geometry dimensions *state*: each env can
    carry different object sizes — the TPU-native answer to the reference's
    heterogeneous sub-scenes (``ActorBuilder.set_scene_idxs`` +
    ``Actor.merge``, SURVEY.md §2.10) with zero recompilation.
    """

    qpos: jnp.ndarray  # (nq,)
    qvel: jnp.ndarray  # (nq,)
    free_pose: jnp.ndarray  # (n_free, 7) [p, q_wxyz]
    free_vel: jnp.ndarray  # (n_free, 6) [lin_vel, ang_vel]  (ManiSkill layout)
    kin_pose: jnp.ndarray  # (n_kin, 7)
    geom_size: jnp.ndarray  # (n_geoms, 3) per-env collision sizes
    # warm-started contact impulses (per candidate point; static shape):
    # accumulated normal force (N) and tangential friction force vector.
    # These carry static contact loads across substeps so the converged
    # velocity state is truly zero — the temporal analogue of PhysX/TGS
    # iteration warm starting (without them, a one-shot implicit velocity
    # solve needs a persistent "phantom" velocity v = F/d_n to hold any
    # static force F, which leaks into the friction law and makes held
    # objects creep). Also gives true stiction: lam_t holds tangential loads
    # at zero slip, clamped to the Coulomb cone.
    contact_lam: jnp.ndarray  # (P,)
    contact_lam_t: jnp.ndarray  # (P, 3)
    # per-env free-body inertial properties (heterogeneous batches phase 2:
    # the reference's PickSingleYCB per-scene object variation,
    # pick_single_ycb.py:28,81-124, without recompilation). Initialized from
    # the model; tasks overwrite per episode.
    free_mass: jnp.ndarray  # (n_free,)
    free_inertia: jnp.ndarray  # (n_free, 3, 3) about CoM, body frame
    # per-env convex-hull collision tables (heterogeneous batches phase 3:
    # each env can hold a DIFFERENT convex object — the reference's
    # per-scene YCB mesh selection, pick_single_ycb.py:81-124 — selected by
    # writing rows from a static asset table; physics/hulls.py).
    hull_verts: jnp.ndarray = None  # (n_hull, HULL_P, 3) contact cloud
    hull_faces: jnp.ndarray = None  # (n_hull, HULL_F, 4) planes [n, d]
    # per-env geom-in-body offsets (round 3): together with geom_size this
    # makes the whole collision LAYOUT per-env state — each env can hold a
    # differently-proportioned articulated model (suitcase/laptop lid
    # lengths, valve spoke angles …) with zero recompiles. Defaults come
    # from GeomSpec.offset_p/offset_q.
    geom_pos: jnp.ndarray = None  # (n_geoms, 3)
    geom_quat: jnp.ndarray = None  # (n_geoms, 4)


class PairDrive(NamedTuple):
    """Resolved 6-DoF actor-pair drive (translational springs; reference
    analogue: PhysX D6 drive wrapped by ``mani_skill/utils/structs/drive.py``
    + ``ManiSkillScene.create_drive``, scene.py:469 — used e.g. for the
    robotiq closing-loop linkage, xarm6_robotiq.py:332-355).

    A critically-stable spring-damper pulls the anchor point fixed in body A
    toward the anchor point fixed in body B; the stiffness/damping are
    folded implicitly into the monolithic velocity solve (engine.py) so
    stiff drives hold at any dt. ``kind`` is a BodyKind for robot links /
    free bodies / static bodies, or -1 for a world-frame anchor."""

    kind_a: int
    body_a: int
    anchor_a: np.ndarray  # (3,) in A's body frame (world frame if kind=-1)
    kind_b: int
    body_b: int
    anchor_b: np.ndarray
    stiffness: float
    damping: float
    force_limit: float


@struct.dataclass
class DriveCmd:
    """PD drive command produced by the controller layer, consumed by the
    physics step (reference analogue: PhysX joint drive targets set by
    ``set_joint_drive_targets``, pd_joint_pos.py:69).

    Drive GAINS are part of the command (round 3): per-env, runtime-settable
    — the reference's ``ArticulationJoint.set_drive_property``
    (articulation_joint.py:25) without rebuilds. ``None`` falls back to the
    static model gains (legacy payloads); controllers materialize them at
    reset, ``BaseEnv.set_drive_properties`` overwrites them live."""

    target_qpos: jnp.ndarray  # (nq,)
    target_qvel: jnp.ndarray  # (nq,)
    qf: jnp.ndarray  # (nq,) extra generalized force
    kp: jnp.ndarray = None  # (nq,) drive stiffness
    kd: jnp.ndarray = None  # (nq,) drive damping
    force_limit: jnp.ndarray = None  # (nq,)


class SceneModel:
    """Static scene description. Instances are hashable-by-identity and closed
    over by jitted step functions; all ndarray members are numpy (host)
    constants."""

    def __init__(
        self,
        robot: Optional[RobotSpec],
        robot_base_pose: np.ndarray,
        free_names: List[str],
        free_mass: np.ndarray,
        free_inertia: np.ndarray,  # (n_free, 3, 3) about CoM (body frame)
        kin_names: List[str],
        static_names: List[str],
        static_pose: np.ndarray,  # (n_static, 7)
        geoms: List[GeomSpec],
        pairs: List[Tuple[int, int]],
        params: SimParams,
        drive_kp: np.ndarray,
        drive_kd: np.ndarray,
        drive_force_limit: np.ndarray,
        init_qpos: np.ndarray,
        robot_gravity: bool = False,
        gravity_mask: Optional[np.ndarray] = None,
        tree_id: Optional[np.ndarray] = None,
        art_dof_index: Optional[Dict[str, np.ndarray]] = None,
        drives: Optional[List["PairDrive"]] = None,
        hull_verts: Optional[np.ndarray] = None,  # (n_hull, HULL_V, 3)
        hull_faces: Optional[np.ndarray] = None,  # (n_hull, HULL_F, 4)
    ):
        from .hulls import HULL_F, HULL_P

        self.drives = list(drives) if drives else []
        self.hull_verts0 = (
            hull_verts.astype(np.float32) if hull_verts is not None
            else np.zeros((0, HULL_P, 3), np.float32)
        )
        self.hull_faces0 = (
            hull_faces.astype(np.float32) if hull_faces is not None
            else np.zeros((0, HULL_F, 4), np.float32)
        )
        self.n_hull = self.hull_verts0.shape[0]
        # geom index -> hull slot (-1 for non-hull geoms)
        self.geom_hull_slot = np.array(
            [g.hull for g in geoms], np.int32
        ) if geoms else np.zeros(0, np.int32)
        self.robot = robot
        self.robot_base_pose = robot_base_pose.astype(np.float32)
        self.free_names = free_names
        self.free_mass = free_mass.astype(np.float32)
        self.free_inertia = free_inertia.astype(np.float32)
        self.kin_names = kin_names
        self.static_names = static_names
        self.static_pose = static_pose.astype(np.float32)
        self.geoms = geoms
        self.pairs = pairs
        self.params = params
        self.drive_kp = drive_kp.astype(np.float32)
        self.drive_kd = drive_kd.astype(np.float32)
        self.drive_force_limit = drive_force_limit.astype(np.float32)
        self.init_qpos = init_qpos.astype(np.float32)
        # reference parity: ManiSkill disables gravity on robot links
        # (balance_passive_force, base_agent.py:272-276); robot_gravity=True
        # restores physical gravity on the arm. Articulated OBJECTS merged
        # into the kinematic forest always feel gravity — per-body scale in
        # ``gravity_mask`` (nb,).
        self.robot_gravity = robot_gravity
        nb = robot.nb if robot is not None else 0
        self.gravity_mask = (
            gravity_mask.astype(np.float32)
            if gravity_mask is not None
            else np.full(nb, 1.0 if robot_gravity else 0.0, np.float32)
        )
        # tree_id[b]: which kinematic tree of the forest body b belongs to
        # (0 = the robot); art_dof_index: articulation name -> dof indices
        self.tree_id = (
            tree_id if tree_id is not None else np.zeros(nb, np.int32)
        )
        self.art_dof_index = art_dof_index or {}

        self.nq = robot.nb if robot is not None else 0
        self.n_free = len(free_names)
        self.n_kin = len(kin_names)
        self.free_index = {n: i for i, n in enumerate(free_names)}
        self.kin_index = {n: i for i, n in enumerate(kin_names)}

        if robot is not None:
            # static ancestor mask: anc[b, j] = 1 if dof j actuates body b
            anc = np.zeros((robot.nb, robot.nb), dtype=np.float32)
            for b in range(robot.nb):
                j = b
                while j >= 0:
                    anc[b, j] = 1.0
                    j = int(robot.parent[j])
            self.ancestor_mask = anc
            # inertia about CoM in body frame (spec stores about body origin)
            Ic = []
            for i in range(robot.nb):
                c = robot.com[i]
                m = robot.mass[i]
                Ic.append(
                    robot.inertia[i]
                    - m * (np.dot(c, c) * np.eye(3) - np.outer(c, c))
                )
            self.robot_inertia_com = np.stack(Ic).astype(np.float32)
            self.robot_qlim = robot.qlim.astype(np.float32)
        else:
            self.ancestor_mask = np.zeros((0, 0), dtype=np.float32)
            self.robot_inertia_com = np.zeros((0, 3, 3), dtype=np.float32)
            self.robot_qlim = np.zeros((0, 2), dtype=np.float32)

        # Precompute per-pair static tables
        self._build_pair_tables()

    def _build_pair_tables(self):
        """Group contact pairs and precompute combined friction etc."""
        from .shapes import box_box_corners, box_box_onesided

        self.pair_table = []
        for (ia, ib) in self.pairs:
            ga, gb = self.geoms[ia], self.geoms[ib]
            fn, k, swapped = contact_fn(ga.gtype, gb.gtype)
            # box-box against a static/kinematic body: only the dynamic box's
            # corners can meaningfully penetrate -> one-sided 8-point test
            if (
                ga.gtype == GeomType.BOX
                and gb.gtype == GeomType.BOX
                and (ga.kind in (BodyKind.STATIC, BodyKind.KINEMATIC))
                != (gb.kind in (BodyKind.STATIC, BodyKind.KINEMATIC))
            ):
                if ga.kind in (BodyKind.STATIC, BodyKind.KINEMATIC):
                    ia, ib = ib, ia
                    ga, gb = gb, ga
                fn, k = box_box_onesided, 8
            elif (
                ga.gtype == GeomType.BOX
                and gb.gtype == GeomType.BOX
                and (ga.kind == BodyKind.ROBOT_LINK
                     or gb.kind == BodyKind.ROBOT_LINK)
            ):
                # finger pads vs objects: corners-only manifold is exact
                # for the smaller-on-larger face contact; the full 28-point
                # test (face centers) is only needed for FREE-FREE pairs
                # that can stack flush (shapes.py box_box docstring)
                fn, k = box_box_corners, 16
            mu = 0.5 * (ga.friction + gb.friction)  # PhysX default: average
            if swapped:
                # contact_fn resolved the REVERSED type order: store the
                # pair as (fn's A, fn's B) so poses/sizes and the returned
                # B->A normal line up with the meta side tables
                ia, ib = ib, ia
            self.pair_table.append((ia, ib, fn, k, False, mu))
        self.n_contact_points = sum(t[3] for t in self.pair_table)

        # Type-grouped pair table: all pairs sharing a contact function are
        # evaluated with ONE vmapped call (a TPU needs few big ops, not many
        # tiny ones). Groups ordered by function name for determinism.
        by_fn = {}
        for (ia, ib, fn, k, swapped, mu) in self.pair_table:
            by_fn.setdefault(fn.__name__, (fn, k, []))[2].append((ia, ib, mu))
        self.pair_groups = []
        for fname in sorted(by_fn):
            fn, k, entries = by_fn[fname]
            ia_arr = np.array([e[0] for e in entries], dtype=np.int32)
            ib_arr = np.array([e[1] for e in entries], dtype=np.int32)
            mu_arr = np.array([e[2] for e in entries], dtype=np.float32)
            self.pair_groups.append((fn, k, ia_arr, ib_arr, mu_arr))
        # total candidate contact points (static): sizes SimState.contact_lam
        self.n_points = sum(
            k * len(ia) for (_, k, ia, _, _) in self.pair_groups
        )

    # -- state helpers ------------------------------------------------------
    def initial_state(self) -> SimState:
        """Single-env zero state with robot at init_qpos."""
        free_pose = np.zeros((self.n_free, 7), dtype=np.float32)
        free_pose[:, 3] = 1.0
        kin_pose = np.zeros((self.n_kin, 7), dtype=np.float32)
        kin_pose[:, 3] = 1.0
        gsize = (
            np.stack([g.size for g in self.geoms]).astype(np.float32)
            if self.geoms
            else np.zeros((0, 3), np.float32)
        )
        return SimState(
            qpos=jnp.asarray(self.init_qpos),
            qvel=jnp.zeros(self.nq),
            free_pose=jnp.asarray(free_pose),
            free_vel=jnp.zeros((self.n_free, 6)),
            kin_pose=jnp.asarray(kin_pose),
            geom_size=jnp.asarray(gsize),
            contact_lam=jnp.zeros(self.n_points),
            contact_lam_t=jnp.zeros((self.n_points, 3)),
            free_mass=jnp.asarray(self.free_mass),
            free_inertia=jnp.asarray(self.free_inertia),
            hull_verts=jnp.asarray(self.hull_verts0),
            hull_faces=jnp.asarray(self.hull_faces0),
            geom_pos=jnp.asarray(
                np.stack([g.offset_p for g in self.geoms]).astype(np.float32)
                if self.geoms else np.zeros((0, 3), np.float32)
            ),
            geom_quat=jnp.asarray(
                np.stack([g.offset_q for g in self.geoms]).astype(np.float32)
                if self.geoms else np.zeros((0, 4), np.float32)
            ),
        )

    def geom_indices(self, name: str):
        """Indices into the geom table (and SimState.geom_size rows) of all
        geoms belonging to the named body."""
        return [i for i, g in enumerate(self.geoms) if g.name == name]

    def batch_state(self, state: SimState, batch: int) -> SimState:
        return jax.tree.map(
            lambda x: jnp.broadcast_to(x, (batch,) + x.shape), state
        )


class SceneSpecBuilder:
    """Imperative builder used by tasks to assemble a SceneModel — the
    TPU-native analogue of the reference's ActorBuilder/SceneBuilder layer
    (``mani_skill/utils/building/actor_builder.py:191``)."""

    def __init__(self, params: SimParams = SimParams()):
        self.params = params
        self.robot: Optional[RobotSpec] = None
        self.robot_gravity = False
        self.robot_base_pose = np.array([0, 0, 0, 1, 0, 0, 0], dtype=np.float32)
        self.free_names: List[str] = []
        self.free_mass: List[float] = []
        self.free_inertia: List[np.ndarray] = []
        self.kin_names: List[str] = []
        self.static_names: List[str] = []
        self.static_pose: List[np.ndarray] = []
        self.geoms: List[GeomSpec] = []
        self._collision_enabled: List[bool] = []
        self._robot_adjacent: set = set()
        self.drive_kp = None
        self.drive_kd = None
        self.drive_force_limit = None
        self.init_qpos = None
        self._excluded_pairs: set = set()
        self._excluded_groups: list = []
        # articulated objects: (name, spec, world_pose, base_geoms,
        # link_geoms, init_qpos, gravity)
        self._articulations: list = []
        # actor-pair drives (resolved at build): see add_drive
        self._drives: list = []
        # per-env convex hull tables (one slot per HULL geom)
        self.hull_verts: List[np.ndarray] = []
        self.hull_faces: List[np.ndarray] = []

    # -- robot --------------------------------------------------------------
    def add_robot(
        self,
        spec: RobotSpec,
        base_pose: np.ndarray,
        collision_geoms: List[dict],
        init_qpos: Optional[np.ndarray] = None,
        balance_passive_force: bool = True,
    ):
        """collision_geoms: list of dicts with keys
        {link, type, size, offset_p, offset_q, friction}."""
        assert self.robot is None, "one robot per scene (use MultiAgent later)"
        self.robot = spec
        self.robot_gravity = not balance_passive_force
        self.robot_base_pose = np.asarray(base_pose, dtype=np.float32)
        for g in collision_geoms:
            link = g["link"]
            body_idx, fp, fq = spec.frame_of(link)
            off_p = np.asarray(g.get("offset_p", np.zeros(3)), dtype=np.float64)
            off_q = np.asarray(g.get("offset_q", [1, 0, 0, 0]), dtype=np.float64)
            # compose frame offset with geom offset
            from ..kinematics.urdf import _pose_mul

            p, q = _pose_mul(fp, fq, off_p, off_q)
            self.geoms.append(
                GeomSpec(
                    kind=BodyKind.ROBOT_LINK,
                    body=body_idx,
                    gtype=GeomType(g["type"]),
                    size=np.asarray(g["size"], dtype=np.float32),
                    offset_p=p.astype(np.float32),
                    offset_q=q.astype(np.float32),
                    friction=g.get("friction", 0.3),
                    name=f"robot:{link}",
                )
            )
            self._collision_enabled.append(True)
        self.init_qpos = (
            np.asarray(init_qpos, dtype=np.float32)
            if init_qpos is not None
            else np.zeros(spec.nb, dtype=np.float32)
        )
        # default drive gains (overridden by controller setup)
        self.drive_kp = np.zeros(spec.nb, dtype=np.float32)
        self.drive_kd = np.zeros(spec.nb, dtype=np.float32)
        self.drive_force_limit = np.full(spec.nb, 1e10, dtype=np.float32)

    def add_articulation(
        self,
        builder_or_tuple,
        pose: np.ndarray,
        gravity: bool = True,
    ) -> str:
        """Add an articulated OBJECT (cabinet, faucet, door ...) built with
        :class:`~maniskill_tpu.kinematics.articulation.ArticulationBuilder`.

        The object's kinematic tree is merged into the scene's forest at
        ``build()``; its dofs are appended after the robot's and are passive
        (zero drive gains). Reference analogue: URDF/ArticulationBuilder
        loading of PartNet-Mobility assets
        (mani_skill/utils/building/articulation_builder.py + articulations.py).
        """
        if hasattr(builder_or_tuple, "build"):
            spec, base_geoms, link_geoms, init_q = builder_or_tuple.build()
            name = builder_or_tuple.name
        else:
            spec, base_geoms, link_geoms, init_q = builder_or_tuple
            name = spec.name
        self._articulations.append(
            (name, spec, np.asarray(pose, np.float32), base_geoms,
             link_geoms, init_q, gravity)
        )
        return name

    def set_drive_properties(self, kp, kd, force_limit):
        self.drive_kp = np.broadcast_to(np.asarray(kp, np.float32), (self.robot.nb,)).copy()
        self.drive_kd = np.broadcast_to(np.asarray(kd, np.float32), (self.robot.nb,)).copy()
        self.drive_force_limit = np.broadcast_to(
            np.asarray(force_limit, np.float32), (self.robot.nb,)
        ).copy()

    # -- bodies -------------------------------------------------------------
    def add_free_body(
        self,
        name: str,
        mass: float,
        inertia: np.ndarray,
        geoms: List[dict],
    ) -> int:
        idx = len(self.free_names)
        self.free_names.append(name)
        self.free_mass.append(mass)
        self.free_inertia.append(np.asarray(inertia, dtype=np.float32))
        for g in geoms:
            self.geoms.append(
                GeomSpec(
                    kind=BodyKind.FREE,
                    body=idx,
                    gtype=GeomType(g["type"]),
                    size=np.asarray(g["size"], dtype=np.float32),
                    offset_p=np.asarray(g.get("offset_p", np.zeros(3)), np.float32),
                    offset_q=np.asarray(g.get("offset_q", [1, 0, 0, 0]), np.float32),
                    friction=g.get("friction", 0.3),
                    name=name,
                )
            )
            self._collision_enabled.append(g.get("collision", True))
        return idx

    def add_free_hull(self, name: str, asset, density: float = 1000.0,
                      friction: float = 0.3) -> int:
        """Free rigid body whose collision shape is a convex hull
        (physics/hulls.py HullAsset). The hull tables become per-env state,
        so tasks can swap the asset per episode (the reference's
        PickSingleYCB per-scene mesh selection, pick_single_ycb.py:81-124).
        Returns the free-body index."""
        idx = len(self.free_names)
        self.free_names.append(name)
        self.free_mass.append(asset.mass(density))
        self.free_inertia.append(asset.inertia(density))
        slot = len(self.hull_verts)
        self.hull_verts.append(asset.cpts)  # contact cloud, not raw verts
        self.hull_faces.append(asset.faces)
        self.geoms.append(
            GeomSpec(
                kind=BodyKind.FREE,
                body=idx,
                gtype=GeomType.HULL,
                size=np.asarray(asset.aabb_half, np.float32),
                offset_p=np.zeros(3, np.float32),
                offset_q=np.array([1, 0, 0, 0], np.float32),
                friction=friction,
                name=name,
                hull=slot,
            )
        )
        self._collision_enabled.append(True)
        return idx

    def add_kinematic_body(self, name: str, geoms: List[dict] = ()) -> int:
        idx = len(self.kin_names)
        self.kin_names.append(name)
        for g in geoms:
            self.geoms.append(
                GeomSpec(
                    kind=BodyKind.KINEMATIC,
                    body=idx,
                    gtype=GeomType(g["type"]),
                    size=np.asarray(g["size"], dtype=np.float32),
                    offset_p=np.asarray(g.get("offset_p", np.zeros(3)), np.float32),
                    offset_q=np.asarray(g.get("offset_q", [1, 0, 0, 0]), np.float32),
                    friction=g.get("friction", 0.3),
                    name=name,
                )
            )
            self._collision_enabled.append(g.get("collision", True))
        return idx

    def add_static_body(self, name: str, pose: np.ndarray, geoms: List[dict]) -> int:
        idx = len(self.static_names)
        self.static_names.append(name)
        self.static_pose.append(np.asarray(pose, dtype=np.float32))
        for g in geoms:
            self.geoms.append(
                GeomSpec(
                    kind=BodyKind.STATIC,
                    body=idx,
                    gtype=GeomType(g["type"]),
                    size=np.asarray(g["size"], dtype=np.float32),
                    offset_p=np.asarray(g.get("offset_p", np.zeros(3)), np.float32),
                    offset_q=np.asarray(g.get("offset_q", [1, 0, 0, 0]), np.float32),
                    friction=g.get("friction", 0.3),
                    name=name,
                )
            )
            self._collision_enabled.append(g.get("collision", True))
        return idx

    def add_drive(
        self,
        side_a,
        anchor_a,
        side_b,
        anchor_b,
        stiffness: float = 1e4,
        damping: float = 2e2,
        force_limit: float = 1e10,
    ):
        """Create a 6-DoF actor-pair drive (translational spring-damper)
        pulling the anchor fixed in side A toward the anchor fixed in side B
        — the TPU-native ``ManiSkillScene.create_drive`` (reference
        scene.py:469, structs/drive.py).

        ``side``: ``("robot", link_name)``, ``("free", body_name)``,
        ``("static", body_name)`` or ``"world"``. Anchors are body-frame
        points (world-frame for ``"world"``)."""
        self._drives.append((side_a, np.asarray(anchor_a, np.float64),
                             side_b, np.asarray(anchor_b, np.float64),
                             float(stiffness), float(damping),
                             float(force_limit)))

    def exclude_pair(self, name_a: str, name_b: str):
        self._excluded_pairs.add(frozenset((name_a, name_b)))

    def exclude_groups(self, patterns_a, patterns_b):
        """Exclude all pairs where one geom name matches any pattern in
        ``patterns_a`` (fnmatch) and the other matches ``patterns_b``. Used
        e.g. to drop unreachable candidates (tabletop robots can never touch
        the floor under the table) — the static analogue of PhysX collision
        groups + broadphase culling."""
        self._excluded_groups.append((tuple(patterns_a), tuple(patterns_b)))

    def _group_excluded(self, name_a: str, name_b: str) -> bool:
        from fnmatch import fnmatch

        for (pats_a, pats_b) in self._excluded_groups:
            a_in_a = any(fnmatch(name_a, p) for p in pats_a)
            b_in_b = any(fnmatch(name_b, p) for p in pats_b)
            if a_in_a and b_in_b:
                return True
            b_in_a = any(fnmatch(name_b, p) for p in pats_a)
            a_in_b = any(fnmatch(name_a, p) for p in pats_b)
            if b_in_a and a_in_b:
                return True
        return False

    # -- build --------------------------------------------------------------
    def build(self) -> SceneModel:
        # ---- merge articulated objects into one kinematic forest ----------
        robot = self.robot
        geoms = list(self.geoms)
        collision_enabled = list(self._collision_enabled)
        init_qpos = self.init_qpos
        drive_kp, drive_kd = self.drive_kp, self.drive_kd
        drive_flim = self.drive_force_limit
        tree_id = None
        gravity_mask = None
        art_dof_index: Dict[str, np.ndarray] = {}
        robot_base_pose = self.robot_base_pose
        if self._articulations:
            from ..kinematics.articulation import merge_forest

            trees = []
            grav_flags = []
            if robot is not None:
                trees.append((robot, self.robot_base_pose))
                grav_flags.append(1.0 if self.robot_gravity else 0.0)
            else:
                robot_base_pose = np.array([0, 0, 0, 1, 0, 0, 0], np.float32)
            init_parts = [init_qpos] if init_qpos is not None else []
            kp_parts = [drive_kp] if drive_kp is not None else []
            kd_parts = [drive_kd] if drive_kd is not None else []
            fl_parts = [drive_flim] if drive_flim is not None else []
            for (name, spec, pose, base_geoms, link_geoms, init_q,
                 grav) in self._articulations:
                off = sum(t[0].nb for t in trees)
                trees.append((spec, pose))
                grav_flags += [1.0 if grav else 0.0] * spec.nb
                art_dof_index[name] = np.arange(off, off + spec.nb)
                init_parts.append(init_q)
                kp_parts.append(np.zeros(spec.nb, np.float32))
                kd_parts.append(np.zeros(spec.nb, np.float32))
                fl_parts.append(np.full(spec.nb, 1e10, np.float32))
                # carcass geoms fixed in the world at the object's pose
                if base_geoms:
                    self.static_names.append(f"{name}:base")
                    self.static_pose.append(np.asarray(pose, np.float32))
                    sidx = len(self.static_names) - 1
                    for g in base_geoms:
                        geoms.append(GeomSpec(
                            kind=BodyKind.STATIC, body=sidx,
                            gtype=GeomType(g["type"]),
                            size=np.asarray(g["size"], np.float32),
                            offset_p=np.asarray(
                                g.get("offset_p", np.zeros(3)), np.float32),
                            offset_q=np.asarray(
                                g.get("offset_q", [1, 0, 0, 0]), np.float32),
                            friction=g.get("friction", 0.3),
                            name=f"{name}:base",
                        ))
                        collision_enabled.append(g.get("collision", True))
                for li, lg in enumerate(link_geoms):
                    for g in lg:
                        geoms.append(GeomSpec(
                            kind=BodyKind.ROBOT_LINK, body=off + li,
                            gtype=GeomType(g["type"]),
                            size=np.asarray(g["size"], np.float32),
                            offset_p=np.asarray(
                                g.get("offset_p", np.zeros(3)), np.float32),
                            offset_q=np.asarray(
                                g.get("offset_q", [1, 0, 0, 0]), np.float32),
                            friction=g.get("friction", 0.3),
                            name=spec.link_names[li],
                        ))
                        collision_enabled.append(g.get("collision", True))
            # grav flags were appended per-BODY for objects but per-TREE for
            # the robot: expand the robot flag
            if robot is not None:
                grav_flags = (
                    [grav_flags[0]] * robot.nb + grav_flags[1:]
                )
            forest, tree_id, _offs = merge_forest(trees, robot_base_pose)
            gravity_mask = np.asarray(grav_flags, np.float32)
            assert gravity_mask.shape[0] == forest.nb
            robot = forest
            init_qpos = np.concatenate(
                [np.asarray(p, np.float32) for p in init_parts]
            ) if init_parts else np.zeros(forest.nb, np.float32)
            drive_kp = np.concatenate(kp_parts) if kp_parts else None
            drive_kd = np.concatenate(kd_parts) if kd_parts else None
            drive_flim = np.concatenate(fl_parts) if fl_parts else None

        robot_tree = getattr(self, "_forest_tree_id", None)

        def _tree_of(body: int) -> int:
            if body < 0:
                return 0
            if tree_id is not None:
                # articulation merge: robot bodies are tree 0 unless the
                # robot itself is a multi-agent forest
                t = int(tree_id[body])
                if t == 0 and robot_tree is not None and body < len(robot_tree):
                    return -1 - int(robot_tree[body])  # distinct negatives
                return t
            if robot_tree is not None and body < len(robot_tree):
                return -1 - int(robot_tree[body])
            return 0

        pairs = []
        n = len(geoms)
        for i in range(n):
            for j in range(i + 1, n):
                gi, gj = geoms[i], geoms[j]
                if not (collision_enabled[i] and collision_enabled[j]):
                    continue
                # never collide two non-dynamic geoms
                both_static = gi.kind in (BodyKind.STATIC, BodyKind.KINEMATIC) and gj.kind in (
                    BodyKind.STATIC,
                    BodyKind.KINEMATIC,
                )
                if both_static:
                    continue
                if gi.kind == BodyKind.ROBOT_LINK and gj.kind == BodyKind.ROBOT_LINK:
                    # same-tree self-collision off (reference tasks rely on
                    # PhysX srdf filtering; revisit for humanoids) — but
                    # CROSS-tree contacts (robot vs cabinet drawer) are real
                    if _tree_of(gi.body) == _tree_of(gj.body):
                        continue
                if frozenset((gi.name, gj.name)) in self._excluded_pairs:
                    continue
                if self._group_excluded(gi.name, gj.name):
                    continue
                # canonical order for contact_fn (lower gtype first)
                if gi.gtype <= gj.gtype:
                    pairs.append((i, j))
                else:
                    pairs.append((j, i))

        # ---- resolve actor-pair drives ------------------------------------
        free_index = {nm: i for i, nm in enumerate(self.free_names)}
        static_index = {nm: i for i, nm in enumerate(self.static_names)}

        def _resolve_side(side, anchor):
            if side == "world" or side is None:
                return -1, -1, anchor.astype(np.float32)
            tag, name = side
            if tag == "robot":
                assert robot is not None, "drive on robot link without robot"
                bi, fp, fq = robot.frame_of(name)
                from ..kinematics.urdf import _pose_mul

                p, _q = _pose_mul(fp, fq, anchor, np.array([1.0, 0, 0, 0]))
                return int(BodyKind.ROBOT_LINK), int(bi), p.astype(np.float32)
            if tag == "free":
                return (int(BodyKind.FREE), free_index[name],
                        anchor.astype(np.float32))
            if tag == "static":
                return (int(BodyKind.STATIC), static_index[name],
                        anchor.astype(np.float32))
            raise ValueError(f"unknown drive side {side!r}")

        drives = []
        for (sa, aa, sb, ab, kp_d, kd_d, fl_d) in self._drives:
            ka, ba, pa = _resolve_side(sa, aa)
            kb, bb, pb = _resolve_side(sb, ab)
            drives.append(PairDrive(ka, ba, pa, kb, bb, pb,
                                    kp_d, kd_d, fl_d))

        return SceneModel(
            robot=robot,
            robot_base_pose=robot_base_pose,
            free_names=self.free_names,
            free_mass=np.asarray(self.free_mass, dtype=np.float32)
            if self.free_mass
            else np.zeros(0, dtype=np.float32),
            free_inertia=np.stack(self.free_inertia)
            if self.free_inertia
            else np.zeros((0, 3, 3), dtype=np.float32),
            kin_names=self.kin_names,
            static_names=self.static_names,
            static_pose=np.stack(self.static_pose)
            if self.static_pose
            else np.zeros((0, 7), dtype=np.float32),
            geoms=geoms,
            pairs=pairs,
            params=self.params,
            drive_kp=drive_kp if drive_kp is not None else np.zeros(0),
            drive_kd=drive_kd if drive_kd is not None else np.zeros(0),
            drive_force_limit=drive_flim
            if drive_flim is not None
            else np.zeros(0),
            init_qpos=init_qpos if init_qpos is not None else np.zeros(0),
            robot_gravity=self.robot_gravity,
            gravity_mask=gravity_mask,
            tree_id=tree_id,
            art_dof_index=art_dof_index,
            drives=drives,
            hull_verts=np.stack(self.hull_verts) if self.hull_verts else None,
            hull_faces=np.stack(self.hull_faces) if self.hull_faces else None,
        )


# convenience geom dict constructors ----------------------------------------
def box_geom(size, offset_p=(0, 0, 0), offset_q=(1, 0, 0, 0), friction=0.3, collision=True):
    return dict(type=GeomType.BOX, size=np.asarray(size), offset_p=offset_p,
                offset_q=offset_q, friction=friction, collision=collision)


def sphere_geom(radius, offset_p=(0, 0, 0), friction=0.3, collision=True):
    return dict(type=GeomType.SPHERE, size=np.array([radius, 0, 0]),
                offset_p=offset_p, friction=friction, collision=collision)


def capsule_geom(radius, half_length, offset_p=(0, 0, 0), offset_q=(1, 0, 0, 0),
                 friction=0.3, collision=True):
    return dict(type=GeomType.CAPSULE, size=np.array([radius, half_length, 0]),
                offset_p=offset_p, offset_q=offset_q, friction=friction,
                collision=collision)


def plane_geom(friction=0.3, collision=True):
    return dict(type=GeomType.PLANE, size=np.zeros(3), friction=friction,
                collision=collision)
