"""Batched articulated rigid-body dynamics engine.

TPU-native replacement for the PhysX GPU solver the reference drives through
``px.step()`` (``mani_skill/envs/scene.py:374``, SURVEY.md §2.9). Instead of an
iterative TGS constraint solver, this engine uses:

  * world-frame Plücker spatial algebra with the reference point at the robot
    base (conditioning: keeps the m·p² terms of the spatial inertias small),
  * a dense generalized-coordinate formulation: mass matrix ``M = Σ JᵀIJ``
    built from batched matmuls (MXU-friendly), Coriolis/centrifugal bias via a
    single ``jax.jvp`` through the velocity Jacobian (no sequential RNE),
  * implicit PD joint drives — the (kp·dt + kd)·dt term is folded into the LHS
    so the reference's stiff gains (kp=1e3, kd=1e2 at 100 Hz,
    panda.py:68-70) integrate stably,
  * compliant (penalty) contact with regularized Coulomb friction over a
    static candidate-point set, sub-stepped inside one sim step.

Everything here is a pure function of (SceneModel static, SimState pytree);
the env layer vmaps over the batch dimension and pjit-shards it across chips.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..math.rotations import (
    quat_apply,
    quat_exp,
    quat_mul,
    quat_normalize,
    quat_to_matrix,
)
from .model import BodyKind, DriveCmd, SceneModel, SimState
from .linalg import solve_psd_pair
from .spatial import (
    force_cross,
    motion_cross,
    point_force_to_wrench,
)
from ..kinematics.urdf import JOINT_REVOLUTE


# ---------------------------------------------------------------------------
# Forward kinematics (single env; callers vmap)
# ---------------------------------------------------------------------------


def robot_fk(model: SceneModel, qpos: jnp.ndarray):
    """Forward kinematics of the robot tree (delegates to
    :func:`maniskill_tpu.kinematics.chain.fk` — unrolled static-index form;
    see the note there on TPU gather/scatter cost)."""
    from ..kinematics import chain

    return chain.fk(model.robot, jnp.asarray(model.robot_base_pose), qpos)


def robot_jacobian(
    model: SceneModel,
    body_pos: jnp.ndarray,
    axis_w: jnp.ndarray,
    ref: jnp.ndarray,
) -> jnp.ndarray:
    """Spatial Jacobian J (nb, 6, nq) in Plücker coordinates at ``ref``.

    Column j for body b (if dof j is an ancestor of b):
      revolute:  [a_j; (w_j - ref) × a_j]
      prismatic: [0;   a_j]
    where w_j is the joint anchor (= body origin of body j).
    """
    return joint_columns_to_jacobian(model, joint_columns(model, body_pos, axis_w, ref))


def joint_columns(model: SceneModel, body_pos, axis_w, ref) -> jnp.ndarray:
    """Per-dof Plücker motion columns s_j (nq, 6)."""
    spec = model.robot
    anchors = body_pos - ref  # (nq, 3) joint anchor == body origin
    lin_rev = jnp.cross(anchors, axis_w)
    is_rev = jnp.asarray(
        (spec.joint_type == JOINT_REVOLUTE)[:, None], dtype=jnp.float32
    )
    ang = is_rev * axis_w
    lin = is_rev * lin_rev + (1.0 - is_rev) * axis_w
    return jnp.concatenate([ang, lin], axis=-1)  # (nq, 6)


def joint_columns_to_jacobian(model: SceneModel, cols: jnp.ndarray) -> jnp.ndarray:
    mask = jnp.asarray(model.ancestor_mask)  # (nb, nq)
    return mask[:, None, :] * cols.T[None, :, :]  # (nb, 6, nq)


def robot_frame_pose(model: SceneModel, body_pos, body_quat, frame_name: str):
    """World pose of a named frame (movable link or fused fixed frame)."""
    idx, off_p, off_q = model.robot.frame_of(frame_name)
    off_p = jnp.asarray(off_p, dtype=jnp.float32)
    off_q = jnp.asarray(off_q, dtype=jnp.float32)
    if idx < 0:
        bp = jnp.asarray(model.robot_base_pose[:3])
        bq = jnp.asarray(model.robot_base_pose[3:7])
    else:
        bp, bq = body_pos[idx], body_quat[idx]
    return bp + quat_apply(bq, off_p), quat_mul(bq, off_q)


# ---------------------------------------------------------------------------
# Geometry world poses + contact assembly
# ---------------------------------------------------------------------------


def _dyn_mass_of(model, g) -> float:
    """Static estimate of the dynamic mass behind a geom (for per-pair contact
    damping). Static/kinematic bodies -> inf."""
    if g.kind == BodyKind.FREE:
        return float(model.free_mass[g.body])
    if g.kind == BodyKind.ROBOT_LINK:
        return float(model.robot.mass[g.body]) if g.body >= 0 else np.inf
    return np.inf


def _geom_pose_tables(model: SceneModel):
    """Static per-geom tables for vectorized world-pose computation."""
    G = len(model.geoms)
    offs_p = np.stack([g.offset_p for g in model.geoms]) if G else np.zeros((0, 3))
    offs_q = np.stack([g.offset_q for g in model.geoms]) if G else np.zeros((0, 4))
    by_kind = {k: [] for k in BodyKind}
    for i, g in enumerate(model.geoms):
        by_kind[g.kind].append(i)
    return offs_p.astype(np.float32), offs_q.astype(np.float32), by_kind


def all_geom_poses(model: SceneModel, state: SimState, body_pos, body_quat):
    """World poses of every geom as (G,3), (G,4) arrays.

    One static-gather + batched compose per body kind, then assembled back
    into geom order with static slices (scatter-free: dynamic-update-slice is
    the slowest primitive on TPU). Geom-in-body offsets are per-env STATE
    (SimState.geom_pos/geom_quat) so each env can carry a differently-
    proportioned model; they fall back to the static tables for legacy
    states carrying None."""
    offs_p_st, offs_q_st, by_kind = model._geom_pose_cache
    G = len(model.geoms)
    if G == 0:
        return jnp.zeros((0, 3)), jnp.zeros((0, 4))
    offs_p = (state.geom_pos if state.geom_pos is not None
              else jnp.asarray(offs_p_st))
    offs_q = (state.geom_quat if state.geom_quat is not None
              else jnp.asarray(offs_q_st))
    parts = {}  # geom_idx -> (pos (3,), quat (4,))

    def place(idxs, parent_p, parent_q):
        if not idxs:
            return
        ii = np.asarray(idxs)
        op = offs_p[ii]
        oq = offs_q[ii]
        p = parent_p + quat_apply(parent_q, op)
        q = quat_mul(parent_q, oq)
        for pos_in_kind, gi in enumerate(idxs):
            parts[gi] = (p[pos_in_kind], q[pos_in_kind])

    rob = [i for i in by_kind[BodyKind.ROBOT_LINK] if model.geoms[i].body >= 0]
    if rob:
        bidx = np.asarray([model.geoms[i].body for i in rob])
        place(rob, body_pos[bidx], body_quat[bidx])
    rob_base = [i for i in by_kind[BodyKind.ROBOT_LINK] if model.geoms[i].body < 0]
    if rob_base:
        bp = jnp.asarray(model.robot_base_pose[:3])
        bq = jnp.asarray(model.robot_base_pose[3:7])
        place(rob_base, jnp.broadcast_to(bp, (len(rob_base), 3)),
              jnp.broadcast_to(bq, (len(rob_base), 4)))
    fr = by_kind[BodyKind.FREE]
    if fr:
        bidx = np.asarray([model.geoms[i].body for i in fr])
        place(fr, state.free_pose[bidx, :3], state.free_pose[bidx, 3:7])
    kin = by_kind[BodyKind.KINEMATIC]
    if kin:
        bidx = np.asarray([model.geoms[i].body for i in kin])
        place(kin, state.kin_pose[bidx, :3], state.kin_pose[bidx, 3:7])
    st = by_kind[BodyKind.STATIC]
    if st:
        sp = jnp.asarray(
            model.static_pose[np.asarray([model.geoms[i].body for i in st])]
        )
        place(st, sp[:, :3], sp[:, 3:7])
    gpos = jnp.stack([parts[i][0] for i in range(G)])
    gquat = jnp.stack([parts[i][1] for i in range(G)])
    return gpos, gquat


def compute_contacts(model: SceneModel, state: SimState, body_pos, body_quat):
    """Evaluate every static candidate pair; returns flat arrays over the
    fixed contact-point budget:
      pos (P,3), normal (P,3) [B→A], depth (P,), mu (P,), damping (P,), k (P,)
    plus the static per-point (kind, body) tables for both sides (numpy).

    Pairs are evaluated *grouped by contact function* — one vmapped call per
    geometry-type combination — so the op count is O(#types), not O(#pairs).
    """
    params = model.params
    k = params.contact_stiffness
    if not hasattr(model, "_geom_pose_cache"):
        model._geom_pose_cache = _geom_pose_tables(model)
    gsize = state.geom_size  # per-env sizes (heterogeneous batches)
    gpos, gquat = all_geom_poses(model, state, body_pos, body_quat)

    pos_l, nrm_l, dep_l, mu_l, c_l, k_l, m_l = [], [], [], [], [], [], []
    meta_a, meta_b = [], []  # (kind, body) per point
    for (fn, npts, ia_arr, ib_arr, mu_arr) in model.pair_groups:
        n_pairs = len(ia_arr)
        pa, qa = gpos[ia_arr], gquat[ia_arr]
        pb, qb = gpos[ib_arr], gquat[ib_arr]
        sa = gsize[ia_arr]
        sb = gsize[ib_arr]
        hargs = getattr(fn, "hull_args", None)
        if hargs is None:
            c = jax.vmap(fn)(pa, qa, sa, pb, qb, sb)  # (n_pairs, npts, ...)
        else:
            # convex-hull pairs additionally consume the per-env padded
            # vertex/face tables (SimState.hull_verts/hull_faces) of the
            # hull side(s) — static slot gathers, shapes stay fixed
            slot = model.geom_hull_slot
            extras = []
            if "a" in hargs:
                ha = slot[np.asarray(ia_arr)]
                extras += [state.hull_verts[ha], state.hull_faces[ha]]
            hb = slot[np.asarray(ib_arr)]
            extras += [state.hull_verts[hb], state.hull_faces[hb]]
            c = jax.vmap(fn)(pa, qa, sa, pb, qb, sb, *extras)
        pos_l.append(c.pos.reshape(-1, 3))
        nrm_l.append(c.normal.reshape(-1, 3))
        dep_l.append(c.depth.reshape(-1))
        # per-point material/solver coefficients (static)
        mu_pt, c_pt, k_pt_arr, m_pt_arr = [], [], [], []
        for j in range(n_pairs):
            ga, gb = model.geoms[ia_arr[j]], model.geoms[ib_arr[j]]
            m_eff = min(_dyn_mass_of(model, ga), _dyn_mass_of(model, gb))
            if not np.isfinite(m_eff):
                m_eff = 1.0
            m_pt = m_eff / npts
            # mass-aware stiffness floor (see SimParams.contact_ref_penetration)
            g_norm = float(np.linalg.norm(params.gravity))
            k_eff = max(k, m_eff * g_norm / params.contact_ref_penetration)
            k_pt = k_eff / npts
            damping = 2.0 * params.contact_damping_ratio * np.sqrt(k_pt * m_pt)
            mu_pt += [mu_arr[j]] * npts
            c_pt += [damping] * npts
            k_pt_arr += [k_pt] * npts
            m_pt_arr += [m_pt] * npts
            meta_a += [(ga.kind, ga.body)] * npts
            meta_b += [(gb.kind, gb.body)] * npts
        mu_l.append(jnp.asarray(np.asarray(mu_pt, np.float32)))
        c_l.append(jnp.asarray(np.asarray(c_pt, np.float32)))
        k_l.append(jnp.asarray(np.asarray(k_pt_arr, np.float32)))
        m_l.append(jnp.asarray(np.asarray(m_pt_arr, np.float32)))
    if not pos_l:
        z3 = jnp.zeros((0, 3))
        z = jnp.zeros(0)
        return z3, z3, z, z, z, z, z, [], []
    return (
        jnp.concatenate(pos_l),
        jnp.concatenate(nrm_l),
        jnp.concatenate(dep_l),
        jnp.concatenate(mu_l),
        jnp.concatenate(c_l),
        jnp.concatenate(k_l),
        jnp.concatenate(m_l),
        meta_a,
        meta_b,
    )


def _point_assignment(model: SceneModel, meta, kind: BodyKind, n_bodies: int):
    """Static one-hot (n_bodies, P) matrix assigning contact points to bodies
    of a given kind (robot links / free bodies). Accumulation becomes a single
    matmul — MXU-friendly and race-free."""
    P = len(meta)
    A = np.zeros((n_bodies, P), dtype=np.float32)
    for p, (kd, b) in enumerate(meta):
        if kd == kind and b >= 0:
            A[b, p] = 1.0
    return A


# ---------------------------------------------------------------------------
# The step function
# ---------------------------------------------------------------------------


def _assignment_tables(model: SceneModel):
    """Static one-hot point→body assignment matrices for both pair sides."""
    _, _, _, _, _, _, _, meta_a0, meta_b0 = _trace_metadata(model)
    nq = model.nq
    n_free = model.n_free
    return (
        _point_assignment(model, meta_a0, BodyKind.ROBOT_LINK, max(nq, 1)),
        _point_assignment(model, meta_b0, BodyKind.ROBOT_LINK, max(nq, 1)),
        _point_assignment(model, meta_a0, BodyKind.FREE, max(n_free, 1)),
        _point_assignment(model, meta_b0, BodyKind.FREE, max(n_free, 1)),
    )


def point_forces(
    model: SceneModel,
    state: SimState,
    body_pos,
    body_quat,
    v_body,
    tables,
):
    """Contact forces at every candidate point (force on side A, world frame).

    Returns ``(f_vel (P,3), f_pos (P,3), (lam', lam_t'), contact arrays)``.

    ``f_vel``/``f_pos`` are the split-impulse force pair: ``f_vel`` targets
    zero normal velocity (pure inelastic; what the velocity state integrates)
    and ``f_pos`` additionally carries the Baumgarte depenetration bias (what
    positions integrate and what contact queries report as the true load).
    Splitting keeps the bias out of the kinetic energy — the standard cure
    for Baumgarte limit cycles (Box2D split impulses / PhysX position
    iterations).

    ``relam(v_body_new, free_vel_new) -> (lam', lam_t')`` computes the
    updated warm-started impulse accumulators (see ``SimState.contact_lam``)
    from the POST-solve velocities: each substep applies
    ``f = max(lam + d_n·(v* − v_n), 0)`` folded implicitly into the solver
    LHS, and stores ``lam' = max(lam + d_n·(v* − v_n⁺), 0)`` — the impulse
    the implicit solve ACTUALLY delivered. (Storing the pre-solve explicit
    value instead re-applies, at the next substep, force the solve already
    declined to apply — at an impact that is a ~50× overestimate and
    launches the object.) This is sequential-impulse / TGS warm starting
    unrolled across substeps: static loads converge to being carried
    entirely by ``lam`` with v → 0, so a converged grasp/stack has NO
    phantom approach velocity and friction sees true zero slip (stiction
    via ``lam_t``, clamped to the Coulomb cone). TPU-native equivalent of
    PhysX's iterative contact solver whose output the reference exposes via
    ``gpu_create_contact_pair_impulse_query`` (scene.py:766-776).
    """
    params = model.params
    h = params.dt / params.substeps
    A_robot_a, A_robot_b, A_free_a, A_free_b = tables
    nq, n_free = model.nq, model.n_free
    ref = jnp.asarray(model.robot_base_pose[:3]) if model.robot else jnp.zeros(3)
    (cpos, cnrm, cdep, cmu, cdamp, ck, cm, _, _) = compute_contacts(
        model, state, body_pos, body_quat
    )
    P = cpos.shape[0]
    if P == 0:
        z = jnp.zeros(0)
        z3 = jnp.zeros((0, 3))
        return z3, z3, (lambda vb, fv: (z, z3)), (cpos, cnrm, cdep, z, z)

    rel_a = cpos - ref

    def side_point_vel(A_robot, A_free, vbody, fvel):
        if nq > 0:
            vb = A_robot.T @ vbody  # (P, 6)
            v_rob = vb[..., 3:] + jnp.cross(vb[..., :3], rel_a)
        else:
            v_rob = jnp.zeros((P, 3))
        if n_free > 0:
            fv = A_free.T @ fvel  # (P, 6) [lin, ang]
            fp = A_free.T @ state.free_pose[:, :3]
            v_fr = fv[:, :3] + jnp.cross(fv[:, 3:], cpos - fp)
        else:
            v_fr = jnp.zeros((P, 3))
        return v_rob + v_fr

    def point_vels(vbody, fvel):
        va = side_point_vel(
            jnp.asarray(A_robot_a), jnp.asarray(A_free_a), vbody, fvel
        )
        vb_ = side_point_vel(
            jnp.asarray(A_robot_b), jnp.asarray(A_free_b), vbody, fvel
        )
        v_rel = va - vb_
        v_n = jnp.sum(v_rel * cnrm, axis=-1)
        v_t = v_rel - v_n[:, None] * cnrm
        return v_n, v_t

    v_n, v_t = point_vels(v_body, state.free_vel)

    active = (cdep > -params.contact_margin).astype(cdep.dtype)
    if params.contact_mode == "velocity":
        # TGS/Baumgarte velocity-level contact (PhysX semantics, reference
        # types.py:36-59), warm-started across substeps (module docstring):
        # restitution-free at any h; speculative bound for separated points
        # inside the margin (no tunneling at h=10ms). Constraint impedance
        # d_n = k·h/β is absolute, NOT mass-scaled: a gripper squeezing a
        # light cube must not crush through it. The implicit LHS fold keeps
        # arbitrary stiffness stable.
        d_n0 = ck * h / params.contact_beta  # impulse-level gain (N·s/m)
        # depenetration pushout (position pass only; rate-capped)
        pen_bias = jnp.minimum(
            params.contact_beta * jnp.maximum(cdep, 0.0) / h,
            params.contact_bias_max,
        )
        # speculative approach bound for separated-in-margin points: may
        # close at most the full gap in one substep (≤ 0; 0 when touching)
        spec = jnp.minimum(cdep, 0.0) / h
        t_vel = spec  # 0 when penetrated (inelastic)
        t_pos = spec + pen_bias
        lam = state.contact_lam
        lam_t = state.contact_lam_t
        lam_t = lam_t - jnp.sum(lam_t * cnrm, axis=-1, keepdims=True) * cnrm

        def forces_at(v_n_, v_t_):
            """Normal/tangential contact forces at given point velocities
            (warm impulse + implicit correction, cone-clamped friction)."""
            f_n_vel_ = jnp.maximum(lam + d_n0 * (t_vel - v_n_), 0.0) * active
            f_n_pos_ = jnp.maximum(lam + d_n0 * (t_pos - v_n_), 0.0) * active
            # friction capacity from the true normal load. Separated points
            # have lam ≈ 0 and f_n_pos ≈ 0, so the speculative margin band
            # exerts no phantom drag without a depth gate (resting contacts
            # sit at depth → 0 under warm-started depenetration, so a
            # depth>0 gate would wrongly drop their friction).
            f_t_trial_ = lam_t - d_n0[:, None] * v_t_
            trial_norm_ = jnp.sqrt(
                jnp.sum(f_t_trial_ * f_t_trial_, axis=-1) + 1e-18
            )
            cap_ = cmu * f_n_pos_
            f_t_ = f_t_trial_ * jnp.minimum(1.0, cap_ / trial_norm_)[:, None]
            return f_n_vel_, f_n_pos_, f_t_, trial_norm_ <= cap_

        f_n_vel, f_n_pos, f_t, sticking = forces_at(v_n, v_t)
        # LHS impedance gate: points whose explicit force is positive OR
        # that carry warm-started load (lam > 0) stay in the implicit
        # solve. Gating on (f_n_vel > 0) alone drops a RESTING contact out
        # of the LHS whenever the pre-solve velocity is momentarily
        # separating (v_n > lam/d), so gravity free-falls the body back
        # down every other substep — a sustained ±g·h/2 velocity limit
        # cycle on every object at rest (breaks is_static success checks).
        # With the stored-load points kept implicit, the solve lands on
        # v⁺ ≈ 0 and relam contracts lam geometrically to the true static
        # load.
        loaded = (f_n_vel > 0) | ((lam > 0) & (active > 0))
        d_n = d_n0 * loaded
        # LHS coupling: full impedance while sticking; the regularized
        # Coulomb slope when sliding (force is velocity-independent along
        # the slip direction at the cone boundary).
        vt_norm = jnp.sqrt(
            jnp.sum(v_t * v_t, axis=-1) + params.friction_vreg**2
        )
        d_t = jnp.where(sticking, d_n0, cmu * f_n_pos / vt_norm) * loaded

        def relam(v_body_new, free_vel_new):
            """Store the impulses the implicit solve actually delivered:
            re-evaluate the force law at the POST-solve velocities (same
            positions/normals — only velocities changed), under-relaxed
            (see SimParams.contact_relax)."""
            v_n2, v_t2 = point_vels(v_body_new, free_vel_new)
            f_n_vel2, _, f_t2, _ = forces_at(v_n2, v_t2)
            a = params.contact_relax
            # memory only for TOUCHING points: a stored impulse applied while
            # separated (speculative band) pushes the object mid-air and
            # sustains a hover/launch limit cycle. Speculative contacts still
            # stop incoming velocity each substep — they just store nothing.
            # Ramped over 1mm (not a hard depth>0 gate): warm-started
            # depenetration drives resting depth to exactly 0, where a hard
            # gate flickers the whole accumulated load on/off (a settled
            # gripper squeeze re-grips every ~15 steps); the ramp decays
            # separated memory geometrically instead, so hover still dies.
            touch = jnp.clip(1.0 + cdep / 1e-3, 0.0, 1.0)
            lam2 = jnp.maximum((1 - a) * lam + a * f_n_vel2, 0.0) * touch
            lam_t2 = ((1 - a) * lam_t + a * f_t2) * touch[:, None]
            return lam2, lam_t2

    else:  # legacy compliant spring-damper (bias not split; f_vel == f_pos)
        f_n_pos = jnp.maximum(ck * cdep - cdamp * v_n, 0.0) * active
        f_n_vel = f_n_pos
        # friction only from TOUCHING contacts (no phantom drag inside the
        # speculative margin band)
        f_n_fric = f_n_pos * (cdep > 0.0)
        # implicit spring-damper coupling: damping + dt*stiffness
        d_n = (cdamp + h * ck) * (f_n_pos > 0)
        vt_norm = jnp.sqrt(
            jnp.sum(v_t * v_t, axis=-1) + params.friction_vreg**2
        )
        k_t = cmu * f_n_fric / vt_norm  # regularized Coulomb slope
        f_t = -k_t[:, None] * v_t
        d_t = k_t * (f_n_pos > 0)

        def relam(v_body_new, free_vel_new):
            return state.contact_lam, state.contact_lam_t

    f_vel = f_n_vel[:, None] * cnrm + f_t
    f_pos = f_n_pos[:, None] * cnrm + f_t
    # d_n/d_t: implicit velocity-coupling coefficients per point, folded into
    # the solver LHS so stiff contacts stay stable at any h.
    return f_vel, f_pos, relam, (cpos, cnrm, cdep, d_n, d_t)


def make_force_query(model: SceneModel):
    """Standalone contact-force query ``query(state) -> f_pt (P,3)`` for
    reward/evaluate-time pairwise force checks (e.g. ``is_grasping``,
    reference panda.py:236-264). Single env; vmap for batches."""
    tables = _assignment_tables(model)

    def query(state: SimState, fk=None):
        """fk: optional precomputed (body_pos, body_quat, axis_w)."""
        if model.nq > 0:
            body_pos, body_quat, axis_w = (
                fk if fk is not None else robot_fk(model, state.qpos)
            )
            ref = jnp.asarray(model.robot_base_pose[:3])
            cols = joint_columns(model, body_pos, axis_w, ref)
            J = joint_columns_to_jacobian(model, cols)
            v_body = J @ state.qvel
        else:
            body_pos = jnp.zeros((0, 3))
            body_quat = jnp.zeros((0, 4))
            v_body = jnp.zeros((0, 6))
        _, f_pos, _, aux = point_forces(
            model, state, body_pos, body_quat, v_body, tables
        )
        return f_pos, aux  # true load incl. depenetration bias

    return query


def pair_force_signs(model: SceneModel, sel_a, sel_b) -> np.ndarray:
    """Static (P,) sign vector: +1 where a contact point's pair is
    (sel_a, sel_b), -1 where (sel_b, sel_a), else 0.  ``signs @ f_pt`` then
    gives the net contact force ON sel_a FROM sel_b (world frame) — the
    reference's ``get_pairwise_contact_forces`` contract (scene.py:736)."""
    _, _, _, _, _, _, _, meta_a, meta_b = _trace_metadata(model)
    signs = np.zeros(len(meta_a), dtype=np.float32)
    for p, (ma, mb) in enumerate(zip(meta_a, meta_b)):
        if ma == tuple(sel_a) and mb == tuple(sel_b):
            signs[p] = 1.0
        elif ma == tuple(sel_b) and mb == tuple(sel_a):
            signs[p] = -1.0
    return signs


def make_step_fn(model: SceneModel):
    """Build the jittable single-env physics step:
    ``step(state, cmd) -> state`` advancing one sim step (params.dt) with
    params.substeps inner integration substeps.

    This is the TPU analogue of the reference hot loop
    (``sapien_env.py:1016-1021``: apply drives → px.step × substeps → fetch).
    """
    spec = model.robot
    params = model.params
    nq = model.nq
    n_free = model.n_free
    g_vec = jnp.asarray(params.gravity)

    # static assignment matrices (depend only on the pair table)
    tables = _assignment_tables(model)
    A_robot_a, A_robot_b, A_free_a, A_free_b = tables

    robot_mass = jnp.asarray(spec.mass, dtype=jnp.float32) if spec else None
    robot_com = jnp.asarray(spec.com, dtype=jnp.float32) if spec else None
    robot_Icom = jnp.asarray(model.robot_inertia_com) if spec else None
    qlim = jnp.asarray(model.robot_qlim)
    kp = jnp.asarray(model.drive_kp)
    kd = jnp.asarray(model.drive_kd)
    force_limit = jnp.asarray(model.drive_force_limit)
    joint_damping = (
        jnp.asarray(spec.joint_damping, dtype=jnp.float32) if spec else None
    )
    joint_friction = (
        jnp.asarray(spec.joint_friction, dtype=jnp.float32) if spec else None
    )


    h = params.dt / params.substeps
    ref = jnp.asarray(model.robot_base_pose[:3]) if spec else jnp.zeros(3)

    parent_idx = [int(p) for p in spec.parent] if spec else []

    def prefix_sum(x):
        """Per-dof contributions (nq, D) -> per-body ancestor sums (nb, D):
        acc[b] = Σ_{k ⊑ b} x[k]. Unrolled over the (static) tree — replaces
        the dense ancestor-mask matmul with nb adds."""
        acc = [None] * nq
        for b in range(nq):
            par = parent_idx[b]
            acc[b] = x[b] if par < 0 else acc[par] + x[b]
        return jnp.stack(acc)

    def suffix_sum(x):
        """Per-body quantities (nb, D) -> per-dof subtree sums (nq, D):
        out[k] = Σ_{b ⊇ k} x[b] (the Jᵀ-apply for ancestor-structured J)."""
        acc = [x[b] for b in range(nq)]
        for b in range(nq - 1, -1, -1):
            par = parent_idx[b]
            if par >= 0:
                acc[par] = acc[par] + acc[b]
        return jnp.stack(acc)

    def cols_at(qpos):
        if nq == 0:
            z = jnp.zeros((0, 3))
            return jnp.zeros((0, 6)), (z, jnp.zeros((0, 4)), z)
        body_pos, body_quat, axis_w = robot_fk(model, qpos)
        cols = joint_columns(model, body_pos, axis_w, ref)
        return cols, (body_pos, body_quat, axis_w)

    # --- static contact-coupling groups -----------------------------------
    # Union-find over the candidate pair table: bodies that can ever
    # exchange contact forces share ONE implicit solve. Solving the robot
    # (nq×nq) and each free body (6×6) separately couples them only
    # explicitly (block-Jacobi); with contact impedance h·d ≫ m the
    # off-diagonal gain is ~1 and a stiff coupled contact (two-finger
    # squeeze) limit-cycles instead of converging. The monolithic group
    # solve is exact — and is the same machinery N-articulation scenes
    # need (block-diagonal mass + contact coupling). Node 0 = robot,
    # node 1+j = free body j.
    _uf = list(range(1 + n_free))

    def _find(i):
        while _uf[i] != i:
            _uf[i] = _uf[_uf[i]]
            i = _uf[i]
        return i

    def _node(g):
        if g.kind == BodyKind.ROBOT_LINK:
            return 0 if nq > 0 else None
        if g.kind == BodyKind.FREE:
            return 1 + g.body
        return None

    for (_gi, _gj) in model.pairs:
        na = _node(model.geoms[_gi])
        nb2 = _node(model.geoms[_gj])
        if na is not None and nb2 is not None:
            ra, rb = _find(na), _find(nb2)
            if ra != rb:
                _uf[ra] = rb
    # actor-pair drives couple bodies exactly like contacts do: their
    # implicit stiffness lands in the off-diagonal LHS blocks, which the
    # per-group solves would otherwise drop
    for _d in getattr(model, "drives", []):
        _nodes = []
        for _k, _b in ((_d.kind_a, _d.body_a), (_d.kind_b, _d.body_b)):
            if _k == int(BodyKind.ROBOT_LINK):
                _nodes.append(0 if nq > 0 else None)
            elif _k == int(BodyKind.FREE):
                _nodes.append(1 + _b)
            else:
                _nodes.append(None)
        if _nodes[0] is not None and _nodes[1] is not None:
            ra, rb = _find(_nodes[0]), _find(_nodes[1])
            if ra != rb:
                _uf[ra] = rb
    _by_root = {}
    if nq > 0:
        _by_root[_find(0)] = True  # marker; rebuilt below
    _group_free = {}
    for _j in range(n_free):
        _group_free.setdefault(_find(1 + _j), []).append(_j)
    n_all = nq + 6 * n_free
    group_cols = []  # static dof-index arrays into [q̇(nq); u_0(6); …]
    _robot_root = _find(0) if nq > 0 else None
    _roots = set(_group_free) | ({_robot_root} if nq > 0 else set())
    for _r in sorted(_roots):
        gc = list(range(nq)) if (nq > 0 and _r == _robot_root) else []
        for _j in _group_free.get(_r, []):
            gc.extend(range(nq + 6 * _j, nq + 6 * _j + 6))
        group_cols.append(np.asarray(gc, dtype=np.int64))

    def substep(state: SimState, cmd: DriveCmd) -> SimState:
        # ---------------- robot kinematics ----------------
        cols, (body_pos, body_quat, axis_w) = cols_at(state.qpos)
        # v_b = Σ_{k ⊑ b} s_k q̇_k: prefix accumulation instead of J @ q̇
        v_body = prefix_sum(cols * state.qvel[:, None]) if nq else jnp.zeros((0, 6))

        # ---------------- contacts ----------------
        # split impulse: f_vel (no Baumgarte bias) integrates velocities,
        # f_pos (with bias) integrates positions — depenetration never enters
        # the kinetic energy (see point_forces docstring).
        f_vel, f_pos, relam, (cpos, cnrm, cdep, d_n, d_t) = (
            point_forces(model, state, body_pos, body_quat, v_body, tables)
        )
        P = f_pos.shape[0]
        # --- contact jacobian in COMPONENT-ROW form: three (n_all, P) arrays
        # Cx/Cy/Cz where C_c[d, p] is the c-component of dof d's point-
        # velocity column at point p (∂v_point(p)/∂[q̇; u_j=[ω; v]]).
        #
        # TPU layout rationale (the round-2 perf regression, PLAN.md): the
        # previous dense (P, n_all, 3) jacobian put tiny (15, 3) trailing
        # dims in the tiled axes — a few % utilization of the (8, 128)
        # f32 tile and ~4.4 ms/substep of relayout+einsum cost at K=4096
        # (measured, tools/profile_substep.py). With P in the lane axis the
        # same math is elementwise (n_all, P) builds plus (n_all,P)@(P,·)
        # contractions — the MXU shape class. 15×136 tiles at ~50% util.
        if P > 0:
            rel_a = cpos - ref
            nx, ny, nz = cnrm[:, 0], cnrm[:, 1], cnrm[:, 2]
            rows_x, rows_y, rows_z = [], [], []
            if nq > 0:
                anc = jnp.asarray(model.ancestor_mask)  # (nb, nq)
                sm = (
                    anc.T @ (jnp.asarray(A_robot_a) - jnp.asarray(A_robot_b))
                )  # (nq, P): ±1 where joint k moves the point's side
                wx, wy, wz = cols[:, 0:1], cols[:, 1:2], cols[:, 2:3]  # (nq,1)
                vx, vy, vz = cols[:, 3:4], cols[:, 4:5], cols[:, 5:6]
                rx, ry, rz = rel_a[:, 0][None], rel_a[:, 1][None], rel_a[:, 2][None]
                rows_x.append(sm * (vx + wy * rz - wz * ry))
                rows_y.append(sm * (vy + wz * rx - wx * rz))
                rows_z.append(sm * (vz + wx * ry - wy * rx))
            if n_free > 0:
                sgn = jnp.asarray(A_free_a) - jnp.asarray(A_free_b)  # (F, P)
                zero = jnp.zeros_like(sgn[0])
                one = jnp.ones_like(sgn[0])
                for j in range(n_free):  # static unroll; n_free is small
                    s = sgn[j]
                    ax = cpos[:, 0] - state.free_pose[j, 0]
                    ay = cpos[:, 1] - state.free_pose[j, 1]
                    az = cpos[:, 2] - state.free_pose[j, 2]
                    # dofs [ω_x, ω_y, ω_z]: column e_i × arm
                    rows_x.append(jnp.stack([zero, az * s, -ay * s]))
                    rows_y.append(jnp.stack([-az * s, zero, ax * s]))
                    rows_z.append(jnp.stack([ay * s, -ax * s, zero]))
                    # dofs [v_x, v_y, v_z]: column e_i
                    rows_x.append(jnp.stack([one * s, zero, zero]))
                    rows_y.append(jnp.stack([zero, one * s, zero]))
                    rows_z.append(jnp.stack([zero, zero, one * s]))
            Cx = jnp.concatenate(rows_x, axis=0)  # (n_all, P)
            Cy = jnp.concatenate(rows_y, axis=0)
            Cz = jnp.concatenate(rows_z, axis=0)
            Gn = Cx * nx[None] + Cy * ny[None] + Cz * nz[None]  # (n_all, P)
        else:
            Cx = Cy = Cz = Gn = jnp.zeros((n_all, 0))

        # ---------------- robot dynamics ----------------
        # Mass matrix and bias in COMPONENT-ROW form — no (nb, 6, 6) spatial-
        # inertia objects. Using s_kᵀ I_b s_l = m_b·u_k(b)·u_l(b) + ω_kᵀ I_w,b ω_l
        # with u_k(b) = v_k + ω_k × c_b (dof k's point-velocity column at body
        # b's CoM), the CRBA contraction becomes ancestry-masked (nq, nb)
        # feature rows consumed by the same fused matmul as the contact
        # coupling below. The former 6×6 pipeline (I_sp build + subtree
        # suffix + einsum) measured 1.25 ms/substep at K=4096 — tiny (6, 6)
        # trailing dims tile at a few % of the (8, 128) f32 tile.
        if nq > 0:
            com_w = body_pos + quat_apply(body_quat, robot_com) - ref
            # rotation-matrix entries as (nb,) scalar rows straight from the
            # quaternion (wxyz, rotations.quat_to_matrix formulas) — never
            # materializing a (nb, 3, 3) object in the hot path
            qw, qx, qy, qz = (
                body_quat[:, 0], body_quat[:, 1],
                body_quat[:, 2], body_quat[:, 3],
            )
            tx, ty, tz = 2.0 * qx, 2.0 * qy, 2.0 * qz
            twx, twy, twz = tx * qw, ty * qw, tz * qw
            txx, txy, txz = tx * qx, ty * qx, tz * qx
            tyy, tyz, tzz = ty * qy, tz * qy, tz * qz
            Rm = [
                [1.0 - (tyy + tzz), txy - twz, txz + twy],
                [txy + twz, 1.0 - (txx + tzz), tyz - twx],
                [txz - twy, tyz + twx, 1.0 - (txx + tyy)],
            ]
            # world rotational inertia entries I_w = R I_com Rᵀ, as 6 unique
            # (nb,) rows (I_com static per body)
            Icom = robot_Icom  # (nb, 3, 3) static
            B3 = [
                [
                    sum(Rm[c][a] * Icom[:, a, d] for a in range(3))
                    for d in range(3)
                ]
                for c in range(3)
            ]
            Iw = [[None] * 3 for _ in range(3)]
            for c in range(3):
                for e in range(c, 3):
                    Iw[c][e] = sum(B3[c][d] * Rm[e][d] for d in range(3))
                    Iw[e][c] = Iw[c][e]
            am = jnp.asarray(model.ancestor_mask).T  # (nq, nb): am[k,b]=k⊑b
            w_, v_ = cols[:, :3], cols[:, 3:]  # (nq, 3)
            cwx = com_w[:, 0][None]  # (1, nb)
            cwy = com_w[:, 1][None]
            cwz = com_w[:, 2][None]
            # masked point-velocity columns at CoMs: U_c (nq, nb)
            Ux = am * (v_[:, 0:1] + w_[:, 1:2] * cwz - w_[:, 2:3] * cwy)
            Uy = am * (v_[:, 1:2] + w_[:, 2:3] * cwx - w_[:, 0:1] * cwz)
            Uz = am * (v_[:, 2:3] + w_[:, 0:1] * cwy - w_[:, 1:2] * cwx)
            # masked angular rows T_c and their I_w-contracted partners V_c
            Tx = am * w_[:, 0:1]
            Ty = am * w_[:, 1:2]
            Tz = am * w_[:, 2:3]
            Vx = Iw[0][0][None] * Tx + Iw[0][1][None] * Ty + Iw[0][2][None] * Tz
            Vy = Iw[1][0][None] * Tx + Iw[1][1][None] * Ty + Iw[1][2][None] * Tz
            Vz = Iw[2][0][None] * Tx + Iw[2][1][None] * Ty + Iw[2][2][None] * Tz
            mrow = robot_mass[None]  # (1, nb)

            def I_apply(w6):
                """Spatial inertia apply I_sp @ w6 without the 6×6 object:
                z = u + ω×c; force = m z; torque = I_w ω + m c×z."""
                w3, u3 = w6[:, :3], w6[:, 3:]
                z = u3 + jnp.cross(w3, com_w)
                Iww = jnp.stack(
                    [
                        Iw[c][0] * w3[:, 0]
                        + Iw[c][1] * w3[:, 1]
                        + Iw[c][2] * w3[:, 2]
                        for c in range(3)
                    ],
                    axis=-1,
                )
                torque = Iww + robot_mass[:, None] * jnp.cross(com_w, z)
                return jnp.concatenate(
                    [torque, robot_mass[:, None] * z], axis=-1
                )

            # Coriolis bias a_bias = J̇ q̇, using the Featherstone identity
            # ṡ_j = v_{body(j)} ×̂ s_j (a joint's Plücker column is fixed in
            # its carrying body). Closed-form — no jvp (which was a ~6x
            # compile-time blowup under vmap on CPU XLA).
            sdot = motion_cross(v_body, cols)  # (nq, 6)
            a_bias = prefix_sum(sdot * state.qvel[:, None])  # (nb, 6)
            f_cori = I_apply(a_bias) + force_cross(v_body, I_apply(v_body))
            # gravity wrench per body (reference parity: robot links have
            # gravity disabled by default — balance_passive_force,
            # base_agent.py:272-276)
            gmask = jnp.asarray(model.gravity_mask)[:, None]  # (nb, 1)
            f_grav = point_force_to_wrench(
                com_w, gmask * robot_mass[:, None] * g_vec
            )
            tau_bias = jnp.sum(cols * suffix_sum(f_cori - f_grav), axis=-1)

            # implicit PD drive (see module docstring); gains come from the
            # command when set (runtime set_drive_property parity), else
            # the static model gains
            kp_d = cmd.kp if cmd.kp is not None else kp
            kd_d = cmd.kd if cmd.kd is not None else kd
            flim_d = (cmd.force_limit if cmd.force_limit is not None
                      else force_limit)
            tau_drive = jnp.clip(
                kp_d * (cmd.target_qpos - state.qpos)
                + kd_d * (cmd.target_qvel - state.qvel),
                -flim_d,
                flim_d,
            )
            # joint-limit penalty
            low, high = qlim[:, 0], qlim[:, 1]
            viol_low = jnp.maximum(low - state.qpos, 0.0)
            viol_high = jnp.maximum(state.qpos - high, 0.0)
            in_viol = ((viol_low > 0) | (viol_high > 0)).astype(jnp.float32)
            tau_lim = (
                params.joint_limit_stiffness * (viol_low - viol_high)
                - params.joint_limit_damping * in_viol * state.qvel
            )

            # implicit drive terms: dt*(kp*dt + kd) + joint damping fold into
            # the LHS so stiff gains stay stable at any dt
            # regularized dry joint friction (reference: PhysX joint
            # friction on cabinet/faucet joints): saturated viscous law,
            # stiction slope folded into the LHS inside the band
            fr = joint_friction
            fvreg = params.joint_friction_vreg
            sat = jnp.clip(state.qvel / fvreg, -1.0, 1.0)
            tau_fric = -fr * sat
            in_band = (jnp.abs(state.qvel) < fvreg).astype(jnp.float32)
            # implicit fold of the limit spring/damper (like the drives):
            # explicit-only limit penalties explode on low-inertia dofs
            # (a 0.003 kg·m² faucet handle at k=4e3)
            diag = (
                h * (kp_d * h + kd_d)
                + h * joint_damping
                + h * in_band * fr / fvreg
                + in_viol * h * (params.joint_limit_stiffness * h
                                 + params.joint_limit_damping)
            )
            rhs_robot = tau_drive + cmd.qf + tau_lim + tau_fric - tau_bias

        # ---------------- free-body terms ----------------
        if n_free > 0:
            Rf = quat_to_matrix(state.free_pose[:, 3:7])
            free_mass = state.free_mass  # per-env (heterogeneous batches)
            free_inertia = state.free_inertia
            I_w = Rf @ free_inertia @ Rf.swapaxes(-1, -2)
            lin_v, ang_v = state.free_vel[:, :3], state.free_vel[:, 3:]
            u = jnp.concatenate([ang_v, lin_v], axis=-1)  # (n_free, 6) [ω; v]
            gyro = jnp.cross(ang_v, jnp.einsum("nij,nj->ni", I_w, ang_v))
            grav = free_mass[:, None] * g_vec
            Wf = jnp.concatenate([-gyro, grav], axis=-1)  # (n_free, 6)
            M6 = jnp.zeros((n_free, 6, 6))
            M6 = M6.at[:, :3, :3].set(I_w)
            M6 = M6.at[:, 3:, 3:].set(
                free_mass[:, None, None] * jnp.eye(3)[None]
            )

        # ---------------- monolithic assembly + group solves --------------
        # ONE fused feature matmul builds the entire LHS core — robot mass
        # matrix (componentized CRBA: M[k,l] = Σ_b m_b u_k·u_l + ω_kᵀI_w ω_l
        # via the masked U/T/V rows) PLUS the implicit contact coupling
        # h·Σ_p G_pᵀ(d_t·I + (d_n−d_t)nnᵀ)G_p via the C/Gn rows — AND both
        # split-impulse RHS projections Gᵀf (two extra rows carrying the
        # point forces in the C-feature slots). Contraction dim 6·nb + 4·P
        # sits in the TPU lane axis; output is a dense (n_all+2, n_all).
        h_dt = h * d_t
        h_nn = h * (d_n - d_t)
        # contact coupling + Gᵀf as separate small matmuls over the SAME
        # C/Gn operands (XLA reuses the materialized rows; concatenating
        # them into one wide fused operand doubled the HBM traffic and
        # measured slower)
        F2 = jnp.stack([f_vel, f_pos], axis=-1)  # (P, 3, 2)
        gf2 = Cx @ F2[:, 0] + Cy @ F2[:, 1] + Cz @ F2[:, 2]  # (n_all, 2)
        gf_vel, gf_pos = gf2[:, 0], gf2[:, 1]
        lhs_full = (
            (Cx * h_dt[None]) @ Cx.T
            + (Cy * h_dt[None]) @ Cy.T
            + (Cz * h_dt[None]) @ Cz.T
            + (Gn * h_nn[None]) @ Gn.T
        )
        if nq > 0:
            # componentized CRBA mass matrix: one (nq, 6·nb) feature matmul
            Qm = jnp.concatenate(
                [Ux * mrow, Uy * mrow, Uz * mrow, Tx, Ty, Tz], axis=1
            )
            Wm = jnp.concatenate([Ux, Uy, Uz, Vx, Vy, Vz], axis=1)
            lhs_full = lhs_full.at[:nq, :nq].add(Qm @ Wm.T)

        # ---------------- actor-pair drives ----------------
        # 6-DoF drives (PairDrive, model.py — reference structs/drive.py):
        # explicit spring force on the RHS, stiffness+damping folded into the
        # LHS through the same component-row machinery as contacts, so a
        # stiff "glue" drive is unconditionally stable.
        rhs_drv = None
        if getattr(model, "drives", []):
            Dn = len(model.drives)
            smd_np = np.zeros((nq, Dn), np.float32)
            sgnd_np = np.zeros((n_free, Dn), np.float32)
            kp_arr = np.zeros(Dn, np.float32)
            kd_arr = np.zeros(Dn, np.float32)
            fl_arr = np.zeros(Dn, np.float32)
            for di, d in enumerate(model.drives):
                kp_arr[di], kd_arr[di], fl_arr[di] = (
                    d.stiffness, d.damping, d.force_limit)
                for (kk, bb, sg) in ((d.kind_a, d.body_a, 1.0),
                                     (d.kind_b, d.body_b, -1.0)):
                    if kk == int(BodyKind.ROBOT_LINK) and nq > 0:
                        smd_np[:, di] += sg * model.ancestor_mask[bb, :]
                    elif kk == int(BodyKind.FREE):
                        sgnd_np[bb, di] += sg

            def _side_pv(kk, bb, anchor):
                a = jnp.asarray(anchor)
                if kk == int(BodyKind.ROBOT_LINK):
                    p = body_pos[bb] + quat_apply(body_quat[bb], a)
                    v = v_body[bb, 3:] + jnp.cross(v_body[bb, :3], p - ref)
                elif kk == int(BodyKind.FREE):
                    bp = state.free_pose[bb]
                    p = bp[:3] + quat_apply(bp[3:7], a)
                    v = state.free_vel[bb, :3] + jnp.cross(
                        state.free_vel[bb, 3:], p - bp[:3])
                elif kk == int(BodyKind.STATIC):
                    sp = model.static_pose[bb]
                    p = jnp.asarray(sp[:3]) + quat_apply(
                        jnp.asarray(sp[3:7]), a)
                    v = jnp.zeros(3)
                else:  # world anchor
                    p = a
                    v = jnp.zeros(3)
                return p, v

            pm_l, fd_l = [], []
            for di, d in enumerate(model.drives):
                pa_d, va_d = _side_pv(d.kind_a, d.body_a, d.anchor_a)
                pb_d, vb_d = _side_pv(d.kind_b, d.body_b, d.anchor_b)
                f = (kp_arr[di] * (pb_d - pa_d)
                     + kd_arr[di] * (vb_d - va_d))
                fd_l.append(jnp.clip(f, -fl_arr[di], fl_arr[di]))
                pm_l.append(0.5 * (pa_d + pb_d))
            pm = jnp.stack(pm_l)  # (Dn, 3)
            fd = jnp.stack(fd_l)  # (Dn, 3) force on side A
            drows_x, drows_y, drows_z = [], [], []
            if nq > 0:
                smd = jnp.asarray(smd_np)
                rel_d = pm - ref
                wx, wy, wz = cols[:, 0:1], cols[:, 1:2], cols[:, 2:3]
                vx, vy, vz = cols[:, 3:4], cols[:, 4:5], cols[:, 5:6]
                rx = rel_d[:, 0][None]
                ry = rel_d[:, 1][None]
                rz = rel_d[:, 2][None]
                drows_x.append(smd * (vx + wy * rz - wz * ry))
                drows_y.append(smd * (vy + wz * rx - wx * rz))
                drows_z.append(smd * (vz + wx * ry - wy * rx))
            if n_free > 0:
                zero = jnp.zeros(Dn)
                one = jnp.ones(Dn)
                for j in range(n_free):
                    s = jnp.asarray(sgnd_np[j])
                    ax = pm[:, 0] - state.free_pose[j, 0]
                    ay = pm[:, 1] - state.free_pose[j, 1]
                    az = pm[:, 2] - state.free_pose[j, 2]
                    drows_x.append(jnp.stack([zero, az * s, -ay * s]))
                    drows_y.append(jnp.stack([-az * s, zero, ax * s]))
                    drows_z.append(jnp.stack([ay * s, -ax * s, zero]))
                    drows_x.append(jnp.stack([one * s, zero, zero]))
                    drows_y.append(jnp.stack([zero, one * s, zero]))
                    drows_z.append(jnp.stack([zero, zero, one * s]))
            Dx = jnp.concatenate(drows_x, axis=0)  # (n_all, Dn)
            Dy = jnp.concatenate(drows_y, axis=0)
            Dz = jnp.concatenate(drows_z, axis=0)
            rhs_drv = Dx @ fd[:, 0] + Dy @ fd[:, 1] + Dz @ fd[:, 2]
            hd = jnp.asarray(h * (h * kp_arr + kd_arr))[None]  # (1, Dn)
            lhs_full = (
                lhs_full
                + (Dx * hd) @ Dx.T
                + (Dy * hd) @ Dy.T
                + (Dz * hd) @ Dz.T
            )

        diag_parts = []
        rhs_parts = []
        if nq > 0:
            diag_parts.append(diag + 1e-6)
            rhs_parts.append(rhs_robot)
        if n_free > 0:
            diag_parts.append(jnp.full((6 * n_free,), 1e-9))
            rhs_parts.append(Wf.reshape(-1))
        lhs_full = lhs_full + jnp.diag(jnp.concatenate(diag_parts))
        if n_free > 0:
            for j in range(n_free):  # static unroll; n_free is small
                sl = slice(nq + 6 * j, nq + 6 * j + 6)
                lhs_full = lhs_full.at[sl, sl].add(M6[j])
        rhs_cat = jnp.concatenate(rhs_parts)
        if rhs_drv is not None:
            rhs_cat = rhs_cat + rhs_drv
        rhs_vel = gf_vel + rhs_cat
        rhs_pos = gf_pos + rhs_cat
        if len(group_cols) == 1 and len(group_cols[0]) == n_all:
            # single fully-coupled group (the common case): no gather/scatter
            dv_vel, dv_pos = solve_psd_pair(
                lhs_full, h * rhs_vel, h * rhs_pos
            )
        else:
            dv_vel = jnp.zeros(n_all)
            dv_pos = jnp.zeros(n_all)
            for gc in group_cols:  # static index sets → static gathers
                A = lhs_full[np.ix_(gc, gc)]
                xv, xp = solve_psd_pair(A, h * rhs_vel[gc], h * rhs_pos[gc])
                dv_vel = dv_vel.at[gc].set(xv)
                dv_pos = dv_pos.at[gc].set(xp)

        # ---------------- integration ----------------
        if nq > 0:
            qvel_new = state.qvel + dv_vel[:nq]
            # split impulse: velocity state integrates the bias-free pass;
            # positions integrate the bias-inclusive pass (depenetration
            # never enters the kinetic energy)
            qpos_new = state.qpos + h * (state.qvel + dv_pos[:nq])
        else:
            qpos_new, qvel_new = state.qpos, state.qvel
        if n_free > 0:
            u_new = u + dv_vel[nq:].reshape(n_free, 6)
            u_int = u + dv_pos[nq:].reshape(n_free, 6)

            def _clamp_u(uu):
                # PhysX-parity max velocities (see SimParams.max_ang_vel:
                # the explicit gyro term diverges once |ω|h >> 1). Norms use
                # the eps-inside-sqrt form: linalg.norm has a NaN gradient
                # at exactly zero velocity, which poisons iLQR jacobians.
                wn = jnp.sqrt(
                    jnp.sum(uu[:, :3] ** 2, -1, keepdims=True) + 1e-18)
                vn = jnp.sqrt(
                    jnp.sum(uu[:, 3:] ** 2, -1, keepdims=True) + 1e-18)
                ws = jnp.minimum(1.0, params.max_ang_vel / wn)
                vs = jnp.minimum(1.0, params.max_lin_vel / vn)
                return jnp.concatenate([uu[:, :3] * ws, uu[:, 3:] * vs], -1)

            u_new = _clamp_u(u_new)
            u_int = _clamp_u(u_int)
            ang_new, lin_new = u_new[:, :3], u_new[:, 3:]
            p_new = state.free_pose[:, :3] + h * u_int[:, 3:]
            q_new = quat_normalize(
                quat_mul(quat_exp(h * u_int[:, :3]), state.free_pose[:, 3:7])
            )
            free_pose_new = jnp.concatenate([p_new, q_new], axis=-1)
            free_vel_new = jnp.concatenate([lin_new, ang_new], axis=-1)
        else:
            free_pose_new, free_vel_new = state.free_pose, state.free_vel

        # store the contact impulses the solve actually delivered (evaluated
        # at POST-solve velocities; positions/normals unchanged this substep)
        v_body_new = (
            prefix_sum(cols * qvel_new[:, None]) if nq else jnp.zeros((0, 6))
        )
        lam_new, lam_t_new = relam(v_body_new, free_vel_new)
        new_state = state.replace(
            qpos=qpos_new,
            qvel=qvel_new,
            free_pose=free_pose_new,
            free_vel=free_vel_new,
            contact_lam=lam_new,
            contact_lam_t=lam_t_new,
        )
        aux = dict(
            f_pt=f_pos, body_pos=body_pos, body_quat=body_quat, axis_w=axis_w
        )
        return new_state, aux

    def step(state: SimState, cmd: DriveCmd, sim_steps: int = 1,
             return_aux: bool = False):
        """Advance ``sim_steps`` sim steps (each params.substeps inner
        substeps) under a constant drive command, as ONE flat lax.scan so the
        substep body is traced/compiled exactly once (nested scans multiplied
        XLA compile time ~4x).

        With ``return_aux=True`` also returns the LAST substep's contact
        forces and FK (half a substep stale relative to the returned state) —
        planners reuse these in reward/evaluate instead of recomputing a full
        FK + narrowphase pass per control step."""

        def body(s, _):
            s2, aux = substep(s, cmd)
            return s2, aux

        state, auxs = jax.lax.scan(
            body, state, None, length=params.substeps * sim_steps,
            unroll=min(2, params.substeps * sim_steps),
        )
        if return_aux:
            last_aux = jax.tree.map(lambda x: x[-1], auxs)
            return state, last_aux
        return state

    return step


def _trace_metadata(model: SceneModel):
    """Evaluate compute_contacts once with dummy state to get static point
    metadata (assignment tables) without tracing."""
    state = model.initial_state()
    if model.robot is not None:
        body_pos, body_quat, _ = robot_fk(model, jnp.asarray(model.init_qpos))
    else:
        body_pos = jnp.zeros((0, 3))
        body_quat = jnp.zeros((0, 4))
    return compute_contacts(model, state, body_pos, body_quat)
