"""Whole-substep Pallas TPU mega-kernel.

The XLA (vmap) physics path is HBM-bound: every per-point / per-dof
intermediate materializes as a (K, small, small) array whose tiny trailing
dims tile at a few percent of the (8, 128) f32 tile, and the contact-coupling
matmul operands alone move ~300 MB/substep at K=4096 (measured,
tools/profile_substep.py — 3.5-4.8 ms/substep vs 0.36 ms for FK+contacts).

This kernel runs the ENTIRE substep loop for a block of 1024 envs inside
VMEM: every per-env scalar is one (8, 128) f32 tile (env = sublane x lane),
per-point quantities are (n_pts, 8, 128) stacks processed chunk-wise, and
HBM traffic collapses to state-in / state-out per control step (~3 KB/env
vs ~1 MB). This is the design PLAN.md item 1 validated in round 1 with
``solve_psd_pallas`` (env-last layout, 1.64x single-op; the win only
materializes when producers/consumers share the kernel — this kernel).

Semantics mirror ``engine.substep`` (velocity-mode contact, split impulse,
warm-started impulses, monolithic coupled solve) — validated against the
XLA path in tests/test_megakernel.py. TPU-native analogue of the PhysX GPU
solver hot loop the reference drives via ``px.step()``
(mani_skill/envs/scene.py:374; gpu sim config types.py:36-59).

Supported model class (``supports(model)``): one robot tree + free bodies,
velocity contact mode, narrowphase fns in {plane_box, box_box_onesided,
box_box, plane_sphere, sphere_box, box_sphere, sphere_sphere}. Everything
else falls back to the XLA path.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .model import BodyKind, DriveCmd, SceneModel, SimState
from ..kinematics.urdf import JOINT_REVOLUTE

EB = 1024  # envs per grid block = one (8, 128) f32 tile per scalar
_SUPPORTED_FNS = {
    "plane_box",
    "box_box_onesided",
    "box_box",
    "box_box_corners",
    "plane_sphere",
    "sphere_box",
    "box_sphere",
    "sphere_sphere",
    "plane_capsule",
    "sphere_capsule",
    "capsule_box",
    "capsule_capsule",
}
# convex-hull pair fns (round 5): per-env padded vertex/face tables ride
# the input plane; the face-plane SDF is evaluated unrolled over HULL_F
# faces. Gated separately by _hull_cost below (compile-size bound).
_HULL_FNS = {
    "plane_hull", "sphere_hull", "box_hull", "capsule_hull", "hull_hull",
}
# max total hull-SDF point evaluations per substep the unrolled kernel
# will accept (each is ~2xHULL_F tile-ops; past this the Mosaic compile
# balloons and the XLA path wins anyway)
_HULL_EVAL_BUDGET = 160
_CHUNK = 32  # max contact points processed at once (VMEM transient cap)


def _hull_cost(model) -> int:
    """Total hull-SDF point evaluations across hull pair groups."""
    from .hulls import HULL_P

    cost = 0
    for (fn, _npts, ia, ib, _mu) in model.pair_groups:
        name = fn.__name__
        if name not in _HULL_FNS:
            continue
        per_pair = {"plane_hull": 0, "sphere_hull": 1, "box_hull": 8,
                    "capsule_hull": 3, "hull_hull": 2 * HULL_P}[name]
        cost += per_pair * len(ia)
    return cost


# ---------------------------------------------------------------------------
# component math on (8, 128) tiles (and (n, 8, 128) stacks)
# ---------------------------------------------------------------------------


def _cross(a, b):
    ax, ay, az = a
    bx, by, bz = b
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _scale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _qmul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    )


def _qapply(q, v):
    """v + 2 w (u x v) + 2 u x (u x v) — mirrors rotations.quat_apply."""
    w = q[0]
    u = (q[1], q[2], q[3])
    uv = _cross(u, v)
    uuv = _cross(u, uv)
    return (
        v[0] + 2.0 * (w * uv[0] + uuv[0]),
        v[1] + 2.0 * (w * uv[1] + uuv[1]),
        v[2] + 2.0 * (w * uv[2] + uuv[2]),
    )


def _qconj(q):
    return (q[0], -q[1], -q[2], -q[3])


def _qexp(v):
    """Rotation vector -> quaternion, mirrors rotations.quat_exp."""
    sq = v[0] * v[0] + v[1] * v[1] + v[2] * v[2]
    angle = jnp.sqrt(sq + 1e-18)
    half = 0.5 * angle
    k = jnp.sin(half) / angle
    return (jnp.cos(half), v[0] * k, v[1] * k, v[2] * k)


def _qnormalize(q):
    n = jnp.sqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3])
    inv = 1.0 / jnp.maximum(n, 1e-12)
    return (q[0] * inv, q[1] * inv, q[2] * inv, q[3] * inv)


def _stk(rows):
    """Stack a python list of (8,128) tiles into an (n, 8, 128) array."""
    return jnp.stack(rows, axis=0)


# ---------------------------------------------------------------------------
# static plan
# ---------------------------------------------------------------------------


def supports(model: SceneModel) -> bool:
    """Whether this model's scene class is covered by the mega-kernel."""
    if model.params.contact_mode != "velocity":
        return False
    if getattr(model, "drives", []):
        return False  # actor-pair drives: XLA path only (for now)
    for (fn, _npts, _ia, _ib, _mu) in model.pair_groups:
        if fn.__name__ not in _SUPPORTED_FNS | _HULL_FNS:
            return False
    if _hull_cost(model) > _HULL_EVAL_BUDGET:
        return False
    for g in model.geoms:
        if g.kind == BodyKind.ROBOT_LINK and g.body < -1:
            return False
    # VMEM budget gate; n_all is additionally capped: the scalarized
    # Cholesky is O(n_all^3) unrolled ops (compile-time bound, not VMEM).
    n_all = model.nq + 6 * model.n_free
    if n_all > 32:
        return False
    # Emitted-program-size envelope: the kernel is Python-unrolled per
    # contact point (per-chunk static dof pruning), so the program grows
    # ~P*n_all. The remote TPU compiler crashes (tpu_compile_helper exit 1)
    # beyond roughly 2x the largest config that compiles — PlugCharger
    # P=453*n_all=15 = 6.8k is fine; TwoRobotPushCube P=832*n_all=30 = 25k
    # is not (observed round 5). Scenes past the envelope take the XLA
    # path, which handles them correctly at lower throughput.
    if model.n_points * n_all > 12_000:
        return False
    est_full, est_chunked = _vmem_estimates(model)
    return min(est_full, est_chunked) <= _VMEM_BUDGET


_VMEM_BUDGET = 80 * 1024 * 1024


def _vmem_estimates(model):
    """(full-stack, chunked-narrowphase) VMEM estimates in bytes.

    Full mode holds the whole-P narrowphase stacks (cpos/cnrm/cdep + lever
    arms, ~10 (P, 8, 128) arrays) for the substep; chunked mode (round 5)
    recomputes narrowphase per _CHUNK of points in both contact passes, so
    only the lam/lamt carry is P-persistent. That removes the VMEM wall
    for large P, but the program-size envelope in supports() still bounds
    what the TPU compiler accepts (TwoRobotPushCube P=832 fits VMEM in
    chunked mode yet crashes the remote compiler; it stays on XLA)."""
    nq = model.nq
    F = model.n_free
    P = model.n_points
    n_all = nq + 6 * F
    nb = model.robot.nb if model.robot else 0
    nk = getattr(model, "n_kin", 0)
    G = len(model.geoms)
    from .hulls import HULL_F, HULL_P

    nh = getattr(model, "n_hull", 0)
    tile = 4 * 1024  # one (8, 128) f32 tile per point-row at eb=1024
    r_in = (8 * nq + 13 * F + 7 * nk + 10 * G + 7 * F + 4 * P
            + nh * (3 * HULL_P + 4 * HULL_F))
    r_out = 2 * nq + 13 * F + 7 * P + 10 * nb
    transient = (n_all * 3 + 24) * _CHUNK
    small = 2 * (n_all * n_all) + 12 * nb + 8 * G
    base = (r_in + r_out + transient + small) * tile
    est_full = base + 14 * P * tile  # cpos/cnrm/cdep/rel + lam/lamt carry
    est_chunked = base + 4 * P * tile  # lam/lamt carry only
    return est_full, est_chunked


class _Plan:
    """Static row layout + per-point metadata for one model."""

    def __init__(self, model: SceneModel):
        from . import engine as eng

        self.model = model
        nq = model.nq
        F = model.n_free
        self.nq, self.F = nq, F
        self.n_all = nq + 6 * F
        spec = model.robot
        self.nb = spec.nb if spec else 0
        self.parent = [int(p) for p in spec.parent] if spec else []
        G = len(model.geoms)
        self.G = G
        nk = model.n_kin if hasattr(model, "n_kin") else (
            int(model.initial_state().kin_pose.shape[0])
        )
        self.nk = nk

        # per-point static metadata (same trace the XLA path uses)
        (A_ra, A_rb, A_fa, A_fb) = eng._assignment_tables(model)
        (_, _, _, cmu, _cd, ck, _cm, meta_a, meta_b) = eng._trace_metadata(
            model
        )
        self.P = len(meta_a)
        # narrowphase mode: full-P stacks when they fit in VMEM, else
        # recompute per chunk (_vmem_estimates)
        est_full, _est_chunked = _vmem_estimates(model)
        self.full_stacks = est_full <= _VMEM_BUDGET
        self.cmu = np.asarray(cmu, np.float32)
        self.ck = np.asarray(ck, np.float32)
        anc = np.asarray(model.ancestor_mask, np.float32)  # (nb, nq)
        self.anc = anc
        self.sm = (anc.T @ (A_ra - A_rb)).astype(np.float32)  # (nq, P)
        self.sgn_free = (A_fa - A_fb).astype(np.float32)  # (F, P)
        # per-point side body indices (-1 = none)
        def _side_idx(meta, kind):
            out = np.full(self.P, -1, np.int64)
            for p, (kd, b) in enumerate(meta):
                if kd == kind and b >= 0:
                    out[p] = b
            return out

        self.ra_idx = _side_idx(meta_a, BodyKind.ROBOT_LINK)
        self.rb_idx = _side_idx(meta_b, BodyKind.ROBOT_LINK)
        self.fa_idx = _side_idx(meta_a, BodyKind.FREE)
        self.fb_idx = _side_idx(meta_b, BodyKind.FREE)

        # input plane rows
        off = 0

        def take(n):
            nonlocal off
            sl = (off, off + n)
            off += n
            return sl

        self.i_qpos = take(nq)
        self.i_qvel = take(nq)
        self.i_free_pose = take(7 * F)
        self.i_free_vel = take(6 * F)
        self.i_kin = take(7 * nk)
        self.i_gsize = take(3 * G)
        self.i_gpos = take(3 * G)
        self.i_gquat = take(4 * G)
        self.i_fmass = take(F)
        self.i_finertia = take(6 * F)  # unique symmetric comps, body frame
        self.i_lam = take(self.P)
        self.i_lamt = take(3 * self.P)
        self.i_tq = take(nq)
        self.i_tv = take(nq)
        self.i_qf = take(nq)
        self.i_kp = take(nq)
        self.i_kd = take(nq)
        self.i_flim = take(nq)
        # per-env hull tables (slot-major: verts then faces per layout of
        # SimState.hull_verts/hull_faces reshape)
        from .hulls import HULL_F, HULL_P

        nh = getattr(model, "n_hull", 0)
        self.n_hull = nh
        self.i_hverts = take(3 * HULL_P * nh)
        self.i_hfaces = take(4 * HULL_F * nh)
        self.R_in = off

        off = 0
        self.o_qpos = take(nq)
        self.o_qvel = take(nq)
        self.o_free_pose = take(7 * F)
        self.o_free_vel = take(6 * F)
        self.o_lam = take(self.P)
        self.o_lamt = take(3 * self.P)
        # aux rows (last-substep contact forces + FK, planner fast path)
        self.o_fpt = take(3 * self.P)
        self.o_bpos = take(3 * self.nb)
        self.o_bquat = take(4 * self.nb)
        self.o_axis = take(3 * self.nb)
        self.R_out = off


# ---------------------------------------------------------------------------
# packing (caller side, plain XLA)
# ---------------------------------------------------------------------------


def _pack(plan: _Plan, state: SimState, cmd: DriveCmd, K: int):
    """Batched (K-leading) state/cmd -> (R_in, K//128, 128) f32 plane."""
    parts = [
        state.qpos, state.qvel,
        state.free_pose.reshape(K, -1), state.free_vel.reshape(K, -1),
        state.kin_pose.reshape(K, -1), state.geom_size.reshape(K, -1),
        state.geom_pos.reshape(K, -1), state.geom_quat.reshape(K, -1),
        state.free_mass.reshape(K, -1),
        state.free_inertia[..., [0, 0, 0, 1, 1, 2], [0, 1, 2, 1, 2, 2]]
        .reshape(K, -1),
        state.contact_lam,
        state.contact_lam_t.transpose(0, 2, 1).reshape(K, -1),
        cmd.target_qpos, cmd.target_qvel, cmd.qf,
        # runtime drive gains (broadcast the static model gains when the
        # command carries none)
        cmd.kp if cmd.kp is not None else jnp.broadcast_to(
            jnp.asarray(plan.model.drive_kp), cmd.target_qpos.shape),
        cmd.kd if cmd.kd is not None else jnp.broadcast_to(
            jnp.asarray(plan.model.drive_kd), cmd.target_qpos.shape),
        cmd.force_limit if cmd.force_limit is not None else jnp.broadcast_to(
            jnp.asarray(plan.model.drive_force_limit), cmd.target_qpos.shape),
    ]
    if plan.n_hull > 0:
        parts += [state.hull_verts.reshape(K, -1),
                  state.hull_faces.reshape(K, -1)]
    flat = jnp.concatenate([p.astype(jnp.float32) for p in parts], axis=1)
    return flat.T.reshape(plan.R_in, K // 128, 128)


def _unpack(plan: _Plan, out, K: int, state: SimState):
    """(R_out, K//128, 128) plane -> (new SimState, aux dict)."""
    flat = out.reshape(plan.R_out, K).T  # (K, R_out)

    def rows(sl):
        return flat[:, sl[0]:sl[1]]

    nq, F, P, nb = plan.nq, plan.F, plan.P, plan.nb
    new_state = state.replace(
        qpos=rows(plan.o_qpos),
        qvel=rows(plan.o_qvel),
        free_pose=rows(plan.o_free_pose).reshape(K, F, 7),
        free_vel=rows(plan.o_free_vel).reshape(K, F, 6),
        contact_lam=rows(plan.o_lam),
        contact_lam_t=rows(plan.o_lamt).reshape(K, 3, P).transpose(0, 2, 1),
    )
    aux = dict(
        f_pt=rows(plan.o_fpt).reshape(K, 3, P).transpose(0, 2, 1),
        body_pos=rows(plan.o_bpos).reshape(K, 3, nb).transpose(0, 2, 1),
        body_quat=rows(plan.o_bquat).reshape(K, 4, nb).transpose(0, 2, 1),
        axis_w=rows(plan.o_axis).reshape(K, 3, nb).transpose(0, 2, 1),
    )
    return new_state, aux


# ---------------------------------------------------------------------------
# kernel body
# ---------------------------------------------------------------------------


def _build_kernel(plan: _Plan, n_substeps: int, eb: int = EB):
    model = plan.model
    spec = model.robot
    params = model.params
    nq, F, P, nb, nk, G = plan.nq, plan.F, plan.P, plan.nb, plan.nk, plan.G
    n_all = plan.n_all
    h = params.dt / params.substeps
    beta = params.contact_beta
    margin = params.contact_margin
    bias_max = params.contact_bias_max
    relax = params.contact_relax
    vreg = params.friction_vreg
    gvec = np.asarray(params.gravity, np.float32)
    base = np.asarray(model.robot_base_pose, np.float32)
    ref = base[:3] if spec else np.zeros(3, np.float32)
    gmask = np.asarray(model.gravity_mask, np.float32)

    if spec:
        # FK quaternion pre-compose cache (chain._fk_unrolled)
        from ..kinematics.urdf import _quat_mul as _np_qm

        Aq, Bq = [], []
        for i in range(nb):
            jq = np.asarray(spec.joint_quat[i], np.float32)
            Aq.append(jq)
            Bq.append(
                _np_qm(jq, np.concatenate([[0.0], spec.axis[i]])).astype(
                    np.float32
                )
            )
        joint_pos = np.asarray(spec.joint_pos, np.float32)
        jaxis = np.asarray(spec.axis, np.float32)
        jtype = np.asarray(spec.joint_type)
        mass_b = np.asarray(spec.mass, np.float32)
        com_b = np.asarray(spec.com, np.float32)
        Icom_b = np.asarray(model.robot_inertia_com, np.float32)
        # drive gains ride the input plane per env (DriveCmd.kp/kd/flim)
        jdamp = np.asarray(spec.joint_damping, np.float32)
        jfric = np.asarray(spec.joint_friction, np.float32)
        qlim = np.asarray(model.robot_qlim, np.float32)
    free_mass = np.asarray(model.free_mass, np.float32)
    free_inertia = np.asarray(model.free_inertia, np.float32)

    # geom offsets now ride the input plane per env (SimState.geom_pos/quat)
    static_pose = np.asarray(model.static_pose, np.float32).reshape(-1, 7)

    d_n0_np = plan.ck * h / beta  # (P,) impulse gain
    lim_k = params.joint_limit_stiffness
    lim_d = params.joint_limit_damping

    CORNER_SIGNS = np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        dtype=np.float32,
    )
    # corners + face centers: the symmetric box_box samples 14 points per
    # box side (shapes.py box_box — face centers cover the flush stacked-
    # cube degeneracy); face "signs" are the ±e_i face directions so the
    # same pa + R(sa·sg) formula produces them
    SIGNS14 = np.concatenate(
        [
            CORNER_SIGNS,
            np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                      [0, -1, 0], [0, 0, 1], [0, 0, -1]], np.float32),
        ]
    )

    # Pallas kernels cannot capture array constants — static per-point
    # tables ride in as one broadcast (C_rows, P, 128) input plane:
    # rows [sm(nq); sgn_free(F); cmu; d_n0; corner-sign x/y/z (tiled);
    # alt2; alt3; 14-point box_box sign x/y/z (period-14 tiled)]
    P_ = plan.P
    reps = max(1, -(-P_ // 8))
    tiled_signs = np.tile(CORNER_SIGNS, (reps, 1))[:P_]  # (P, 3)
    reps14 = max(1, -(-P_ // 14))
    tiled_s14 = np.tile(SIGNS14, (reps14, 1))[:P_]  # (P, 3)
    const_rows = [plan.sm[k] for k in range(nq)]
    const_rows += [plan.sgn_free[j] for j in range(F)]
    alt2 = np.tile(np.array([-1.0, 1.0]), max(1, -(-P_ // 2)))[:P_]
    alt3 = np.tile(np.array([-1.0, 0.0, 1.0]), max(1, -(-P_ // 3)))[:P_]
    const_rows += [plan.cmu, d_n0_np,
                   tiled_signs[:, 0], tiled_signs[:, 1], tiled_signs[:, 2],
                   alt2, alt3,
                   tiled_s14[:, 0], tiled_s14[:, 1], tiled_s14[:, 2]]
    const_plane = (
        np.broadcast_to(
            np.stack(const_rows).astype(np.float32)[:, :, None],
            (len(const_rows), P_, 128),
        ).copy()
        if const_rows and P_ > 0
        else np.zeros((1, 1, 128), np.float32)  # placeholder: P==0 models
    )
    C_ROWS = const_plane.shape[0]
    _r_cmu = nq + F
    _r_dn0 = nq + F + 1
    _r_cs = nq + F + 2
    _r_alt2 = nq + F + 5
    _r_alt3 = nq + F + 6
    _r_cs14 = nq + F + 7

    def kernel(in_ref, cref, out_ref):
        def pcst(r):
            """Per-point constant row -> (P, 1, 128) broadcastable."""
            return cref[r][:, None, :]

        def row(i):
            return in_ref[i]

        def rows3(sl, n):
            """3 component stacks (n,8,128) laid out [x-block; y; z]."""
            o = sl[0]
            return (
                in_ref[o:o + n], in_ref[o + n:o + 2 * n],
                in_ref[o + 2 * n:o + 3 * n],
            )

        qpos0 = tuple(row(plan.i_qpos[0] + i) for i in range(nq))
        qvel0 = tuple(row(plan.i_qvel[0] + i) for i in range(nq))
        fpose0 = tuple(row(plan.i_free_pose[0] + i) for i in range(7 * F))
        fvel0 = tuple(row(plan.i_free_vel[0] + i) for i in range(6 * F))
        kin = tuple(row(plan.i_kin[0] + i) for i in range(7 * nk))
        gsz = tuple(row(plan.i_gsize[0] + i) for i in range(3 * G))
        gop = tuple(row(plan.i_gpos[0] + i) for i in range(3 * G))
        goq = tuple(row(plan.i_gquat[0] + i) for i in range(4 * G))
        fmass = tuple(row(plan.i_fmass[0] + j) for j in range(F))
        fIc = tuple(row(plan.i_finertia[0] + i) for i in range(6 * F))
        if P > 0:
            lam0 = in_ref[plan.i_lam[0]:plan.i_lam[1]]  # (P, 8, 128)
            lamt0 = rows3(plan.i_lamt, P)
        else:
            # Mosaic rejects zero-sized vectors: carry single-tile dummies
            lam0 = jnp.zeros((1, eb // 128, 128), jnp.float32)
            lamt0 = (lam0, lam0, lam0)
        tq = tuple(row(plan.i_tq[0] + i) for i in range(nq))
        tv = tuple(row(plan.i_tv[0] + i) for i in range(nq))
        qf = tuple(row(plan.i_qf[0] + i) for i in range(nq))
        kp_r = tuple(row(plan.i_kp[0] + i) for i in range(nq))
        kd_r = tuple(row(plan.i_kd[0] + i) for i in range(nq))
        flim_r = tuple(row(plan.i_flim[0] + i) for i in range(nq))

        def geom_size(g):
            return (gsz[3 * g], gsz[3 * g + 1], gsz[3 * g + 2])

        zero = jnp.zeros((eb // 128, 128), jnp.float32)
        one = jnp.ones((eb // 128, 128), jnp.float32)

        def substep(carry):
            (qpos, qvel, fpose, fvel, lam, lamt) = carry

            # ---------------- FK (unrolled, static tree) ----------------
            body_p, body_q, axis_w = [], [], []
            for i in range(nb):
                par = plan.parent[i]
                pp = (
                    (one * base[0], one * base[1], one * base[2])
                    if par < 0 else body_p[par]
                )
                pq = (
                    (one * base[3], one * base[4], one * base[5],
                     one * base[6])
                    if par < 0 else body_q[par]
                )
                jp = joint_pos[i]
                fp = _add(pp, _qapply(pq, (one * jp[0], one * jp[1],
                                           one * jp[2])))
                ax_l = (one * jaxis[i][0], one * jaxis[i][1],
                        one * jaxis[i][2])
                if int(jtype[i]) == JOINT_REVOLUTE:
                    half = 0.5 * qpos[i]
                    c, s = jnp.cos(half), jnp.sin(half)
                    m = tuple(c * Aq[i][j] + s * Bq[i][j] for j in range(4))
                    bq = _qmul(pq, m)
                    bp = fp
                    axis_w.append(_qapply(bq, ax_l))
                else:
                    bq = _qmul(pq, tuple(one * Aq[i][j] for j in range(4)))
                    aw = _qapply(bq, ax_l)
                    bp = _add(fp, _scale(aw, qpos[i]))
                    axis_w.append(aw)
                body_p.append(bp)
                body_q.append(bq)

            # joint Plücker columns at ref + per-body spatial velocities
            cols_w, cols_v = [], []  # per dof: angular, linear 3-tuples
            for k in range(nq):
                anchor = _sub(body_p[k], (one * ref[0], one * ref[1],
                                          one * ref[2]))
                if int(jtype[k]) == JOINT_REVOLUTE:
                    cols_w.append(axis_w[k])
                    cols_v.append(_cross(anchor, axis_w[k]))
                else:
                    cols_w.append((zero, zero, zero))
                    cols_v.append(axis_w[k])
            vb_w, vb_v = [], []  # per body prefix sums
            for b in range(nq):
                par = plan.parent[b]
                tw = _scale(cols_w[b], qvel[b])
                tvv = _scale(cols_v[b], qvel[b])
                if par >= 0:
                    tw = _add(tw, vb_w[par])
                    tvv = _add(tvv, vb_v[par])
                vb_w.append(tw)
                vb_v.append(tvv)

            # ---------------- geom world poses ----------------
            # per-env geom-in-body offsets ride the input plane (they are
            # SimState, like geom_size — per-env model proportions)
            gpos, gquat = [], []
            for gi, g in enumerate(model.geoms):
                op = (gop[3 * gi], gop[3 * gi + 1], gop[3 * gi + 2])
                oq = (goq[4 * gi], goq[4 * gi + 1], goq[4 * gi + 2],
                      goq[4 * gi + 3])
                if g.kind == BodyKind.ROBOT_LINK:
                    if g.body >= 0:
                        pp, pq = body_p[g.body], body_q[g.body]
                    else:
                        pp = (one * base[0], one * base[1], one * base[2])
                        pq = (one * base[3], one * base[4], one * base[5],
                              one * base[6])
                elif g.kind == BodyKind.FREE:
                    j = g.body
                    pp = (fpose[7 * j], fpose[7 * j + 1], fpose[7 * j + 2])
                    pq = (fpose[7 * j + 3], fpose[7 * j + 4],
                          fpose[7 * j + 5], fpose[7 * j + 6])
                elif g.kind == BodyKind.KINEMATIC:
                    j = g.body
                    pp = (kin[7 * j], kin[7 * j + 1], kin[7 * j + 2])
                    pq = (kin[7 * j + 3], kin[7 * j + 4], kin[7 * j + 5],
                          kin[7 * j + 6])
                else:  # STATIC
                    sp = static_pose[g.body]
                    pp = (one * sp[0], one * sp[1], one * sp[2])
                    pq = (one * sp[3], one * sp[4], one * sp[5], one * sp[6])
                gpos.append(_add(pp, _qapply(pq, op)))
                gquat.append(_qmul(pq, oq))

            # ---------------- narrowphase ----------------
            # mirrors the engine's per-group vmapped evaluation order
            # exactly. Full mode: all P points into (P, 8, 128) stacks.
            # Chunked mode (plan.full_stacks False): emit_group is called
            # per chunk on the overlapping pairs only — nothing
            # P-persistent but the lam/lamt carry.

            def rep(t, n):
                return [t] * n

            def sdf_box(plx, ply, plz, hx, hy, hz):
                """point-in-box SDF + local outward normal (stacked),
                mirrors shapes._point_box_sdf."""
                qx = jnp.abs(plx) - hx
                qy = jnp.abs(ply) - hy
                qz = jnp.abs(plz) - hz
                ox = jnp.maximum(qx, 0.0)
                oy = jnp.maximum(qy, 0.0)
                oz = jnp.maximum(qz, 0.0)
                d_out = jnp.sqrt(ox * ox + oy * oy + oz * oz + 1e-18)
                qmax = jnp.maximum(qx, jnp.maximum(qy, qz))
                d_in = jnp.minimum(qmax, 0.0)
                sdf = d_out + d_in
                inv = 1.0 / jnp.sqrt(ox * ox + oy * oy + oz * oz + 1e-18)
                nox = ox * jnp.sign(plx) * inv
                noy = oy * jnp.sign(ply) * inv
                noz = oz * jnp.sign(plz) * inv
                ohx = (qx >= qmax).astype(jnp.float32)
                ohy = (qy >= qmax).astype(jnp.float32)
                ohz = (qz >= qmax).astype(jnp.float32)
                ohs = 1.0 / (ohx + ohy + ohz)
                nix = ohx * ohs * jnp.sign(plx)
                niy = ohy * ohs * jnp.sign(ply)
                niz = ohz * ohs * jnp.sign(plz)
                # re-normalize tie-split interior normals (shapes.py
                # _point_box_sdf: |n| < 1 on edge/corner-plane ties)
                ninv = 1.0 / jnp.sqrt(
                    nix * nix + niy * niy + niz * niz + 1e-18)
                nix, niy, niz = nix * ninv, niy * ninv, niz * ninv
                # 1e-6 threshold, not 1e-9: see shapes.py _point_box_sdf
                # (sqrt(1e-18) knife edge flips per backend)
                outside = d_out > 1e-6
                return sdf, (
                    jnp.where(outside, nox, nix),
                    jnp.where(outside, noy, niy),
                    jnp.where(outside, noz, niz),
                )

            def corners_in_box(ia_l, ib_l, rep=8, sign_row=None):
                """``rep`` sample points of each box A vs box B (stacked
                over pairs): 8 corners (default) or 14 corners+face-centers
                (symmetric box_box). Returns pos, n_world (B->A), depth
                stacks of len rep*n_pairs."""
                npair = len(ia_l)
                sign_row = _r_cs if sign_row is None else sign_row
                pa = [_stk([gpos[i][c] for i in ia_l for _ in range(rep)])
                      for c in range(3)]
                qa = [_stk([gquat[i][c] for i in ia_l for _ in range(rep)])
                      for c in range(4)]
                sa = [_stk([geom_size(i)[c] for i in ia_l
                            for _ in range(rep)]) for c in range(3)]
                pb = [_stk([gpos[i][c] for i in ib_l for _ in range(rep)])
                      for c in range(3)]
                qb = [_stk([gquat[i][c] for i in ib_l for _ in range(rep)])
                      for c in range(4)]
                sb = [_stk([geom_size(i)[c] for i in ib_l
                            for _ in range(rep)]) for c in range(3)]
                sgc = [pcst(sign_row + c)[:rep * npair] for c in range(3)]
                corner = _add(
                    tuple(pa),
                    _qapply(tuple(qa), (sa[0] * sgc[0], sa[1] * sgc[1],
                                        sa[2] * sgc[2])),
                )
                loc = _qapply(_qconj(tuple(qb)), _sub(corner, tuple(pb)))
                sdf, n_loc = sdf_box(loc[0], loc[1], loc[2],
                                     sb[0], sb[1], sb[2])
                n_w = _qapply(tuple(qb), n_loc)
                return corner, n_w, -sdf

            def emit_group(fn, ia_l, ib_l):
                """Narrowphase of (a subset of) one pair group's pairs ->
                (pos3, nrm3, dep) stacks, pair-major (engine order)."""
                name = fn.__name__
                npair = len(ia_l)
                if name == "plane_box":
                    # world plane normal; 8 box corners per pair
                    pa = [_stk([gpos[i][c] for i in ia_l for _ in range(8)])
                          for c in range(3)]
                    qa = [_stk([gquat[i][c] for i in ia_l for _ in range(8)])
                          for c in range(4)]
                    n = _qapply(tuple(qa), (0.0 * pa[0], 0.0 * pa[0],
                                            jnp.ones_like(pa[0])))
                    pb = [_stk([gpos[i][c] for i in ib_l for _ in range(8)])
                          for c in range(3)]
                    qb = [_stk([gquat[i][c] for i in ib_l for _ in range(8)])
                          for c in range(4)]
                    sb = [_stk([geom_size(i)[c] for i in ib_l
                                for _ in range(8)]) for c in range(3)]
                    sgc = [pcst(_r_cs + c)[:8 * npair] for c in range(3)]
                    corner = _add(
                        tuple(pb),
                        _qapply(tuple(qb), (sb[0] * sgc[0], sb[1] * sgc[1],
                                            sb[2] * sgc[2])),
                    )
                    dist = _dot(_sub(corner, tuple(pa)), n)
                    pos, nrm, dep = corner, _scale(n, -1.0), -dist
                elif name == "plane_capsule":
                    # 2 pts/pair: capsule ends vs the plane halfspace
                    rep2 = 2
                    pa = [_stk([gpos[i][c] for i in ia_l
                                for _ in range(rep2)]) for c in range(3)]
                    qa = [_stk([gquat[i][c] for i in ia_l
                                for _ in range(rep2)]) for c in range(4)]
                    pb = [_stk([gpos[i][c] for i in ib_l
                                for _ in range(rep2)]) for c in range(3)]
                    qb = [_stk([gquat[i][c] for i in ib_l
                                for _ in range(rep2)]) for c in range(4)]
                    sb = [_stk([geom_size(i)[c] for i in ib_l
                                for _ in range(rep2)]) for c in range(3)]
                    n = _qapply(tuple(qa), (0.0 * pa[0], 0.0 * pa[0],
                                            jnp.ones_like(pa[0])))
                    axis = _qapply(tuple(qb), (0.0 * pb[0], 0.0 * pb[0],
                                               jnp.ones_like(pb[0])))
                    sgn2 = pcst(_r_alt2)[:rep2 * npair]
                    end = _add(tuple(pb), _scale(axis, sb[1] * sgn2))
                    r = sb[0]
                    dist = _dot(_sub(end, tuple(pa)), n) - r
                    pos = _sub(end, _scale(n, r + 0.5 * dist))
                    nrm, dep = _scale(n, -1.0), -dist
                elif name == "sphere_capsule":
                    pa = [_stk([gpos[i][c] for i in ia_l]) for c in range(3)]
                    sa = [_stk([geom_size(i)[c] for i in ia_l])
                          for c in range(3)]
                    pb = [_stk([gpos[i][c] for i in ib_l]) for c in range(3)]
                    qb = [_stk([gquat[i][c] for i in ib_l]) for c in range(4)]
                    sb = [_stk([geom_size(i)[c] for i in ib_l])
                          for c in range(3)]
                    axis = _qapply(tuple(qb), (0.0 * pb[0], 0.0 * pb[0],
                                               jnp.ones_like(pb[0])))
                    t_ = jnp.clip(_dot(_sub(tuple(pa), tuple(pb)), axis),
                                  -sb[1], sb[1])
                    closest = _add(tuple(pb), _scale(axis, t_))
                    d = _sub(tuple(pa), closest)
                    dist = jnp.sqrt(_dot(d, d) + 1e-18)
                    n = _scale(d, 1.0 / dist)
                    dep = sa[0] + sb[0] - dist
                    pos = _add(closest, _scale(n, sb[0] - 0.5 * dep))
                    nrm = n
                elif name == "capsule_box":
                    # 3 sample spheres along the capsule axis vs the box
                    rep3 = 3
                    pa = [_stk([gpos[i][c] for i in ia_l
                                for _ in range(rep3)]) for c in range(3)]
                    qa = [_stk([gquat[i][c] for i in ia_l
                                for _ in range(rep3)]) for c in range(4)]
                    sa = [_stk([geom_size(i)[c] for i in ia_l
                                for _ in range(rep3)]) for c in range(3)]
                    pb = [_stk([gpos[i][c] for i in ib_l
                                for _ in range(rep3)]) for c in range(3)]
                    qb = [_stk([gquat[i][c] for i in ib_l
                                for _ in range(rep3)]) for c in range(4)]
                    sb = [_stk([geom_size(i)[c] for i in ib_l
                                for _ in range(rep3)]) for c in range(3)]
                    axis = _qapply(tuple(qa), (0.0 * pa[0], 0.0 * pa[0],
                                               jnp.ones_like(pa[0])))
                    sgn3 = pcst(_r_alt3)[:rep3 * npair]
                    center = _add(tuple(pa), _scale(axis, sa[1] * sgn3))
                    loc = _qapply(_qconj(tuple(qb)),
                                  _sub(center, tuple(pb)))
                    sdf, n_loc = sdf_box(loc[0], loc[1], loc[2],
                                         sb[0], sb[1], sb[2])
                    n = _qapply(tuple(qb), n_loc)
                    r = sa[0]
                    dep = r - sdf
                    pos = _sub(center, _scale(n, r - 0.5 * dep))
                    nrm = n
                elif name == "capsule_capsule":
                    pa = [_stk([gpos[i][c] for i in ia_l]) for c in range(3)]
                    qa = [_stk([gquat[i][c] for i in ia_l]) for c in range(4)]
                    sa = [_stk([geom_size(i)[c] for i in ia_l])
                          for c in range(3)]
                    pb = [_stk([gpos[i][c] for i in ib_l]) for c in range(3)]
                    qb = [_stk([gquat[i][c] for i in ib_l]) for c in range(4)]
                    sb = [_stk([geom_size(i)[c] for i in ib_l])
                          for c in range(3)]
                    ua = _qapply(tuple(qa), (0.0 * pa[0], 0.0 * pa[0],
                                             jnp.ones_like(pa[0])))
                    ub = _qapply(tuple(qb), (0.0 * pb[0], 0.0 * pb[0],
                                             jnp.ones_like(pb[0])))
                    d0 = _sub(tuple(pa), tuple(pb))
                    b_ = _dot(ua, ub)
                    c_ = _dot(ua, d0)
                    f_ = _dot(ub, d0)
                    denom = jnp.maximum(1.0 - b_ * b_, 1e-9)
                    s_ = jnp.clip((b_ * f_ - c_) / denom, -sa[1], sa[1])
                    t_ = jnp.clip(b_ * s_ + f_, -sb[1], sb[1])
                    s_ = jnp.clip(b_ * t_ - c_, -sa[1], sa[1])
                    ca_ = _add(tuple(pa), _scale(ua, s_))
                    cb_ = _add(tuple(pb), _scale(ub, t_))
                    d = _sub(ca_, cb_)
                    dist = jnp.sqrt(_dot(d, d) + 1e-18)
                    n = _scale(d, 1.0 / dist)
                    dep = sa[0] + sb[0] - dist
                    pos = _add(cb_, _scale(n, sb[0] - 0.5 * dep))
                    nrm = n
                elif name == "box_box_onesided":
                    pos, nrm, dep = corners_in_box(ia_l, ib_l)
                elif name in ("box_box", "box_box_corners"):
                    rep = 14 if name == "box_box" else 8
                    srow = _r_cs14 if name == "box_box" else _r_cs
                    pos_a, nrm_a, dep_a = corners_in_box(
                        ia_l, ib_l, rep=rep, sign_row=srow)
                    pos_b, nrm_b0, dep_b = corners_in_box(
                        ib_l, ia_l, rep=rep, sign_row=srow)
                    nrm_b = _scale(nrm_b0, -1.0)
                    # interleave per pair: [A-points(rep); B-points(rep)]
                    def ilv(xa, xb, rep=rep):
                        parts = []
                        for j in range(npair):
                            parts.append(xa[rep * j:rep * j + rep])
                            parts.append(xb[rep * j:rep * j + rep])
                        return jnp.concatenate(parts, axis=0)
                    pos = tuple(ilv(pos_a[c], pos_b[c]) for c in range(3))
                    nrm = tuple(ilv(nrm_a[c], nrm_b[c]) for c in range(3))
                    dep = ilv(dep_a, dep_b)
                elif name in ("plane_hull", "sphere_hull", "box_hull",
                              "capsule_hull", "hull_hull"):
                    # convex-hull narrowphase, mirrors shapes.py hull fns
                    # exactly. Per-env vertex/face tables ride the input
                    # plane; points are emitted pair-major like the
                    # engine's vmapped group evaluation.
                    from .hulls import HULL_F, HULL_P

                    slot_tab = model.geom_hull_slot

                    def read_hull(slot):
                        bv = plan.i_hverts[0] + slot * HULL_P * 3
                        verts = [
                            (row(bv + 3 * p), row(bv + 3 * p + 1),
                             row(bv + 3 * p + 2))
                            for p in range(HULL_P)
                        ]
                        bf = plan.i_hfaces[0] + slot * HULL_F * 4
                        faces = [
                            (row(bf + 4 * f2), row(bf + 4 * f2 + 1),
                             row(bf + 4 * f2 + 2), row(bf + 4 * f2 + 3))
                            for f2 in range(HULL_F)
                        ]
                        return verts, faces

                    def hull_sdf_stack(loc, faces):
                        """shapes._hull_sdf over a (n, 8, 128) point stack:
                        2 passes over the unrolled faces (max, then one-hot
                        normal accumulation) — exact tie semantics, no
                        (n, HULL_F) transient."""

                        def fd(f2):
                            nx_, ny_, nz_, off_ = faces[f2]
                            return (loc[0] * nx_[None] + loc[1] * ny_[None]
                                    + loc[2] * nz_[None] - off_[None])

                        sdf = fd(0)
                        for f2 in range(1, HULL_F):
                            sdf = jnp.maximum(sdf, fd(f2))
                        cnt = jnp.zeros_like(sdf)
                        ax = jnp.zeros_like(sdf)
                        ay = jnp.zeros_like(sdf)
                        az = jnp.zeros_like(sdf)
                        for f2 in range(HULL_F):
                            m = (fd(f2) >= sdf).astype(jnp.float32)
                            nx_, ny_, nz_, _off = faces[f2]
                            cnt = cnt + m
                            ax = ax + m * nx_[None]
                            ay = ay + m * ny_[None]
                            az = az + m * nz_[None]
                        inv = 1.0 / cnt
                        nx2, ny2, nz2 = ax * inv, ay * inv, az * inv
                        nn = jnp.maximum(jnp.sqrt(
                            nx2 * nx2 + ny2 * ny2 + nz2 * nz2), 1e-9)
                        i2 = 1.0 / nn
                        return sdf, (nx2 * i2, ny2 * i2, nz2 * i2)

                    def stk3(pts):
                        """list of 3-tuples of (8,128) -> 3-tuple stacks."""
                        return tuple(_stk([p[c] for p in pts])
                                     for c in range(3))

                    pos_pair, nrm_pair, dep_pair = [], [], []
                    for j in range(npair):
                        ga_i, gb_i = ia_l[j], ib_l[j]
                        pa_t, qa_t = gpos[ga_i], gquat[ga_i]
                        pb_t, qb_t = gpos[gb_i], gquat[gb_i]
                        sa_t = geom_size(ga_i)
                        if name == "hull_hull":
                            va, fa2 = read_hull(int(slot_tab[ga_i]))
                        vb, fb2 = read_hull(int(slot_tab[gb_i]))

                        def world_verts(p_t, q_t, verts):
                            return [
                                _add(p_t, _qapply(q_t, v)) for v in verts
                            ]

                        if name == "plane_hull":
                            n_t = _qapply(qa_t, (zero, zero, one))
                            w = stk3(world_verts(pb_t, qb_t, vb))
                            dist = _dot(
                                _sub(w, tuple(x[None] for x in pa_t)),
                                tuple(x[None] for x in n_t))
                            pos_j = w
                            nrm_j = tuple(-x[None]
                                          + jnp.zeros_like(dist)
                                          for x in n_t)
                            dep_j = -dist
                        elif name == "sphere_hull":
                            loc1 = _qapply(
                                _qconj(qb_t), _sub(pa_t, pb_t))
                            loc = tuple(x[None] for x in loc1)
                            sdf, nl = hull_sdf_stack(loc, fb2)
                            n_w = _qapply(
                                tuple(x[None] for x in qb_t), nl)
                            r = sa_t[0][None]
                            dep_j = r - sdf
                            pos_j = tuple(
                                pa_t[c][None] - n_w[c] * (r - 0.5 * dep_j)
                                for c in range(3))
                            nrm_j = n_w
                        elif name == "capsule_hull":
                            axis = _qapply(qa_t, (zero, zero, one))
                            centers = [
                                _add(pa_t, _scale(axis, sa_t[1] * t3))
                                for t3 in (-1.0, 0.0, 1.0)
                            ]
                            cs = stk3(centers)
                            loc = _qapply(
                                tuple(x[None] for x in _qconj(qb_t)),
                                _sub(cs, tuple(x[None] for x in pb_t)))
                            sdf, nl = hull_sdf_stack(loc, fb2)
                            n_w = _qapply(
                                tuple(x[None] for x in qb_t), nl)
                            r = sa_t[0][None]
                            dep_j = r - sdf
                            pos_j = tuple(
                                cs[c] - n_w[c] * (r - 0.5 * dep_j)
                                for c in range(3))
                            nrm_j = n_w
                        elif name == "box_hull":
                            # A's 8 corners vs hull SDF
                            corners = []
                            for sg in CORNER_SIGNS:
                                lv = (sa_t[0] * float(sg[0]),
                                      sa_t[1] * float(sg[1]),
                                      sa_t[2] * float(sg[2]))
                                corners.append(
                                    _add(pa_t, _qapply(qa_t, lv)))
                            ca = stk3(corners)
                            loc = _qapply(
                                tuple(x[None] for x in _qconj(qb_t)),
                                _sub(ca, tuple(x[None] for x in pb_t)))
                            sdf_a, nl_a = hull_sdf_stack(loc, fb2)
                            n_a = _qapply(
                                tuple(x[None] for x in qb_t), nl_a)
                            # B's verts vs box SDF
                            w = stk3(world_verts(pb_t, qb_t, vb))
                            locb = _qapply(
                                tuple(x[None] for x in _qconj(qa_t)),
                                _sub(w, tuple(x[None] for x in pa_t)))
                            sdf_b, nl_b = sdf_box(
                                locb[0], locb[1], locb[2],
                                sa_t[0][None], sa_t[1][None],
                                sa_t[2][None])
                            n_b = tuple(
                                -x for x in _qapply(
                                    tuple(y[None] for y in qa_t), nl_b))
                            pos_j = tuple(
                                jnp.concatenate([ca[c], w[c]], axis=0)
                                for c in range(3))
                            nrm_j = tuple(
                                jnp.concatenate([n_a[c], n_b[c]], axis=0)
                                for c in range(3))
                            dep_j = jnp.concatenate([-sdf_a, -sdf_b],
                                                    axis=0)
                        else:  # hull_hull
                            wa = stk3(world_verts(pa_t, qa_t, va))
                            loc_a = _qapply(
                                tuple(x[None] for x in _qconj(qb_t)),
                                _sub(wa, tuple(x[None] for x in pb_t)))
                            sdf_a, nl_a = hull_sdf_stack(loc_a, fb2)
                            n_a = _qapply(
                                tuple(x[None] for x in qb_t), nl_a)
                            wb = stk3(world_verts(pb_t, qb_t, vb))
                            loc_b = _qapply(
                                tuple(x[None] for x in _qconj(qa_t)),
                                _sub(wb, tuple(x[None] for x in pa_t)))
                            sdf_b, nl_b = hull_sdf_stack(loc_b, fa2)
                            n_b = tuple(
                                -x for x in _qapply(
                                    tuple(y[None] for y in qa_t), nl_b))
                            pos_j = tuple(
                                jnp.concatenate([wa[c], wb[c]], axis=0)
                                for c in range(3))
                            nrm_j = tuple(
                                jnp.concatenate([n_a[c], n_b[c]], axis=0)
                                for c in range(3))
                            dep_j = jnp.concatenate([-sdf_a, -sdf_b],
                                                    axis=0)
                        pos_pair.append(pos_j)
                        nrm_pair.append(nrm_j)
                        dep_pair.append(dep_j)
                    pos = tuple(
                        jnp.concatenate([p[c] for p in pos_pair], axis=0)
                        for c in range(3))
                    nrm = tuple(
                        jnp.concatenate([p[c] for p in nrm_pair], axis=0)
                        for c in range(3))
                    dep = jnp.concatenate(dep_pair, axis=0)
                elif name in ("plane_sphere", "sphere_box", "box_sphere",
                              "sphere_sphere"):
                    pa = [_stk([gpos[i][c] for i in ia_l]) for c in range(3)]
                    qa = [_stk([gquat[i][c] for i in ia_l]) for c in range(4)]
                    sa = [_stk([geom_size(i)[c] for i in ia_l])
                          for c in range(3)]
                    pb = [_stk([gpos[i][c] for i in ib_l]) for c in range(3)]
                    qb = [_stk([gquat[i][c] for i in ib_l]) for c in range(4)]
                    sb = [_stk([geom_size(i)[c] for i in ib_l])
                          for c in range(3)]
                    if name == "plane_sphere":
                        n = _qapply(tuple(qa), (0.0 * pa[0], 0.0 * pa[0],
                                                jnp.ones_like(pa[0])))
                        r = sb[0]
                        dist = _dot(_sub(tuple(pb), tuple(pa)), n) - r
                        pos = _sub(tuple(pb), _scale(n, r + 0.5 * dist))
                        nrm, dep = _scale(n, -1.0), -dist
                    elif name == "sphere_sphere":
                        d = _sub(tuple(pa), tuple(pb))
                        dist = jnp.sqrt(_dot(d, d) + 1e-18)
                        n = _scale(d, 1.0 / dist)
                        dep = sa[0] + sb[0] - dist
                        pos = _add(tuple(pb), _scale(n, sb[0] - 0.5 * dep))
                        nrm = n
                    else:
                        if name == "box_sphere":
                            pa, qa, sa, pb, qb, sb = pb, qb, sb, pa, qa, sa
                        r = sa[0]
                        loc = _qapply(_qconj(tuple(qb)),
                                      _sub(tuple(pa), tuple(pb)))
                        sdf, n_loc = sdf_box(loc[0], loc[1], loc[2],
                                             sb[0], sb[1], sb[2])
                        n = _qapply(tuple(qb), n_loc)
                        dep = r - sdf
                        pos = _sub(tuple(pa), _scale(n, r - 0.5 * dep))
                        nrm = n
                        if name == "box_sphere":
                            nrm = _scale(nrm, -1.0)
                else:  # pragma: no cover — guarded by supports()
                    raise NotImplementedError(name)
                return pos, nrm, dep

            # static group layout: (start point, pts per pair, fn, ia, ib)
            group_layout = []
            _goff = 0
            for (fn, npts, ia_arr, ib_arr, _mu) in model.pair_groups:
                ia_l = [int(i) for i in ia_arr]
                ib_l = [int(i) for i in ib_arr]
                group_layout.append((_goff, int(npts), fn, ia_l, ib_l))
                _goff += int(npts) * len(ia_l)

            cpos = cnrm = cdep = None
            if P == 0:
                # single-tile dummies: Mosaic rejects zero-sized vectors,
                # and nothing consumes these values when P == 0
                zp3 = jnp.zeros((1, eb // 128, 128), jnp.float32)
                cpos = (zp3, zp3, zp3)
                cnrm = (zp3, zp3, zp3)
                cdep = zp3
            elif plan.full_stacks:
                cpos_c = [[], [], []]
                cnrm_c = [[], [], []]
                cdep_l = []
                for (_g0, _npts, fn, ia_l, ib_l) in group_layout:
                    pos, nrm, dep = emit_group(fn, ia_l, ib_l)
                    for c in range(3):
                        cpos_c[c].append(pos[c])
                        cnrm_c[c].append(nrm[c])
                    cdep_l.append(dep)
                cpos = tuple(
                    jnp.concatenate(cpos_c[c], axis=0) for c in range(3)
                )
                cnrm = tuple(
                    jnp.concatenate(cnrm_c[c], axis=0) for c in range(3)
                )
                cdep = jnp.concatenate(cdep_l, axis=0)  # (P, 8, 128)

            def narrow_slice(c0, c1):
                """(pos3, nrm3, dep) for points [c0:c1) — sliced from the
                full stacks, or recomputed from the overlapping pairs."""
                if cpos is not None:
                    return (tuple(cpos[c][c0:c1] for c in range(3)),
                            tuple(cnrm[c][c0:c1] for c in range(3)),
                            cdep[c0:c1])
                pp = [[], [], []]
                nn_ = [[], [], []]
                dd = []
                for (g0, rep_g, fn, ia_l, ib_l) in group_layout:
                    g1 = g0 + rep_g * len(ia_l)
                    if g1 <= c0 or g0 >= c1:
                        continue
                    j_lo = max(0, (c0 - g0) // rep_g)
                    j_hi = min(len(ia_l) - 1, (c1 - 1 - g0) // rep_g)
                    pos, nrm, dep = emit_group(
                        fn, ia_l[j_lo:j_hi + 1], ib_l[j_lo:j_hi + 1])
                    base0 = g0 + j_lo * rep_g
                    lo = max(c0, base0) - base0
                    hi = min(c1, g0 + (j_hi + 1) * rep_g) - base0
                    for c in range(3):
                        pp[c].append(pos[c][lo:hi])
                        nn_[c].append(nrm[c][lo:hi])
                    dd.append(dep[lo:hi])

                def cat(xs):
                    return xs[0] if len(xs) == 1 else jnp.concatenate(
                        xs, axis=0)

                return (tuple(cat(pp[c]) for c in range(3)),
                        tuple(cat(nn_[c]) for c in range(3)), cat(dd))

            # ---------------- per-point pipeline (CHUNKED) ---------------
            # Per-dof × per-point products are processed _CHUNK points at a
            # time with per-chunk static dof pruning, so VMEM holds
            # (n_active_dofs × 3 × _CHUNK) transients instead of
            # (n_all × 3 × P) stacks. This is what lifts the round-2
            # P<=220 / n_all<=24 scene-size gate (StackCube P=248,
            # PegInsertionSide P=328, PlugCharger P=453, cabinet forests
            # P=320/nq=16, humanoid nq=27 all fit now).
            chunk_bounds = []
            if P > 0:
                chunk_bounds = [
                    (c0, min(c0 + _CHUNK, P))
                    for c0 in range(0, P, _CHUNK)
                ]
                d_n0_f = pcst(_r_dn0)
                cmu_f = pcst(_r_cmu)

                def side_vel(rel, pos_s, c0, c1, r_idx, f_idx, vbw, vbv,
                             fvel_rows):
                    """Stacked point velocity of one side over [c0:c1)."""
                    rr = [int(b) for b in r_idx[c0:c1]]
                    ff = [int(j) for j in f_idx[c0:c1]]
                    n = c1 - c0
                    rx, ry, rz = rel
                    zch = jnp.zeros((n, eb // 128, 128), jnp.float32)
                    if any(b >= 0 for b in rr):
                        vx = _stk([(vbv[b][0] if b >= 0 else zero) for b in rr])
                        vy = _stk([(vbv[b][1] if b >= 0 else zero) for b in rr])
                        vz = _stk([(vbv[b][2] if b >= 0 else zero) for b in rr])
                        wx = _stk([(vbw[b][0] if b >= 0 else zero) for b in rr])
                        wy = _stk([(vbw[b][1] if b >= 0 else zero) for b in rr])
                        wz = _stk([(vbw[b][2] if b >= 0 else zero) for b in rr])
                        vx = vx + wy * rz - wz * ry
                        vy = vy + wz * rx - wx * rz
                        vz = vz + wx * ry - wy * rx
                    else:
                        vx = vy = vz = zch
                    # free side: v + ω × (cpos − fp)
                    # fvel rows: [lin xyz, ang xyz] per body
                    if any(j >= 0 for j in ff):
                        def frow(j, i):
                            return fvel_rows[6 * j + i] if j >= 0 else zero
                        flx = _stk([frow(j, 0) for j in ff])
                        fly = _stk([frow(j, 1) for j in ff])
                        flz = _stk([frow(j, 2) for j in ff])
                        fwx = _stk([frow(j, 3) for j in ff])
                        fwy = _stk([frow(j, 4) for j in ff])
                        fwz = _stk([frow(j, 5) for j in ff])
                        fpx = _stk([(fpose[7 * j] if j >= 0 else zero)
                                    for j in ff])
                        fpy = _stk([(fpose[7 * j + 1] if j >= 0 else zero)
                                    for j in ff])
                        fpz = _stk([(fpose[7 * j + 2] if j >= 0 else zero)
                                    for j in ff])
                        ax_ = pos_s[0] - fpx
                        ay_ = pos_s[1] - fpy
                        az_ = pos_s[2] - fpz
                        vx = vx + flx + fwy * az_ - fwz * ay_
                        vy = vy + fly + fwz * ax_ - fwx * az_
                        vz = vz + flz + fwx * ay_ - fwy * ax_
                    return vx, vy, vz

                def point_vels(ctx, c0, c1, vbw, vbv, fvel_rows):
                    cn = ctx["cn"]
                    rel = ctx["rel"]
                    pos_s = ctx["pos"]
                    va = side_vel(rel, pos_s, c0, c1, plan.ra_idx,
                                  plan.fa_idx, vbw, vbv, fvel_rows)
                    vb = side_vel(rel, pos_s, c0, c1, plan.rb_idx,
                                  plan.fb_idx, vbw, vbv, fvel_rows)
                    rvx, rvy, rvz = (va[0] - vb[0], va[1] - vb[1],
                                     va[2] - vb[2])
                    v_n = rvx * cn[0] + rvy * cn[1] + rvz * cn[2]
                    return v_n, (rvx - v_n * cn[0], rvy - v_n * cn[1],
                                 rvz - v_n * cn[2])

                def chunk_ctx(c0, c1):
                    """Narrowphase + warm-start/depth contact terms of a
                    chunk (recomputed here in chunked-narrowphase mode)."""
                    pos_s, cn, cd = narrow_slice(c0, c1)
                    rel = (pos_s[0] - ref[0], pos_s[1] - ref[1],
                           pos_s[2] - ref[2])
                    lam_ch = lam[c0:c1]
                    active = (cd > -margin).astype(jnp.float32)
                    pen_bias = jnp.minimum(
                        beta * jnp.maximum(cd, 0.0) / h, bias_max
                    )
                    spec_b = jnp.minimum(cd, 0.0) / h
                    # project warm-started friction onto the tangent plane
                    ltn = (lamt[0][c0:c1] * cn[0] + lamt[1][c0:c1] * cn[1]
                           + lamt[2][c0:c1] * cn[2])
                    lt = tuple(lamt[c][c0:c1] - ltn * cn[c] for c in range(3))
                    return dict(
                        pos=pos_s, rel=rel, cn=cn, cd=cd, lam=lam_ch,
                        active=active,
                        t_vel=spec_b, t_pos=spec_b + pen_bias, lt=lt,
                        d_n0=d_n0_f[c0:c1], cmu=cmu_f[c0:c1],
                    )

                def forces_at(ctx, v_n_, v_t_):
                    f_n_vel = jnp.maximum(
                        ctx["lam"] + ctx["d_n0"] * (ctx["t_vel"] - v_n_), 0.0
                    ) * ctx["active"]
                    f_n_pos = jnp.maximum(
                        ctx["lam"] + ctx["d_n0"] * (ctx["t_pos"] - v_n_), 0.0
                    ) * ctx["active"]
                    ftx = ctx["lt"][0] - ctx["d_n0"] * v_t_[0]
                    fty = ctx["lt"][1] - ctx["d_n0"] * v_t_[1]
                    ftz = ctx["lt"][2] - ctx["d_n0"] * v_t_[2]
                    tn = jnp.sqrt(ftx * ftx + fty * fty + ftz * ftz + 1e-18)
                    cap = ctx["cmu"] * f_n_pos
                    sc = jnp.minimum(1.0, cap / tn)
                    return (f_n_vel, f_n_pos,
                            (ftx * sc, fty * sc, ftz * sc), tn <= cap)

            # pass 1: forces at current velocities -> gf rhs + L coupling
            gf_vel = [zero] * n_all
            gf_pos = [zero] * n_all
            L = [[None] * n_all for _ in range(n_all)]
            for (c0, c1) in chunk_bounds:
                ctx = chunk_ctx(c0, c1)
                cn = ctx["cn"]
                v_n, v_t = point_vels(ctx, c0, c1, vb_w, vb_v, fvel)
                f_n_vel, f_n_pos, f_t, sticking = forces_at(ctx, v_n, v_t)
                # loaded gate (engine.py point_forces): stored-load points
                # stay in the implicit LHS or resting bodies limit-cycle at
                # ±g·h/2
                gate = jnp.maximum(
                    (f_n_vel > 0).astype(jnp.float32),
                    (ctx["lam"] > 0).astype(jnp.float32) * ctx["active"],
                )
                d_n = ctx["d_n0"] * gate
                vt_norm = jnp.sqrt(_dot(v_t, v_t) + vreg * vreg)
                d_t = jnp.where(
                    sticking, ctx["d_n0"], ctx["cmu"] * f_n_pos / vt_norm
                ) * gate
                f_vel = tuple(f_n_vel * cn[c] + f_t[c] for c in range(3))
                f_pos = tuple(f_n_pos * cn[c] + f_t[c] for c in range(3))
                # aux: last-substep contact forces (chunk rows)
                for c in range(3):
                    out_ref[plan.o_fpt[0] + c * P + c0:
                            plan.o_fpt[0] + c * P + c1] = f_pos[c]
                h_dt = h * d_t
                h_nn = h * (d_n - d_t)
                # per-chunk static dof pruning: only dofs whose sign rows
                # are nonzero in THIS chunk get C rows
                Cr = {}
                rx, ry, rz = ctx["rel"]
                for k in range(nq):
                    if not np.any(plan.sm[k][c0:c1]):
                        continue
                    smk = pcst(k)[c0:c1]
                    wkx, wky, wkz = cols_w[k]
                    vkx, vky, vkz = cols_v[k]
                    Cr[k] = (
                        smk * (vkx + wky * rz - wkz * ry),
                        smk * (vky + wkz * rx - wkx * rz),
                        smk * (vkz + wkx * ry - wky * rx),
                    )
                for j in range(F):
                    if not np.any(plan.sgn_free[j][c0:c1]):
                        continue
                    sj = pcst(nq + j)[c0:c1]
                    ax_ = ctx["pos"][0] - fpose[7 * j]
                    ay_ = ctx["pos"][1] - fpose[7 * j + 1]
                    az_ = ctx["pos"][2] - fpose[7 * j + 2]
                    za = jnp.zeros_like(ax_)
                    sjo = sj * jnp.ones_like(ax_)
                    o = nq + 6 * j
                    Cr[o + 0] = (za, -az_ * sj, ay_ * sj)       # ω_x
                    Cr[o + 1] = (az_ * sj, za, -ax_ * sj)       # ω_y
                    Cr[o + 2] = (-ay_ * sj, ax_ * sj, za)       # ω_z
                    Cr[o + 3] = (sjo, za, za)                   # v_x
                    Cr[o + 4] = (za, sjo, za)                   # v_y
                    Cr[o + 5] = (za, za, sjo)                   # v_z
                dofs = sorted(Cr)
                Gn = {
                    d: (Cr[d][0] * cn[0] + Cr[d][1] * cn[1]
                        + Cr[d][2] * cn[2])
                    for d in dofs
                }
                for d in dofs:
                    cxd, cyd, czd = Cr[d]
                    gf_vel[d] = gf_vel[d] + jnp.sum(
                        cxd * f_vel[0] + cyd * f_vel[1] + czd * f_vel[2],
                        axis=0,
                    )
                    gf_pos[d] = gf_pos[d] + jnp.sum(
                        cxd * f_pos[0] + cyd * f_pos[1] + czd * f_pos[2],
                        axis=0,
                    )
                    cwx, cwy, cwz = cxd * h_dt, cyd * h_dt, czd * h_dt
                    gnw = Gn[d] * h_nn
                    for e in dofs:
                        if e < d:
                            continue
                        acc = jnp.sum(
                            cwx * Cr[e][0] + cwy * Cr[e][1] + cwz * Cr[e][2]
                            + gnw * Gn[e],
                            axis=0,
                        )
                        L[d][e] = acc if L[d][e] is None else L[d][e] + acc

            # ---------------- robot mass + bias ----------------
            lhs = [[None] * n_all for _ in range(n_all)]
            rhs_vel = [zero] * n_all
            rhs_pos = [zero] * n_all
            if nq > 0:
                # CoM positions + world inertia rows per body
                com_w = []
                Iw = []
                for b in range(nb):
                    cw = _add(body_p[b], _qapply(body_q[b],
                              (one * com_b[b][0], one * com_b[b][1],
                               one * com_b[b][2])))
                    cw = _sub(cw, (one * ref[0], one * ref[1], one * ref[2]))
                    com_w.append(cw)
                    qw, qx, qy, qz = body_q[b]
                    txq, tyq, tzq = 2 * qx, 2 * qy, 2 * qz
                    Rm = [
                        [1 - (tyq * qy + tzq * qz), txq * qy - tzq * qw,
                         tzq * qx + tyq * qw],
                        [txq * qy + tzq * qw, 1 - (txq * qx + tzq * qz),
                         tyq * qz - txq * qw],
                        [tzq * qx - tyq * qw, tyq * qz + txq * qw,
                         1 - (txq * qx + tyq * qy)],
                    ]
                    Ic = Icom_b[b]
                    B3 = [[sum(Rm[c][a] * float(Ic[a, d2])
                               for a in range(3)) for d2 in range(3)]
                          for c in range(3)]
                    Iwb = [[None] * 3 for _ in range(3)]
                    for c in range(3):
                        for e in range(c, 3):
                            Iwb[c][e] = sum(B3[c][d2] * Rm[e][d2]
                                            for d2 in range(3))
                            Iwb[e][c] = Iwb[c][e]
                    Iw.append(Iwb)

                # mass matrix entries over ancestor-overlap pairs
                anc_np = plan.anc  # (nb, nq)
                for k in range(nq):
                    for l in range(k, nq):
                        bodies = [b for b in range(nb)
                                  if anc_np[b, k] and anc_np[b, l]]
                        if not bodies:
                            continue
                        acc = zero
                        for b in bodies:
                            uk = _add(cols_v[k],
                                      _cross(cols_w[k], com_w[b]))
                            ul = _add(cols_v[l],
                                      _cross(cols_w[l], com_w[b]))
                            lin = _dot(uk, ul) * float(mass_b[b])
                            rot = zero
                            for c in range(3):
                                rot = rot + cols_w[k][c] * (
                                    Iw[b][c][0] * cols_w[l][0]
                                    + Iw[b][c][1] * cols_w[l][1]
                                    + Iw[b][c][2] * cols_w[l][2]
                                )
                            acc = acc + lin + rot
                        lhs[k][l] = acc if lhs[k][l] is None else (
                            lhs[k][l] + acc)

                def I_apply(b, w3, u3):
                    z3 = _add(u3, _cross(w3, com_w[b]))
                    Iww = tuple(
                        Iw[b][c][0] * w3[0] + Iw[b][c][1] * w3[1]
                        + Iw[b][c][2] * w3[2]
                        for c in range(3)
                    )
                    tq_ = _add(Iww, _scale(_cross(com_w[b], z3),
                                           float(mass_b[b])))
                    return tq_, _scale(z3, float(mass_b[b]))

                # bias: ṡ = v ×̂ s ; a_bias = prefix(ṡ q̇); f = I a + v ×* I v
                sd_w, sd_v = [], []
                for k in range(nq):
                    sw = _cross(vb_w[k], cols_w[k])
                    sv = _add(_cross(vb_w[k], cols_v[k]),
                              _cross(vb_v[k], cols_w[k]))
                    sd_w.append(sw)
                    sd_v.append(sv)
                ab_w, ab_v = [], []
                for b in range(nq):
                    par = plan.parent[b]
                    tw = _scale(sd_w[b], qvel[b])
                    tvv = _scale(sd_v[b], qvel[b])
                    if par >= 0:
                        tw = _add(tw, ab_w[par])
                        tvv = _add(tvv, ab_v[par])
                    ab_w.append(tw)
                    ab_v.append(tvv)
                fbias_t, fbias_f = [], []
                for b in range(nb):
                    t1, f1 = I_apply(b, ab_w[b], ab_v[b])
                    ti, fi = I_apply(b, vb_w[b], vb_v[b])
                    # force cross v ×* f = [w×τ + v×f ; w×f]
                    t2 = _add(_cross(vb_w[b], ti), _cross(vb_v[b], fi))
                    f2 = _cross(vb_w[b], fi)
                    # gravity wrench at ref: τ = c×F, F = m g
                    gmb = float(gmask[b]) * float(mass_b[b])
                    Fg = (one * gvec[0] * gmb,
                          one * gvec[1] * gmb,
                          one * gvec[2] * gmb)
                    tg = _cross(com_w[b], Fg)
                    fbias_t.append(_sub(_add(t1, t2), tg))
                    fbias_f.append(_sub(_add(f1, f2), Fg))
                # suffix up the tree, then tau_bias[k] = s_k · S_k
                St = list(fbias_t)
                Sf = list(fbias_f)
                for b in range(nq - 1, -1, -1):
                    par = plan.parent[b]
                    if par >= 0:
                        St[par] = _add(St[par], St[b])
                        Sf[par] = _add(Sf[par], Sf[b])
                for k in range(nq):
                    tau_bias = _dot(cols_w[k], St[k]) + _dot(cols_v[k], Sf[k])
                    # drives + limits
                    td = jnp.clip(
                        kp_r[k] * (tq[k] - qpos[k])
                        + kd_r[k] * (tv[k] - qvel[k]),
                        -flim_r[k], flim_r[k],
                    )
                    viol_lo = jnp.maximum(float(qlim[k, 0]) - qpos[k], 0.0)
                    viol_hi = jnp.maximum(qpos[k] - float(qlim[k, 1]), 0.0)
                    in_viol = ((viol_lo > 0) | (viol_hi > 0)).astype(
                        jnp.float32)
                    t_lim = (lim_k * (viol_lo - viol_hi)
                             - lim_d * in_viol * qvel[k])
                    fvreg = params.joint_friction_vreg
                    sat = jnp.clip(qvel[k] / fvreg, -1.0, 1.0)
                    t_fric = -float(jfric[k]) * sat
                    in_band = (jnp.abs(qvel[k]) < fvreg).astype(jnp.float32)
                    r = td + qf[k] + t_lim + t_fric - tau_bias
                    rhs_vel[k] = r
                    rhs_pos[k] = r
                    dd = (
                        h * (kp_r[k] * h + kd_r[k])
                        + h * float(jdamp[k]) + 1e-6
                        + h * in_band * float(jfric[k]) / fvreg
                        + in_viol * (h * (lim_k * h + lim_d))
                    )
                    lhs[k][k] = (lhs[k][k] if lhs[k][k] is not None
                                 else zero) + dd

            # ---------------- free-body diagonal + rhs ----------------
            for j in range(F):
                qj = (fpose[7 * j + 3], fpose[7 * j + 4], fpose[7 * j + 5],
                      fpose[7 * j + 6])
                qw, qx, qy, qz = qj
                txq, tyq, tzq = 2 * qx, 2 * qy, 2 * qz
                Rm = [
                    [1 - (tyq * qy + tzq * qz), txq * qy - tzq * qw,
                     tzq * qx + tyq * qw],
                    [txq * qy + tzq * qw, 1 - (txq * qx + tzq * qz),
                     tyq * qz - txq * qw],
                    [tzq * qx - tyq * qw, tyq * qz + txq * qw,
                     1 - (txq * qx + tyq * qy)],
                ]
                # symmetric body-frame inertia rows [xx, xy, xz, yy, yz, zz]
                Icd = [[fIc[6 * j + 0], fIc[6 * j + 1], fIc[6 * j + 2]],
                       [fIc[6 * j + 1], fIc[6 * j + 3], fIc[6 * j + 4]],
                       [fIc[6 * j + 2], fIc[6 * j + 4], fIc[6 * j + 5]]]
                B3 = [[sum(Rm[c][a] * Icd[a][d2] for a in range(3))
                       for d2 in range(3)] for c in range(3)]
                Iwj = [[None] * 3 for _ in range(3)]
                for c in range(3):
                    for e in range(c, 3):
                        Iwj[c][e] = sum(B3[c][d2] * Rm[e][d2]
                                        for d2 in range(3))
                        Iwj[e][c] = Iwj[c][e]
                o = nq + 6 * j
                for c in range(3):
                    for e in range(c, 3):
                        add = Iwj[c][e]
                        cur = lhs[o + c][o + e]
                        lhs[o + c][o + e] = add if cur is None else cur + add
                    cur = lhs[o + c][o + c]
                    lhs[o + c][o + c] = cur + 1e-9
                    curl = lhs[o + 3 + c][o + 3 + c]
                    mj = fmass[j] + 1e-9
                    lhs[o + 3 + c][o + 3 + c] = (
                        mj if curl is None else curl + mj)
                # rhs: gyro + gravity ([ω; v] dof order)
                wj = (fvel[6 * j + 3], fvel[6 * j + 4], fvel[6 * j + 5])
                Iww = tuple(
                    Iwj[c][0] * wj[0] + Iwj[c][1] * wj[1]
                    + Iwj[c][2] * wj[2] for c in range(3)
                )
                gyro = _cross(wj, Iww)
                for c in range(3):
                    rhs_vel[o + c] = -gyro[c]
                    rhs_pos[o + c] = -gyro[c]
                    gcomp = fmass[j] * gvec[c]
                    rhs_vel[o + 3 + c] = gcomp
                    rhs_pos[o + 3 + c] = gcomp

            # fold contact terms into lhs / rhs
            for d in range(n_all):
                rhs_vel[d] = rhs_vel[d] + gf_vel[d]
                rhs_pos[d] = rhs_pos[d] + gf_pos[d]
                for e in range(d, n_all):
                    if L[d][e] is not None:
                        cur = lhs[d][e]
                        lhs[d][e] = L[d][e] if cur is None else cur + L[d][e]

            # ---------------- Cholesky pair solve (scalarized) -----------
            # L lower factor columns; lhs[d][e] holds upper triangle (d<=e)
            def at(d, e):
                v = lhs[d][e] if d <= e else lhs[e][d]
                return zero if v is None else v

            Lc = [[None] * n_all for _ in range(n_all)]
            Dinv = [None] * n_all
            for jcol in range(n_all):
                s = at(jcol, jcol)
                for kk in range(jcol):
                    s = s - Lc[jcol][kk] * Lc[jcol][kk]
                dinv = jax.lax.rsqrt(jnp.maximum(s, 1e-12))
                Dinv[jcol] = dinv
                Lc[jcol][jcol] = jnp.maximum(s, 1e-12) * dinv
                for i2 in range(jcol + 1, n_all):
                    s2 = at(i2, jcol)
                    for kk in range(jcol):
                        s2 = s2 - Lc[i2][kk] * Lc[jcol][kk]
                    Lc[i2][jcol] = s2 * dinv

            def solve(rhs):
                y = [None] * n_all
                for i2 in range(n_all):
                    s = rhs[i2] * h
                    for kk in range(i2):
                        s = s - Lc[i2][kk] * y[kk]
                    y[i2] = s * Dinv[i2]
                x = [None] * n_all
                for i2 in range(n_all - 1, -1, -1):
                    s = y[i2]
                    for kk in range(i2 + 1, n_all):
                        s = s - Lc[kk][i2] * x[kk]
                    x[i2] = s * Dinv[i2]
                return x

            dv_vel = solve(rhs_vel)
            dv_pos = solve(rhs_pos)

            # ---------------- integration ----------------
            qpos_n, qvel_n = [], []
            for k in range(nq):
                qvel_n.append(qvel[k] + dv_vel[k])
                qpos_n.append(qpos[k] + h * (qvel[k] + dv_pos[k]))
            fpose_n = list(fpose)
            fvel_n = list(fvel)
            max_w = float(params.max_ang_vel)
            max_v = float(params.max_lin_vel)

            def _vclamp(vec, cap):
                # PhysX-parity velocity clamp (engine.py integration parity;
                # guards the explicit-gyro blow-up at |ω|h >> 1)
                n2 = vec[0] * vec[0] + vec[1] * vec[1] + vec[2] * vec[2]
                s = jnp.minimum(1.0, cap * jax.lax.rsqrt(n2 + 1e-24))
                return tuple(v * s for v in vec)

            for j in range(F):
                o = nq + 6 * j
                w_new = _vclamp(tuple(fvel[6 * j + 3 + c] + dv_vel[o + c]
                                      for c in range(3)), max_w)
                v_new = _vclamp(tuple(fvel[6 * j + c] + dv_vel[o + 3 + c]
                                      for c in range(3)), max_v)
                w_int = _vclamp(tuple(fvel[6 * j + 3 + c] + dv_pos[o + c]
                                      for c in range(3)), max_w)
                v_int = _vclamp(tuple(fvel[6 * j + c] + dv_pos[o + 3 + c]
                                      for c in range(3)), max_v)
                for c in range(3):
                    fpose_n[7 * j + c] = fpose[7 * j + c] + h * v_int[c]
                    fvel_n[6 * j + c] = v_new[c]
                    fvel_n[6 * j + 3 + c] = w_new[c]
                qold = (fpose[7 * j + 3], fpose[7 * j + 4],
                        fpose[7 * j + 5], fpose[7 * j + 6])
                qn = _qnormalize(_qmul(_qexp(tuple(h * w for w in w_int)),
                                       qold))
                for c in range(4):
                    fpose_n[7 * j + 3 + c] = qn[c]

            # ---------------- relam (post-solve warm-start update) -------
            vb_w2, vb_v2 = [], []
            for b in range(nq):
                par = plan.parent[b]
                tw = _scale(cols_w[b], qvel_n[b])
                tvv = _scale(cols_v[b], qvel_n[b])
                if par >= 0:
                    tw = _add(tw, vb_w2[par])
                    tvv = _add(tvv, vb_v2[par])
                vb_w2.append(tw)
                vb_v2.append(tvv)
            # pass 2 over the chunks: forces at the NEW velocities update
            # the warm-started impulse accumulators
            if P > 0:
                lam_parts = []
                lamt_parts = ([], [], [])
                for (c0, c1) in chunk_bounds:
                    ctx = chunk_ctx(c0, c1)
                    v_n2, v_t2 = point_vels(
                        ctx, c0, c1, vb_w2, vb_v2, fvel_n
                    )
                    f_n_vel2, _fnp2, f_t2, _st2 = forces_at(ctx, v_n2, v_t2)
                    touch = jnp.clip(1.0 + ctx["cd"] / 1e-3, 0.0, 1.0)
                    lam_parts.append(jnp.maximum(
                        (1 - relax) * ctx["lam"] + relax * f_n_vel2, 0.0
                    ) * touch)
                    for c in range(3):
                        lamt_parts[c].append(
                            ((1 - relax) * ctx["lt"][c] + relax * f_t2[c])
                            * touch
                        )
                lam_n = (jnp.concatenate(lam_parts, axis=0)
                         if len(lam_parts) > 1 else lam_parts[0])
                lamt_n = tuple(
                    (jnp.concatenate(lamt_parts[c], axis=0)
                     if len(lamt_parts[c]) > 1 else lamt_parts[c][0])
                    for c in range(3)
                )
            else:
                lam_n, lamt_n = lam, lamt

            # last-substep aux (overwritten each substep; final persists):
            # contact forces were written chunk-wise in pass 1 above
            for b in range(nb):
                for c in range(3):
                    out_ref[plan.o_bpos[0] + c * nb + b] = body_p[b][c]
                    out_ref[plan.o_axis[0] + c * nb + b] = axis_w[b][c]
                for c in range(4):
                    out_ref[plan.o_bquat[0] + c * nb + b] = body_q[b][c]

            return (tuple(qpos_n), tuple(qvel_n), tuple(fpose_n),
                    tuple(fvel_n), lam_n, lamt_n)

        carry = (qpos0, qvel0, fpose0, fvel0, lam0, lamt0)
        if n_substeps <= 2:
            for _ in range(n_substeps):
                carry = substep(carry)
        else:
            carry = jax.lax.fori_loop(
                0, n_substeps, lambda i, c: substep(c), carry
            )
        (qpos, qvel, fpose, fvel, lam, lamt) = carry
        for i in range(nq):
            out_ref[plan.o_qpos[0] + i] = qpos[i]
            out_ref[plan.o_qvel[0] + i] = qvel[i]
        for i in range(7 * F):
            out_ref[plan.o_free_pose[0] + i] = fpose[i]
        for i in range(6 * F):
            out_ref[plan.o_free_vel[0] + i] = fvel[i]
        if P > 0:
            out_ref[plan.o_lam[0]:plan.o_lam[1]] = lam
            for c in range(3):
                out_ref[
                    plan.o_lamt[0] + c * P:plan.o_lamt[0] + (c + 1) * P
                ] = lamt[c]

    return kernel, const_plane


_PLANS = {}


def _plan_for(model: SceneModel) -> _Plan:
    key = id(model)
    if key not in _PLANS:
        _PLANS[key] = _Plan(model)
    return _PLANS[key]


def make_pallas_step_fn(model: SceneModel, sim_steps: int, *,
                        interpret: bool = False, eb: int = EB):
    """Batched physics step via the mega-kernel.

    Returns ``step(state_batched, cmd_batched) -> (state', aux)`` operating
    on K-leading batched pytrees; K is padded to a multiple of 1024
    internally. ``sim_steps`` sim steps × params.substeps substeps run
    inside ONE kernel launch.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    plan = _plan_for(model)
    n_substeps = sim_steps * model.params.substeps
    kernel, const_plane = _build_kernel(plan, n_substeps, eb)
    const_j = jnp.asarray(const_plane)

    def step(state: SimState, cmd: DriveCmd):
        K = state.qpos.shape[0]
        Kp = ((K + eb - 1) // eb) * eb
        if Kp != K:
            pad = lambda x: jnp.concatenate(
                [x, jnp.broadcast_to(x[:1], (Kp - K,) + x.shape[1:])], axis=0
            )
            state_p = jax.tree.map(pad, state)
            cmd_p = jax.tree.map(pad, cmd)
        else:
            state_p, cmd_p = state, cmd
        plane = _pack(plan, state_p, cmd_p, Kp)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (plan.R_out, Kp // 128, 128), jnp.float32
            ),
            grid=(Kp // eb,),
            in_specs=[
                pl.BlockSpec(
                    (plan.R_in, eb // 128, 128), lambda i: (0, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    const_plane.shape, lambda i: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (plan.R_out, eb // 128, 128), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(plane, const_j)
        new_state, aux = _unpack(plan, out, Kp, state_p)
        if Kp != K:
            new_state = jax.tree.map(lambda x: x[:K], new_state)
            aux = jax.tree.map(lambda x: x[:K], aux)
        return new_state, aux

    return step
