"""Collision primitives and pairwise contact-point generation.

TPU-native replacement for the PhysX narrowphase the reference relies on
(SURVEY.md §2.9). Every pair function emits a *fixed* number of candidate
contact points (static shapes ⇒ static counts), with inactive candidates marked
by ``depth <= 0``. This keeps the whole contact pipeline shape-static so XLA
can fuse and batch it; there is no dynamic contact buffer to overflow (the
reference's GPUMemoryConfig knobs become unnecessary).

All functions operate on a single environment instance (poses are unbatched);
the physics step vmaps over the env/rollout batch dimension.

Conventions:
  * A pair is (A, B); the returned normal points from B toward A, so the
    contact force on A acts along +normal.
  * ``depth > 0`` means penetration.
  * Positions are world-frame.
"""
from __future__ import annotations

from enum import IntEnum
from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from ..math.rotations import quat_apply, quat_conjugate, quat_to_matrix


class GeomType(IntEnum):
    PLANE = 0  # half-space z<=0 in geom frame, normal +z
    SPHERE = 1  # size[0] = radius
    BOX = 2  # size = half extents
    CAPSULE = 3  # size[0] = radius, size[1] = half length (axis +z)
    CYLINDER = 4  # size[0] = radius, size[1] = half length (axis +z)
    HULL = 5  # convex hull: padded vertex+face tables (physics/hulls.py);
    #           size = AABB half-extents (render/broadphase only)


class ContactPoints(NamedTuple):
    pos: jnp.ndarray  # (K, 3) world contact position
    normal: jnp.ndarray  # (K, 3) unit normal, B -> A
    depth: jnp.ndarray  # (K,) penetration depth, > 0 when in contact


_BOX_CORNERS = np.array(
    [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
    dtype=np.float32,
)


def geom_local_half_extents(gtype: int, size) -> np.ndarray:
    """Per-geom-type local AABB half extents (host-side, numpy).

    Exact for box/sphere; conservative hull for capsule/cylinder (treated
    identically: radius r, half length hl along z -> (r, r, hl + r)). HULL
    geoms store their AABB half extents directly in ``size``.
    """
    size = np.asarray(size, np.float64)
    t = int(gtype)
    if t == GeomType.SPHERE:
        return np.full(3, float(size[0]))
    if t in (GeomType.CAPSULE, GeomType.CYLINDER):
        r, hl = float(size[0]), float(size[1])
        return np.array([r, r, hl + r])
    return size  # BOX and HULL


def body_collision_aabb_half(geoms, body_index: int, kind) -> np.ndarray:
    """Half-extents of a body's combined collision AABB in the body frame.

    Each geom's local half extents are rotated into the body frame via
    |R| @ h (exact for boxes, conservative otherwise) and offset by
    ``offset_p``. Shared by ``structs.LinkView.bbox_half`` and
    ``envs.base_env.LinkView.collision_aabb_half`` (reference Link bbox
    surface, mani_skill/utils/structs/link.py).
    """
    lo = np.full(3, np.inf)
    hi = np.full(3, -np.inf)
    for g in geoms:
        if g.kind != kind or g.body != body_index:
            continue
        h = geom_local_half_extents(g.gtype, g.size)
        R = np.abs(np.asarray(quat_to_matrix(np.asarray(g.offset_q,
                                                        np.float64))))
        he = R @ h
        p = np.asarray(g.offset_p)
        lo = np.minimum(lo, p - he)
        hi = np.maximum(hi, p + he)
    if not np.isfinite(lo).all():
        return np.zeros(3, np.float32)
    return ((hi - lo) / 2).astype(np.float32)


def _box_corners(pos, quat, half):
    corners = jnp.asarray(_BOX_CORNERS) * half  # (8, 3)
    return pos + quat_apply(quat[None], corners)


def plane_sphere(pa, qa, sa, pb, qb, sb) -> ContactPoints:
    """A = plane, B = sphere."""
    n = quat_apply(qa, jnp.array([0.0, 0.0, 1.0]))
    r = sb[0]
    dist = jnp.dot(pb - pa, n) - r
    pos = pb - n * (r + 0.5 * dist)
    # normal B->A = -n (pushes B out along +n => force on A is -n side)
    return ContactPoints(pos[None], -n[None], (-dist)[None])


def plane_box(pa, qa, sa, pb, qb, sb) -> ContactPoints:
    """A = plane, B = box: test all 8 corners."""
    n = quat_apply(qa, jnp.array([0.0, 0.0, 1.0]))
    corners = _box_corners(pb, qb, sb)  # (8, 3)
    dist = (corners - pa) @ n  # (8,)
    return ContactPoints(corners, jnp.broadcast_to(-n, (8, 3)), -dist)


def plane_capsule(pa, qa, sa, pb, qb, sb) -> ContactPoints:
    n = quat_apply(qa, jnp.array([0.0, 0.0, 1.0]))
    axis = quat_apply(qb, jnp.array([0.0, 0.0, 1.0]))
    r, hl = sb[0], sb[1]
    ends = pb + axis * jnp.array([[-hl], [hl]])  # (2, 3)
    dist = (ends - pa) @ n - r
    pos = ends - n[None] * (r + 0.5 * dist)[:, None]
    return ContactPoints(pos, jnp.broadcast_to(-n, (2, 3)), -dist)


def sphere_sphere(pa, qa, sa, pb, qb, sb) -> ContactPoints:
    d = pa - pb
    dist = jnp.sqrt(jnp.sum(d * d) + 1e-18)
    n = d / dist
    depth = sa[0] + sb[0] - dist
    pos = pb + n * (sb[0] - 0.5 * depth)
    return ContactPoints(pos[None], n[None], depth[None])


def _point_box_sdf(p_local: jnp.ndarray, half: jnp.ndarray):
    """Signed distance + outward normal (local frame) of point(s) vs box.
    p_local: (..., 3). Returns sdf (...,), normal (..., 3)."""
    q = jnp.abs(p_local) - half
    outside = jnp.maximum(q, 0.0)
    # gradient-safe norm: plain norm(0) has a NaN gradient that leaks through
    # jnp.where into every jacobian of the step function
    d_out = jnp.sqrt(jnp.sum(outside * outside, axis=-1) + 1e-18)
    d_in = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    sdf = d_out + d_in
    # outward normal: outside -> direction of outside vector; inside -> axis of
    # least penetration.
    n_out = outside * jnp.sign(p_local)
    n_out = n_out / jnp.sqrt(jnp.sum(n_out * n_out, axis=-1, keepdims=True) + 1e-18)
    # interior normal: axis of least penetration, as an arithmetic one-hot
    # (argmax + gather lowers to slow dynamic indexing on TPU). Ties (a
    # point exactly on an edge/corner plane — e.g. two identical axis-
    # aligned boxes stacked flush) split the one-hot across axes; the
    # result must be re-normalized or the diagonal "normal" has |n| < 1
    # and under-delivers impulse.
    qmax = jnp.max(q, axis=-1, keepdims=True)
    onehot = (q >= qmax).astype(p_local.dtype)
    onehot = onehot / jnp.sum(onehot, axis=-1, keepdims=True)
    n_in = onehot * jnp.sign(p_local)
    n_in = n_in / jnp.sqrt(
        jnp.sum(n_in * n_in, axis=-1, keepdims=True) + 1e-18
    )
    # branch threshold 1e-6 (1 µm), NOT 1e-9: d_out = sqrt(0 + 1e-18) for a
    # point exactly on a face sits ON a 1e-9 knife edge — backend-dependent
    # rounding (TPU vs CPU) flips it onto the outside branch whose normal
    # is 0/d_out = a ZERO vector, deleting the contact's support direction
    n = jnp.where((d_out > 1e-6)[..., None], n_out, n_in)
    return sdf, n


def sphere_box(pa, qa, sa, pb, qb, sb) -> ContactPoints:
    """A = sphere, B = box."""
    r = sa[0]
    p_local = quat_apply(quat_conjugate(qb), pa - pb)
    sdf, n_local = _point_box_sdf(p_local, sb)
    n = quat_apply(qb, n_local)  # outward from box => B->A direction
    depth = r - sdf
    pos = pa - n * (r - 0.5 * depth)
    return ContactPoints(pos[None], n[None], depth[None])


def box_sphere(pa, qa, sa, pb, qb, sb) -> ContactPoints:
    c = sphere_box(pb, qb, sb, pa, qa, sa)
    return ContactPoints(c.pos, -c.normal, c.depth)


_FACE_DIRS = jnp.asarray(
    [[1.0, 0, 0], [-1.0, 0, 0], [0, 1.0, 0],
     [0, -1.0, 0], [0, 0, 1.0], [0, 0, -1.0]]
)


def _box_face_centers(pos, quat, half):
    return pos + quat_apply(quat[None], _FACE_DIRS * half[None])


def box_box(pa, qa, sa, pb, qb, sb) -> ContactPoints:
    """Vertex-SDF box-box: corners + face centers of A against B and of B
    against A. 28 candidate points. Face-face contact manifolds emerge from
    the corner sets; edge-edge crossing contacts are approximated (adequate
    for the tabletop task geometries, cf. reference PhysX PCM which also
    point-samples patches). The face centers cover the flush face-on-face
    degeneracy: two identical axis-aligned boxes stacked exactly put every
    CORNER of each box precisely on the other's lateral face planes, where
    the vertex SDF reads zero depth along a diagonal — corner samples alone
    let the upper box fall straight through. The face center lies strictly
    inside the supporting face and reports the true normal/depth."""
    # corners + face centers of A inside B
    ca = jnp.concatenate(
        [_box_corners(pa, qa, sa), _box_face_centers(pa, qa, sa)], axis=0
    )  # (14,3)
    ca_local = quat_apply(quat_conjugate(qb)[None], ca - pb)
    sdf_a, n_a_local = _point_box_sdf(ca_local, sb)
    n_a = quat_apply(qb[None], n_a_local)  # B -> A
    # corners + face centers of B inside A
    cb = jnp.concatenate(
        [_box_corners(pb, qb, sb), _box_face_centers(pb, qb, sb)], axis=0
    )
    cb_local = quat_apply(quat_conjugate(qa)[None], cb - pa)
    sdf_b, n_b_local = _point_box_sdf(cb_local, sa)
    n_b = -quat_apply(qa[None], n_b_local)  # outward from A, flip to B->A
    pos = jnp.concatenate([ca, cb], axis=0)
    normal = jnp.concatenate([n_a, n_b], axis=0)
    depth = jnp.concatenate([-sdf_a, -sdf_b], axis=0)
    return ContactPoints(pos, normal, depth)


def sphere_capsule(pa, qa, sa, pb, qb, sb) -> ContactPoints:
    axis = quat_apply(qb, jnp.array([0.0, 0.0, 1.0]))
    t = jnp.clip(jnp.dot(pa - pb, axis), -sb[1], sb[1])
    closest = pb + axis * t
    d = pa - closest
    dist = jnp.sqrt(jnp.sum(d * d) + 1e-18)
    n = d / dist
    depth = sa[0] + sb[0] - dist
    pos = closest + n * (sb[0] - 0.5 * depth)
    return ContactPoints(pos[None], n[None], depth[None])


def capsule_box(pa, qa, sa, pb, qb, sb) -> ContactPoints:
    """Sample 3 spheres along the capsule axis against the box."""
    axis = quat_apply(qa, jnp.array([0.0, 0.0, 1.0]))
    r, hl = sa[0], sa[1]
    centers = pa + axis * jnp.array([[-hl], [0.0], [hl]])  # (3,3)
    p_local = quat_apply(quat_conjugate(qb)[None], centers - pb)
    sdf, n_local = _point_box_sdf(p_local, sb)
    n = quat_apply(qb[None], n_local)
    depth = r - sdf
    pos = centers - n * (r - 0.5 * depth)[:, None]
    return ContactPoints(pos, n, depth)


def capsule_capsule(pa, qa, sa, pb, qb, sb) -> ContactPoints:
    """Closest points between the two capsule segments."""
    ua = quat_apply(qa, jnp.array([0.0, 0.0, 1.0]))
    ub = quat_apply(qb, jnp.array([0.0, 0.0, 1.0]))
    ra, ha = sa[0], sa[1]
    rb, hb = sb[0], sb[1]
    # segment-segment closest point (clamped)
    d0 = pa - pb
    a = 1.0  # ua . ua
    e = 1.0
    b = jnp.dot(ua, ub)
    c = jnp.dot(ua, d0)
    f = jnp.dot(ub, d0)
    denom = jnp.maximum(a * e - b * b, 1e-9)
    s = jnp.clip((b * f - c * e) / denom, -ha, ha)
    t = jnp.clip((b * s + f) / e, -hb, hb)
    s = jnp.clip((b * t - c) / a, -ha, ha)
    ca = pa + ua * s
    cb = pb + ub * t
    d = ca - cb
    dist = jnp.sqrt(jnp.sum(d * d) + 1e-18)
    n = d / dist
    depth = ra + rb - dist
    pos = cb + n * (rb - 0.5 * depth)
    return ContactPoints(pos[None], n[None], depth[None])


def box_box_corners(pa, qa, sa, pb, qb, sb) -> ContactPoints:
    """Symmetric corners-only box-box (16 points) — the pre-face-center
    variant, used for ROBOT-involved box pairs: a finger pad pressing a
    (larger) cube face puts the pad's corners strictly inside the face, so
    corners alone produce the correct manifold, and the hot grasp path
    stays 12 points leaner than the full 28-point test."""
    ca = _box_corners(pa, qa, sa)
    ca_local = quat_apply(quat_conjugate(qb)[None], ca - pb)
    sdf_a, n_a_local = _point_box_sdf(ca_local, sb)
    n_a = quat_apply(qb[None], n_a_local)
    cb = _box_corners(pb, qb, sb)
    cb_local = quat_apply(quat_conjugate(qa)[None], cb - pa)
    sdf_b, n_b_local = _point_box_sdf(cb_local, sa)
    n_b = -quat_apply(qa[None], n_b_local)
    pos = jnp.concatenate([ca, cb], axis=0)
    normal = jnp.concatenate([n_a, n_b], axis=0)
    depth = jnp.concatenate([-sdf_a, -sdf_b], axis=0)
    return ContactPoints(pos, normal, depth)


def box_box_onesided(pa, qa, sa, pb, qb, sb) -> ContactPoints:
    """Corners of box A against box B only (8 points). Used when B is a
    large static body (e.g. the tabletop): B's corners can never be inside A,
    so the symmetric 16-point test wastes half the contact budget."""
    ca = _box_corners(pa, qa, sa)  # (8,3)
    ca_local = quat_apply(quat_conjugate(qb)[None], ca - pb)
    sdf_a, n_a_local = _point_box_sdf(ca_local, sb)
    n_a = quat_apply(qb[None], n_a_local)  # B -> A
    return ContactPoints(ca, n_a, -sdf_a)


# ---------------------------------------------------------------------------
# convex hulls (padded vertex + face-plane tables, physics/hulls.py)
# ---------------------------------------------------------------------------
# TPU-native convex-mesh narrowphase (reference analogue: PhysX convex PCM
# over SAPIEN-cooked meshes, used by every YCB/PartNet task —
# pick_single_ycb.py:27). Contact candidates are vertex-vs-SDF tests with
# STATIC point budgets: hull vertices against the other shape's SDF, plus
# (for box/hull counterparts) the counterpart's vertices against the hull's
# face-plane SDF. Inside a convex shape the max-face-plane SDF is exact;
# outside it underestimates distance near edges, which only widens the
# speculative-contact margin band — depths (penetrations) are exact.


def _hull_sdf(p_local: jnp.ndarray, faces: jnp.ndarray):
    """Signed distance + outward normal of points vs a face-plane hull.

    p_local: (..., 3) points in hull frame; faces: (Hf, 4) outward planes
    [n, d] with n·p <= d inside (padding planes sit at d=1e6)."""
    d = p_local @ faces[:, :3].T - faces[:, 3]  # (..., Hf)
    sdf = jnp.max(d, axis=-1)
    oh = (d >= sdf[..., None]).astype(jnp.float32)
    oh = oh / jnp.sum(oh, axis=-1, keepdims=True)
    n = oh @ faces[:, :3]
    n = n / jnp.maximum(
        jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True)), 1e-9
    )
    return sdf, n


def plane_hull(pa, qa, sa, pb, qb, sb, vb, fb) -> ContactPoints:
    """A = plane, B = hull: every hull vertex against the halfspace."""
    n = quat_apply(qa, jnp.array([0.0, 0.0, 1.0]))
    w = pb + quat_apply(qb[None], vb)  # (V, 3)
    dist = (w - pa) @ n
    V = vb.shape[0]
    return ContactPoints(w, jnp.broadcast_to(-n, (V, 3)), -dist)


def sphere_hull(pa, qa, sa, pb, qb, sb, vb, fb) -> ContactPoints:
    """A = sphere, B = hull: center vs hull SDF."""
    r = sa[0]
    loc = quat_apply(quat_conjugate(qb), pa - pb)
    sdf, nl = _hull_sdf(loc, fb)
    n = quat_apply(qb, nl)  # B -> A
    depth = r - sdf
    pos = pa - n * (r - 0.5 * depth)
    return ContactPoints(pos[None], n[None], depth[None])


def box_hull(pa, qa, sa, pb, qb, sb, vb, fb) -> ContactPoints:
    """A = box, B = hull: A's 8 corners vs hull SDF + B's verts vs box SDF."""
    ca = _box_corners(pa, qa, sa)  # (8, 3)
    loc = quat_apply(quat_conjugate(qb)[None], ca - pb)
    sdf_a, nl_a = _hull_sdf(loc, fb)
    n_a = quat_apply(qb[None], nl_a)  # outward of B = B -> A
    w = pb + quat_apply(qb[None], vb)  # (V, 3) hull verts world
    locb = quat_apply(quat_conjugate(qa)[None], w - pa)
    sdf_b, nl_b = _point_box_sdf(locb, sa)
    n_b = -quat_apply(qa[None], nl_b)  # outward of A = A -> B; flip to B -> A
    return ContactPoints(
        jnp.concatenate([ca, w]),
        jnp.concatenate([n_a, n_b]),
        jnp.concatenate([-sdf_a, -sdf_b]),
    )


def capsule_hull(pa, qa, sa, pb, qb, sb, vb, fb) -> ContactPoints:
    """A = capsule, B = hull: 3 axis sample spheres vs hull SDF."""
    axis = quat_apply(qa, jnp.array([0.0, 0.0, 1.0]))
    t = jnp.array([-1.0, 0.0, 1.0]) * sa[1]
    centers = pa[None] + axis[None] * t[:, None]  # (3, 3)
    loc = quat_apply(quat_conjugate(qb)[None], centers - pb)
    sdf, nl = _hull_sdf(loc, fb)
    n = quat_apply(qb[None], nl)
    r = sa[0]
    depth = r - sdf
    pos = centers - n * (r - 0.5 * depth)[:, None]
    return ContactPoints(pos, n, depth)


def hull_hull(pa, qa, sa, pb, qb, sb, va, fa, vb, fb) -> ContactPoints:
    """Both hulls: A's verts vs B's SDF + B's verts vs A's SDF."""
    wa = pa + quat_apply(qa[None], va)
    loc_a = quat_apply(quat_conjugate(qb)[None], wa - pb)
    sdf_a, nl_a = _hull_sdf(loc_a, fb)
    n_a = quat_apply(qb[None], nl_a)  # B -> A
    wb = pb + quat_apply(qb[None], vb)
    loc_b = quat_apply(quat_conjugate(qa)[None], wb - pa)
    sdf_b, nl_b = _hull_sdf(loc_b, fa)
    n_b = -quat_apply(qa[None], nl_b)  # flip: B -> A
    return ContactPoints(
        jnp.concatenate([wa, wb]),
        jnp.concatenate([n_a, n_b]),
        jnp.concatenate([-sdf_a, -sdf_b]),
    )


# which sides of each hull pair function consume (verts, faces) tables
plane_hull.hull_args = "b"
sphere_hull.hull_args = "b"
box_hull.hull_args = "b"
capsule_hull.hull_args = "b"
hull_hull.hull_args = "ab"


# Dispatch table: (type_a, type_b) -> (fn, n_points). Pairs are canonically
# ordered by the model builder so only these combinations occur.
PAIR_FUNCS = {
    (GeomType.PLANE, GeomType.SPHERE): (plane_sphere, 1),
    (GeomType.PLANE, GeomType.BOX): (plane_box, 8),
    (GeomType.PLANE, GeomType.CAPSULE): (plane_capsule, 2),
    (GeomType.SPHERE, GeomType.SPHERE): (sphere_sphere, 1),
    (GeomType.SPHERE, GeomType.BOX): (sphere_box, 1),
    (GeomType.BOX, GeomType.BOX): (box_box, 28),
    (GeomType.SPHERE, GeomType.CAPSULE): (sphere_capsule, 1),
    (GeomType.CAPSULE, GeomType.BOX): (capsule_box, 3),
    (GeomType.CAPSULE, GeomType.CAPSULE): (capsule_capsule, 1),
}


def _register_hull_pairs():
    from .hulls import HULL_P

    PAIR_FUNCS.update({
        (GeomType.PLANE, GeomType.HULL): (plane_hull, HULL_P),
        (GeomType.SPHERE, GeomType.HULL): (sphere_hull, 1),
        (GeomType.BOX, GeomType.HULL): (box_hull, 8 + HULL_P),
        (GeomType.CAPSULE, GeomType.HULL): (capsule_hull, 3),
        (GeomType.HULL, GeomType.HULL): (hull_hull, 2 * HULL_P),
    })


_register_hull_pairs()


def contact_fn(type_a: int, type_b: int):
    """Return (fn, n_points, swapped) for a geom type pair."""
    key = (GeomType(type_a), GeomType(type_b))
    if key in PAIR_FUNCS:
        fn, k = PAIR_FUNCS[key]
        return fn, k, False
    rkey = (key[1], key[0])
    if rkey in PAIR_FUNCS:
        fn, k = PAIR_FUNCS[rkey]
        return fn, k, True
    raise NotImplementedError(f"no contact function for {key}")
