"""Analytic depth/segmentation camera.

TPU-native replacement for the reference camera sensor stack
(``mani_skill/sensors/camera.py`` + the SAPIEN Vulkan renderer, SURVEY.md
§2.6): instead of rasterizing meshes, depth is computed by closed-form
ray/primitive intersection against the scene's collision geoms (plane,
sphere, box, capsule) — fully vectorized over pixels × geoms, jittable,
batched over envs with vmap. Supports the reference data conventions:
depth in millimeters as int16 (camera.py:205-212), segmentation as int16
per-geom ids, pointcloud in the world frame (observations.py:17).

Not a photorealistic renderer (deliberate, SURVEY.md §7.4) — it provides the
geometry channels (depth/segmentation/position) that state-free pipelines
and the reference's ``minimal`` shader pack expose.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..math.pose import Pose, look_at
from ..math.rotations import quat_apply, quat_conjugate, quat_to_matrix
from ..physics.engine import all_geom_poses
from ..physics.model import SceneModel
from ..physics.shapes import GeomType


@dataclass
class CameraConfig:
    """Mirrors the reference CameraConfig (camera.py:32): uid, pose, width,
    height, fov (vertical), near, far, and ``mount`` — a robot frame name
    the camera rides on (the reference's mount link, camera.py:32; pose is
    then LOCAL to that frame and composed with FK every render)."""

    uid: str
    pose: np.ndarray  # (7,) [p, q]; world pose, or mount-local when mounted
    width: int = 128
    height: int = 128
    fov: float = np.pi / 2
    near: float = 0.01
    far: float = 100.0
    mount: Optional[str] = None  # robot frame/link name
    shader_pack: Optional[str] = None  # named pack (sensors/shaders.py);
    # None = "default"


def _ray_dirs(cfg: CameraConfig) -> np.ndarray:
    """Per-pixel unit ray directions in the camera frame (+x forward,
    +y left, +z up — the SAPIEN ROS-style camera frame)."""
    H, W = cfg.height, cfg.width
    f = 0.5 * H / np.tan(cfg.fov / 2)
    rows = np.arange(H)[:, None]  # i: 0 = top
    cols = np.arange(W)[None, :]  # j: 0 = left
    y = ((W - 1) / 2 - cols) / f  # +y = left
    z = ((H - 1) / 2 - rows) / f  # +z = up
    dirs = np.stack(
        [np.ones((H, W)), np.broadcast_to(y, (H, W)), np.broadcast_to(z, (H, W))],
        axis=-1,
    )
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return dirs.reshape(-1, 3).astype(np.float32)  # (H*W, 3)


def _ray_plane(o, d, eps=1e-9):
    """Rays vs the z=0 halfspace boundary in geom frame. Returns t (N,)."""
    t = -o[:, 2] / jnp.where(jnp.abs(d[:, 2]) < eps, eps, d[:, 2])
    return jnp.where(t > 0, t, jnp.inf)


def _ray_sphere(o, d, r):
    b = jnp.sum(o * d, axis=-1)
    c = jnp.sum(o * o, axis=-1) - r * r
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = -b - sq
    t1 = -b + sq
    t = jnp.where(t0 > 0, t0, t1)
    return jnp.where((disc >= 0) & (t > 0), t, jnp.inf)


def _ray_box(o, d, half, eps=1e-9):
    inv = 1.0 / jnp.where(jnp.abs(d) < eps, eps, d)
    t1 = (-half - o) * inv
    t2 = (half - o) * inv
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = (tmax >= jnp.maximum(tmin, 0.0))
    t = jnp.where(tmin > 0, tmin, tmax)
    return jnp.where(hit & (t > 0), t, jnp.inf)


def _ray_hull(o, d, faces, eps=1e-9):
    """Ray vs convex face-plane hull (physics/hulls.py layout). Returns
    (t (N,), local normal (N, 3)); padding planes (d=1e6) are inert."""
    n = faces[:, :3]  # (Hf, 3)
    off = faces[:, 3]
    denom = d @ n.T  # (N, Hf)
    dist = o @ n.T - off[None]  # > 0 means outside this halfspace
    safe = jnp.where(jnp.abs(denom) < eps,
                     jnp.where(denom >= 0, eps, -eps), denom)
    t_bound = -dist / safe
    lower = jnp.where(denom < -eps, t_bound, -jnp.inf)
    upper = jnp.where(denom > eps, t_bound, jnp.inf)
    parallel_miss = (jnp.abs(denom) <= eps) & (dist > 0)
    t_near = jnp.max(lower, axis=-1)
    t_far = jnp.min(upper, axis=-1)
    hit = (t_near <= t_far) & (t_near > 0) & ~jnp.any(parallel_miss, axis=-1)
    oh = ((lower >= t_near[:, None]) & (denom < -eps)).astype(jnp.float32)
    oh = oh / jnp.maximum(jnp.sum(oh, axis=-1, keepdims=True), 1.0)
    n_loc = oh @ n
    return jnp.where(hit, t_near, jnp.inf), n_loc


def _ray_capsule(o, d, r, hl):
    """Rays vs capsule along z in geom frame: infinite-cylinder hit clamped to
    the segment + two sphere caps."""
    ox, oy = o[:, 0], o[:, 1]
    dx, dy = d[:, 0], d[:, 1]
    a = dx * dx + dy * dy
    b = ox * dx + oy * dy
    c = ox * ox + oy * oy - r * r
    disc = b * b - a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    a_safe = jnp.where(a < 1e-9, 1e-9, a)
    t_cyl = (-b - sq) / a_safe
    z_hit = o[:, 2] + t_cyl * d[:, 2]
    cyl_ok = (disc >= 0) & (t_cyl > 0) & (jnp.abs(z_hit) <= hl)
    t_cyl = jnp.where(cyl_ok, t_cyl, jnp.inf)
    t_top = _ray_sphere(o - jnp.array([0.0, 0, 1.0]) * hl, d, r)
    t_bot = _ray_sphere(o + jnp.array([0.0, 0, 1.0]) * hl, d, r)
    return jnp.minimum(t_cyl, jnp.minimum(t_top, t_bot))


def _geom_ray(g, state, gi, o, d):
    """Intersect rays (geom-frame origin ``o``, dirs ``d``) with one geom.
    Returns (t (N,), local normal (N, 3))."""
    N = o.shape[0]
    size = state.geom_size[gi]
    if g.gtype == GeomType.PLANE:
        t = _ray_plane(o, d)
        n_loc = jnp.broadcast_to(jnp.array([0.0, 0, 1.0]), (N, 3))
    elif g.gtype == GeomType.SPHERE:
        t = _ray_sphere(o, d, size[0])
        hit = o + t[:, None] * d
        n_loc = hit / jnp.maximum(size[0], 1e-9)
    elif g.gtype == GeomType.BOX:
        t = _ray_box(o, d, size)
        hit = o + t[:, None] * d
        rel = jnp.abs(hit) / jnp.maximum(size[None, :], 1e-9)
        mx = jnp.max(rel, axis=-1, keepdims=True)
        oh = (rel >= mx).astype(hit.dtype)
        oh = oh / jnp.sum(oh, axis=-1, keepdims=True)
        n_loc = oh * jnp.sign(hit)
    elif g.gtype in (GeomType.CAPSULE, GeomType.CYLINDER):
        t = _ray_capsule(o, d, size[0], size[1])
        hit = o + t[:, None] * d
        zc = jnp.clip(hit[:, 2], -size[1], size[1])
        axis_pt = jnp.stack(
            [jnp.zeros_like(zc), jnp.zeros_like(zc), zc], axis=-1
        )
        dvec = hit - axis_pt
        n_loc = dvec / jnp.sqrt(
            jnp.sum(dvec * dvec, axis=-1, keepdims=True) + 1e-18
        )
    elif g.gtype == GeomType.HULL:
        t, n_loc = _ray_hull(o, d, state.hull_faces[g.hull])
    else:
        t = jnp.full(N, jnp.inf)
        n_loc = jnp.zeros((N, 3))
    return t, n_loc


class Camera:
    """Depth/segmentation/pointcloud sensor over a SceneModel's geoms
    (reference Camera.get_obs, camera.py:191)."""

    def __init__(self, cfg: CameraConfig, model: SceneModel):
        self.cfg = cfg
        self.model = model
        from .shaders import get_shader_config

        self.shader = get_shader_config(getattr(cfg, "shader_pack", None))
        self._dirs = _ray_dirs(cfg)  # (N, 3) camera frame
        pose = np.asarray(cfg.pose, np.float32)
        self._cam_p = pose[:3]
        self._cam_q = pose[3:7]
        # deterministic golden-ratio hue palette per geom (index 0 = bg)
        G = len(model.geoms)
        hues = (0.12 + 0.61803398875 * np.arange(G + 1)) % 1.0
        import colorsys

        self._palette = np.array(
            [[0, 0, 0]] + [colorsys.hsv_to_rgb(h, 0.55, 0.95)
                           for h in hues[1:]],
            np.float32,
        )

    def _wanted(self, wanted=None):
        """Effective texture set: caller request ∩ shader pack."""
        all_tex = ("depth", "segmentation", "position", "rgb", "normal")
        pack = self.shader.texture_names or all_tex
        if wanted is None:
            return tuple(k for k in all_tex if k in pack)
        return tuple(k for k in all_tex if k in pack and k in wanted)

    def _render_rays(self, state, gpos, gquat, cam_p, cam_q, dirs_w,
                     wanted):
        """Trace one block of world-frame rays. Returns a dict of flat
        (n, ...) arrays for exactly the ``wanted`` textures. All per-geom
        intermediates live only for this block — the pixel-chunked
        ``render`` below bounds peak memory/compile size at any
        resolution (the 640x480 @512-env headline config used to fail to
        compile as one monolithic program)."""
        model = self.model
        cfg = self.cfg
        shader = self.shader
        N = dirs_w.shape[0]
        need_normal = ("normal" in wanted) or ("rgb" in wanted)
        need_win = need_normal or ("segmentation" in wanted)
        need_pts = ("position" in wanted) or (
            "rgb" in wanted and shader.shadows)

        ts = []
        normals = []
        for gi, g in enumerate(model.geoms):
            gq = gquat[gi]
            gp = gpos[gi]
            o = quat_apply(quat_conjugate(gq)[None], cam_p[None] - gp[None])
            o = jnp.broadcast_to(o, (N, 3))
            d = quat_apply(quat_conjugate(gq)[None], dirs_w)
            t, n_loc = _geom_ray(g, state, gi, o, d)
            ts.append(t)
            if need_normal:
                nan_safe = jnp.where(jnp.isfinite(t)[:, None], n_loc, 0.0)
                normals.append(quat_apply(gq[None], nan_safe))
        T = jnp.stack(ts, axis=0)  # (G, N)
        t_hit = jnp.min(T, axis=0)
        out = {}
        if need_win:
            win = jnp.argmin(T, axis=0)
            # winner one-hot (arithmetic, no gathers — an (N,)-indexed
            # gather at 512 envs x 300k pixels crashed the TPU compile
            # helper; the one-hot contraction is the MXU-native form)
            onehot = (jnp.arange(T.shape[0])[:, None] == win[None, :]
                      ).astype(jnp.float32)
        if "segmentation" in wanted:
            out["segmentation"] = jnp.where(
                jnp.isfinite(t_hit), win + 1, 0).astype(jnp.int16)
        if need_normal:
            n_world = jnp.einsum("gn,gnc->nc", onehot, jnp.stack(normals))
        # clip to the near/far frustum like the renderer would
        t_hit = jnp.where(
            (t_hit >= cfg.near) & (t_hit <= cfg.far), t_hit, jnp.inf
        )
        if need_pts:
            pts = cam_p[None] + dirs_w * t_hit[:, None]
        if "position" in wanted:
            out["position"] = pts
        if "depth" in wanted:
            # depth = distance along the camera forward axis (z-buffer)
            fwd = quat_apply(cam_q, jnp.array([1.0, 0.0, 0.0]))
            out["depth"] = t_hit * (dirs_w @ fwd)
        if "normal" in wanted:
            out["normal"] = n_world
        if "rgb" in wanted:
            # Lambert RGB over a per-geom palette, shaded per the camera's
            # shader pack (sensors/shaders.py — the reference ShaderConfig
            # analogue, render/shaders.py:11,67)
            base = jnp.asarray(self._palette)  # (G+1, 3) incl. background
            shade = jnp.full(N, shader.ambient)
            if shader.shadows:
                so = jnp.where(jnp.isfinite(pts), pts, 0.0) + n_world * 1e-3
            for light_dir, intensity in shader.lights:
                light = jnp.asarray(np.asarray(light_dir, np.float32))
                light = light / jnp.linalg.norm(light)
                ndl = jnp.maximum(
                    -jnp.sum(n_world * light[None], axis=-1), 0.0)
                if shader.shadows:
                    # one shadow ray per pixel toward the light; any hit
                    # occludes. Origins are rotated into each geom's frame
                    # inside the loop — no G live (N, 3) stacks.
                    sd = jnp.broadcast_to(-light[None], (N, 3))
                    t_sh = jnp.full(N, jnp.inf)
                    for gi, g in enumerate(model.geoms):
                        cq = quat_conjugate(gquat[gi])
                        o_l = quat_apply(cq[None], so - gpos[gi][None])
                        d_l = quat_apply(cq[None], sd)
                        t_g, _ = _geom_ray(g, state, gi, o_l, d_l)
                        t_sh = jnp.minimum(t_sh, t_g)
                    ndl = ndl * (~jnp.isfinite(t_sh)).astype(jnp.float32)
                shade = shade + (1.0 - shader.ambient) * intensity * ndl
            col = jnp.einsum(
                "gn,gc->nc", onehot, base[1:]
            ) * jnp.clip(shade, 0.0, 1.0)[:, None]
            rgb = jnp.where(jnp.isfinite(t_hit)[:, None], col, jnp.zeros(3))
            out["rgb"] = jnp.clip(rgb * 255.0, 0, 255).astype(jnp.uint8)
        return out

    # pixel-chunking: past this many rays the trace is split into blocks
    # processed sequentially with lax.map (compile size and peak memory
    # become resolution-independent, same trick as the physics
    # mega-kernel's per-point _CHUNK pipeline). MS_RENDER_CHUNK overrides
    # the cap (runtime tuning knob; larger blocks = fewer sequential map
    # steps, more VMEM/compile size).
    _MAX_CHUNK = 20480

    @staticmethod
    def _pick_chunk(N: int) -> int:
        import os

        cap = int(os.environ.get("MS_RENDER_CHUNK", Camera._MAX_CHUNK))
        if N <= cap:
            return N
        for k in range(2, 129):
            if N % k == 0 and N // k <= cap:
                return N // k
        return cap  # no small divisor: pad

    def render(self, state, body_pos, body_quat, wanted=None):
        """Single-env render. Returns dict with (subsets gated by the
        shader pack and ``wanted``): depth (H, W) float32 meters,
        segmentation (H, W) int16 geom id + 1 (0 = background), position
        (H, W, 3) world-frame points (inf where no hit), rgb (H, W, 3)
        uint8, normal (H, W, 3)."""
        model = self.model
        if self.cfg.mount is not None:
            from ..physics.engine import robot_frame_pose
            from ..math.rotations import quat_mul

            mp, mq = robot_frame_pose(
                model, body_pos, body_quat, self.cfg.mount
            )
            cam_p = mp + quat_apply(mq, jnp.asarray(self._cam_p))
            cam_q = quat_mul(mq, jnp.asarray(self._cam_q))
        else:
            cam_p = jnp.asarray(self._cam_p)
            cam_q = jnp.asarray(self._cam_q)
        dirs_w = quat_apply(cam_q[None], jnp.asarray(self._dirs))  # (N,3)
        N = dirs_w.shape[0]
        wanted = self._wanted(wanted)

        gpos, gquat = all_geom_poses(model, state, body_pos, body_quat)
        chunk = self._pick_chunk(N)
        if chunk >= N:
            out = self._render_rays(
                state, gpos, gquat, cam_p, cam_q, dirs_w, wanted)
        else:
            Np = ((N + chunk - 1) // chunk) * chunk
            if Np != N:
                dirs_w = jnp.concatenate(
                    [dirs_w, jnp.broadcast_to(dirs_w[:1], (Np - N, 3))])
            blocks = dirs_w.reshape(-1, chunk, 3)
            out = jax.lax.map(
                lambda db: self._render_rays(
                    state, gpos, gquat, cam_p, cam_q, db, wanted),
                blocks,
            )
            out = {
                k: v.reshape((v.shape[0] * v.shape[1],) + v.shape[2:])[:N]
                for k, v in out.items()
            }
        H, W = self.cfg.height, self.cfg.width
        return {
            k: v.reshape((H, W) + v.shape[1:]) for k, v in out.items()
        }

    def get_params(self):
        """Intrinsics/extrinsics (reference Camera.get_params, camera.py:281)."""
        cfg = self.cfg
        f = 0.5 * cfg.height / np.tan(cfg.fov / 2)
        K = np.array(
            [[f, 0, (cfg.width - 1) / 2], [0, f, (cfg.height - 1) / 2], [0, 0, 1]],
            np.float32,
        )
        return dict(
            intrinsic_cv=K,
            cam2world=Pose(jnp.asarray(self._cam_p), jnp.asarray(self._cam_q))
            .to_matrix(),
        )
