"""DrawTriangle-v1 / DrawSVG-v1: trace a target outline with the stick.

Parity ports of the reference drawing tasks
(``mani_skill/envs/tasks/drawing/draw_triangle.py`` and ``draw_svg.py``):
the Panda-stick dot-placement machinery of TableTopFreeDraw plus a target
outline and the reference's two-sided success test — every drawn dot lies
within THRESHOLD of the outline AND every outline point has a drawn dot
near it (draw_triangle.py:348-386). The outline points are per-episode
state (rotated + translated reference points in ``extras``), so the whole
check stays shape-static and jittable.

DrawSVG uses the reference's default SVG path (draw_svg.py:60 — a
line-segment-only path, parsed with a dependency-free M/L/H/V/Z reader
instead of svgpathtools).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..base_env import EnvState, TaskContext
from ..registration import register_env
from .draw import TableTopFreeDrawEnv

_DEFAULT_SVG = (
    "M7.875 0L0 7.875V55.125L7.875 63H23.763L23.7235 62.9292L11.8418 "
    "51.2859L11.8418 35.6268L21.1302 26.915L23.9193 11.6649L40.9773 "
    "6.3631L46.8835 16.5929L33.2356 19.926L32.6417 29.1349L41.1407 "
    "33.618L50.8511 23.465L56.6781 33.5577L43.5576 45.6794L28.9369 "
    "40.4365L26.1844 42.4266L26.1844 45.6794L43.2157 63H55.125L63 "
    "55.125V7.875L55.125 0H7.875Z"
)


def _parse_svg_polyline(svg: str) -> np.ndarray:
    """Minimal SVG path reader: absolute M/L/H/V/Z (the reference's default
    path uses only these). Returns the polyline vertices (N, 2)."""
    import re

    tokens = re.findall(r"([MLHVZ])([^MLHVZ]*)", svg.replace(",", " "))
    pts, start = [], None
    cur = np.zeros(2)
    for cmd, args in tokens:
        vals = [float(v) for v in args.split()]
        if cmd == "M":
            cur = np.array(vals[:2])
            start = cur.copy()
            pts.append(cur.copy())
        elif cmd == "L":
            for i in range(0, len(vals), 2):
                cur = np.array(vals[i:i + 2])
                pts.append(cur.copy())
        elif cmd == "H":
            cur = np.array([vals[0], cur[1]])
            pts.append(cur.copy())
        elif cmd == "V":
            cur = np.array([cur[0], vals[0]])
            pts.append(cur.copy())
        elif cmd == "Z" and start is not None:
            pts.append(start.copy())
    return np.stack(pts)


def _interp_outline(verts: np.ndarray, pts_per_edge: int,
                    closed: bool = True) -> np.ndarray:
    """Interpolate each edge of a polyline to pts_per_edge points
    (reference generate_triangle_with_points, draw_triangle.py:329-346)."""
    out = []
    n = len(verts) if closed else len(verts) - 1
    for i in range(n):
        a = verts[i]
        b = verts[(i + 1) % len(verts)]
        t = np.linspace(0.0, 1.0, pts_per_edge + 2)[:-1][:, None]
        out.append(a[None] * (1 - t) + b[None] * t)
    return np.concatenate(out)


class _DrawTargetEnv(TableTopFreeDrawEnv):
    THRESHOLD = 0.025  # draw_triangle.py:51
    OUTLINE: np.ndarray = None  # (R, 2) centered reference outline
    YAW_RANGE = (0.0, 2 * np.pi)

    def _default_extras(self):
        ex = super()._default_extras()
        R = len(self.OUTLINE)
        ex["outline"] = jnp.zeros((R, 2))
        ex["ref_hit"] = jnp.zeros((R,), bool)
        ex["dots_ok"] = jnp.asarray(True)
        ex["drew_any"] = jnp.asarray(False)
        return ex

    def _initialize_episode(self, state: EnvState, key) -> EnvState:
        state = super()._initialize_episode(state, key)
        kp, kq = jax.random.split(key)
        # reference: target xy ~ U(-0.1, -0.08)^2-ish (rand*0.02 - 0.1)
        pos = jax.random.uniform(kp, (2,), minval=-0.1, maxval=-0.08)
        yaw = jax.random.uniform(
            kq, (), minval=self.YAW_RANGE[0], maxval=self.YAW_RANGE[1]
        )
        c, s = jnp.cos(yaw), jnp.sin(yaw)
        rot = jnp.array([[c, -s], [s, c]])
        outline = jnp.asarray(self.OUTLINE) @ rot.T + pos[None]
        extras = dict(state.extras)
        extras["outline"] = outline
        extras["ref_hit"] = jnp.zeros((len(self.OUTLINE),), bool)
        extras["dots_ok"] = jnp.asarray(True)
        extras["drew_any"] = jnp.asarray(False)
        return state.replace(extras=extras)

    def _update_extras(self, state: EnvState, ctx: TaskContext) -> EnvState:
        tcp = ctx.tcp_pose.p
        touching = tcp[2] < self.CANVAS_THICKNESS + self.DOT_THICKNESS + 0.005
        state = super()._update_extras(state, ctx)
        outline = state.extras["outline"]
        d = jnp.linalg.norm(outline - tcp[:2][None], axis=-1)
        near = d < self.THRESHOLD
        extras = dict(state.extras)
        extras["ref_hit"] = state.extras["ref_hit"] | (near & touching)
        extras["dots_ok"] = state.extras["dots_ok"] & (
            ~touching | jnp.any(near)
        )
        extras["drew_any"] = state.extras["drew_any"] | touching
        return state.replace(extras=extras)

    def evaluate(self, state: EnvState, ctx: TaskContext):
        success = (
            state.extras["drew_any"]
            & state.extras["dots_ok"]
            & jnp.all(state.extras["ref_hit"])
        )
        return dict(
            success=success,
            outline_coverage=jnp.mean(
                state.extras["ref_hit"].astype(jnp.float32)
            ),
        )

    def _get_obs_extra(self, state, ctx, info):
        obs = super()._get_obs_extra(state, ctx, info)
        if "state" in self.obs_mode:
            outline = state.extras["outline"]
            # subsampled outline + tcp-relative versions (reference
            # tcp_to_verts_pos, draw_triangle.py:318-326)
            sub = outline[:: max(1, len(self.OUTLINE) // 9)][:9]
            obs["goal_points"] = sub.reshape(-1)
            obs["tcp_to_goal_points"] = (
                sub - ctx.tcp_pose.p[:2][None]
            ).reshape(-1)
        return obs


def _triangle_outline():
    # equilateral triangle, side 0.3 (circumradius 0.3/√3), 51 pts/edge:
    # 153 reference points (draw_triangle.py:113-137, 348-386)
    r = 0.15 / np.sqrt(3) * 2
    verts = np.stack([
        [r * np.cos(a), r * np.sin(a)]
        for a in (np.pi / 2, np.pi / 2 + 2 * np.pi / 3,
                  np.pi / 2 + 4 * np.pi / 3)
    ])
    return _interp_outline(verts, 50)


def _svg_outline():
    v = _parse_svg_polyline(_DEFAULT_SVG)
    # normalize the 63×63 viewbox to a ~22 cm drawing (draw_svg scales to
    # the canvas); center it
    v = (v - v.mean(axis=0)) * (0.22 / 63.0)
    v[:, 1] = -v[:, 1]  # SVG y-down -> world y-up
    return _interp_outline(v, 3, closed=False)


@register_env("DrawTriangle-v1", max_episode_steps=300)
class DrawTriangleEnv(_DrawTargetEnv):
    OUTLINE = _triangle_outline()


@register_env("DrawSVG-v1", max_episode_steps=500)
class DrawSVGEnv(_DrawTargetEnv):
    OUTLINE = _svg_outline()
    THRESHOLD = 0.05  # draw_svg.py success: within 0.05 m
    MAX_DOTS = 500
