"""Dataset-style scene builders: ReplicaCAD-lite, AI2THOR-lite, RoboCasa.

Reference analogue: ``mani_skill/utils/scene_builder/{replicacad,ai2thor,
robocasa}`` — apartment/house/kitchen scene datasets with JSON build
configs, consumed by ``SceneManipulation-v1`` (``envs/scenes/base_env.py``)
and ``RoboCasaKitchen-v1`` (``envs/tasks/mobile_manipulation/robocasa/
kitchen.py``). The reference builders stream multi-GB mesh datasets; these
builders are procedural primitive layouts that implement the same API
surface — multiple ``build_configs`` (static furniture layouts), multiple
``init_configs`` (robot spawn points), and ``navigable_positions`` for
mobile-base planning — so the scene-task machinery, wrappers, and training
loops exercise the identical code paths. Swap in mesh data by adding hull
assets per furniture piece.

Each build config is deterministic (seeded per layout index): walls, a
kitchen counter run, tables, shelves, and scatter boxes differ per layout.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..physics.model import SceneSpecBuilder, box_geom, plane_geom
from .scene_builders import TableSceneBuilder, register_scene_builder


def _wall(builder, name, center, half):
    builder.add_static_body(
        name, np.array([*center, 1, 0, 0, 0], np.float32),
        [box_geom(half, friction=0.8)],
    )


class _DatasetSceneBuilder:
    """Shared machinery: a walled room with layout-dependent furniture."""

    ROOM_HALF = np.array([3.0, 3.5], np.float32)  # room footprint half-size
    WALL_H = 1.2  # walls tall enough to contain manipulation workspaces
    n_build_configs = 4
    n_init_configs = 3

    def __init__(self, env, build_config_idx: int = 0):
        self.env = env
        self.build_config_idx = int(build_config_idx) % self.n_build_configs
        self._rng = np.random.RandomState(1000 + self.build_config_idx)

    # -- reference SceneBuilder surface --------------------------------
    @property
    def build_configs(self) -> List[int]:
        return list(range(self.n_build_configs))

    @property
    def init_configs(self) -> List[int]:
        return list(range(self.n_init_configs))

    def navigable_positions(self) -> np.ndarray:
        """(N, 2) free-floor grid (mobile-base sampling; reference
        ``SceneBuilder.navigable_positions``)."""
        xs = np.linspace(-self.ROOM_HALF[0] + 0.6,
                         self.ROOM_HALF[0] - 0.6, 7)
        ys = np.linspace(-self.ROOM_HALF[1] + 0.6,
                         self.ROOM_HALF[1] - 0.6, 8)
        pts = np.stack(np.meshgrid(xs, ys), -1).reshape(-1, 2)
        keep = [p for p in pts
                if not any(np.all(np.abs(p - c[:2]) < h[:2] + 0.35)
                           for c, h in self._occupied)]
        return np.asarray(keep, np.float32)

    def robot_pose_and_qpos(self, robot_uid: str):
        spawn = self._spawns[0]
        pose = np.array([spawn[0], spawn[1], 0.0, 1, 0, 0, 0], np.float32)
        kf = getattr(self.env.agent, "keyframes", {}).get("rest")
        return pose, None if kf is None else np.asarray(kf.qpos, np.float32)

    def build(self, builder: SceneSpecBuilder):
        self._occupied: List = []
        rx, ry = self.ROOM_HALF
        h = self.WALL_H
        builder.add_static_body(
            "floor", np.array([0, 0, 0, 1, 0, 0, 0], np.float32),
            [plane_geom(friction=0.8)],
        )
        for name, c, half in [
            ("wall+x", (rx, 0, h / 2), (0.05, ry, h / 2)),
            ("wall-x", (-rx, 0, h / 2), (0.05, ry, h / 2)),
            ("wall+y", (0, ry, h / 2), (rx, 0.05, h / 2)),
            ("wall-y", (0, -ry, h / 2), (rx, 0.05, h / 2)),
        ]:
            _wall(builder, name, c, half)
        self._build_furniture(builder)
        self._spawns = self._make_spawns()
        builder.exclude_groups(["robot:*"], ["floor"])

    def _make_spawns(self):
        nav = self.navigable_positions()
        idx = self._rng.permutation(len(nav))[: self.n_init_configs]
        return nav[idx]

    def _add_table(self, builder, name, cx, cy, hx=0.6, hy=0.4,
                   height=0.75, yaw=0.0):
        q = np.array([np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)], np.float32)
        builder.add_static_body(
            name, np.array([cx, cy, height - 0.02, *q], np.float32),
            [box_geom([hx, hy, 0.02], friction=0.6)],
        )
        builder.add_static_body(
            f"{name}-legs", np.array([cx, cy, (height - 0.04) / 2, *q],
                                     np.float32),
            [box_geom([hx - 0.05, hy - 0.05, (height - 0.04) / 2])],
        )
        self._occupied.append(
            (np.array([cx, cy, 0.0]), np.array([hx, hy, 0.0])))

    def _add_counter(self, builder, name, cx, cy, hx, hy, height=0.92):
        builder.add_static_body(
            name, np.array([cx, cy, height - 0.02, 1, 0, 0, 0], np.float32),
            [box_geom([hx, hy, 0.02], friction=0.6)],
        )
        builder.add_static_body(
            f"{name}-body",
            np.array([cx, cy, (height - 0.04) / 2, 1, 0, 0, 0], np.float32),
            [box_geom([hx, hy, (height - 0.04) / 2])],
        )
        self._occupied.append(
            (np.array([cx, cy, 0.0]), np.array([hx, hy, 0.0])))

    def _add_shelf(self, builder, name, cx, cy, hx=0.4, hy=0.15):
        for i, z in enumerate((0.3, 0.7, 1.1)):
            builder.add_static_body(
                f"{name}-s{i}",
                np.array([cx, cy, z, 1, 0, 0, 0], np.float32),
                [box_geom([hx, hy, 0.015], friction=0.6)],
            )
        self._occupied.append(
            (np.array([cx, cy, 0.0]), np.array([hx, hy, 0.0])))

    def _build_furniture(self, builder):
        raise NotImplementedError


@register_scene_builder("replicacad")
class ReplicaCADSceneBuilder(_DatasetSceneBuilder):
    """Apartment-style layouts (reference ``scene_builder/replicacad``:
    the FRL apartment variations)."""

    n_build_configs = 4

    def _build_furniture(self, builder):
        r = self._rng
        # dining table somewhere in the middle band
        self._add_table(builder, "dining_table",
                        float(r.uniform(-1.0, 1.0)),
                        float(r.uniform(-1.5, 0.0)),
                        hx=0.75, hy=0.45, yaw=float(r.uniform(0, np.pi)))
        # kitchen counter run along +x wall
        self._add_counter(builder, "kitchen_counter",
                          self.ROOM_HALF[0] - 0.45,
                          float(r.uniform(-1.0, 1.0)), 0.35, 1.2)
        # a sofa-like low block and a shelf
        self._add_table(builder, "sofa",
                        float(r.uniform(-2.0, -0.5)),
                        float(r.uniform(1.5, 2.5)),
                        hx=0.9, hy=0.4, height=0.45)
        self._add_shelf(builder, "shelf",
                        -self.ROOM_HALF[0] + 0.25,
                        float(r.uniform(-2.0, 0.0)))


@register_scene_builder("ai2thor")
class AI2THORSceneBuilder(_DatasetSceneBuilder):
    """House-room layouts (reference ``scene_builder/ai2thor``:
    ArchitecTHOR/ProcTHOR houses)."""

    n_build_configs = 6

    def _build_furniture(self, builder):
        r = self._rng
        for i in range(int(r.randint(2, 4))):
            self._add_table(builder, f"table{i}",
                            float(r.uniform(-1.8, 1.8)),
                            float(r.uniform(-2.2, 2.2)),
                            hx=float(r.uniform(0.4, 0.8)),
                            hy=float(r.uniform(0.3, 0.5)),
                            yaw=float(r.uniform(0, np.pi)))
        self._add_shelf(builder, "bookshelf",
                        float(r.uniform(-2.4, 2.4)),
                        self.ROOM_HALF[1] - 0.25)


@register_scene_builder("robocasa")
class RoboCasaSceneBuilder(_DatasetSceneBuilder):
    """Kitchen layouts (reference ``scene_builder/robocasa``: island,
    L-run, galley — the procedural kitchen generator)."""

    n_build_configs = 3

    def _build_furniture(self, builder):
        layout = self.build_config_idx
        rx, ry = self.ROOM_HALF
        if layout == 0:  # island kitchen
            self._add_counter(builder, "island", 0.0, 0.0, 0.5, 1.1)
            self._add_counter(builder, "wall_run", rx - 0.4, 0.0, 0.35, 2.4)
        elif layout == 1:  # L-shaped run
            self._add_counter(builder, "run_x", rx - 0.4, -0.5, 0.35, 2.2)
            self._add_counter(builder, "run_y", 0.3, ry - 0.4, 2.0, 0.35)
        else:  # galley
            self._add_counter(builder, "galley_a", rx - 0.4, 0.0, 0.35, 2.6)
            self._add_counter(builder, "galley_b", -rx + 0.4, 0.0, 0.35, 2.6)
        self._add_table(builder, "prep_table", 0.0, -ry + 0.8,
                        hx=0.5, hy=0.35)
