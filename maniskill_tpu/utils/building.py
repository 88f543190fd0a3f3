"""Prebuilt-actor loaders: real mesh assets → padded convex hulls.

Reference analogue: ``mani_skill/utils/building/actors/ycb.py`` /
``actors/common.py`` (SAPIEN builders over cooked convex meshes from the
YCB asset pack). TPU-native realization: a dependency-free OBJ vertex
reader + ``physics.hulls.make_hull`` (greedy-decimated convex hull with a
STATIC vertex/face budget) produce a ``HullAsset`` any scene consumes via
``SceneSpecBuilder.add_free_hull`` — static shapes, per-env model
selection through the SimState hull tables.

Mesh packs are optional downloads (``utils/download_asset.py``); when a
model id has no local mesh the loader falls back to the procedural
standard-object library so every task stays runnable offline.
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from ..physics.hulls import HullAsset, make_hull, standard_object_library
from .assets import ASSET_DIR

# where the YCB pack lands when downloaded (mirrors the reference's
# ~/.maniskill data dir convention, utils/download_asset.py)
YCB_DIR = os.environ.get(
    "MANISKILL_TPU_YCB_DIR", str(ASSET_DIR / "mani_skill2_ycb" / "models")
)


def load_obj_vertices(path: str) -> np.ndarray:
    """Minimal OBJ reader: vertex positions only (N, 3). Ignores normals,
    uvs, faces — the convex hull of the vertex set is what contact needs."""
    verts: List[List[float]] = []
    with open(path, "r", errors="ignore") as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]),
                              float(parts[3])])
    if not verts:
        raise ValueError(f"no vertices in {path}")
    return np.asarray(verts, np.float64)


def _find_mesh(model_id: str) -> Optional[str]:
    base = os.path.join(YCB_DIR, model_id)
    for rel in ("collision.obj", "textured.obj",
                os.path.join("google_16k", "textured.obj")):
        p = os.path.join(base, rel)
        if os.path.exists(p):
            return p
    return None


def load_ycb_hull(model_id: str, scale: float = 1.0) -> HullAsset:
    """YCB object → padded HullAsset (reference
    ``utils/building/actors/ycb.py:get_actor_builder``). Requires the YCB
    mesh pack under ``YCB_DIR``; raises FileNotFoundError otherwise (use
    :func:`ycb_or_procedural_library` for a fallback path)."""
    mesh = _find_mesh(model_id)
    if mesh is None:
        raise FileNotFoundError(
            f"YCB model '{model_id}' not found under {YCB_DIR} — download "
            "the asset pack (python -m maniskill_tpu.utils.download_asset "
            "ycb) or use ycb_or_procedural_library()"
        )
    pts = load_obj_vertices(mesh) * scale
    return make_hull(model_id, pts)


# the reference PickSingleYCB episode id list's most-used models
DEFAULT_YCB_IDS = [
    "002_master_chef_can", "003_cracker_box", "004_sugar_box",
    "005_tomato_soup_can", "006_mustard_bottle", "008_pudding_box",
    "009_gelatin_box", "010_potted_meat_can",
]


def ycb_or_procedural_library(
    model_ids: Optional[List[str]] = None,
) -> List[HullAsset]:
    """HullAssets for the given YCB ids, substituting procedural stand-ins
    (physics/hulls.py standard_object_library) for any id whose mesh is not
    downloaded. Always returns a non-empty, length-stable list so per-env
    model tables keep static shapes with or without the asset pack."""
    ids = model_ids or DEFAULT_YCB_IDS
    procedural = standard_object_library()
    out: List[HullAsset] = []
    for i, mid in enumerate(ids):
        try:
            out.append(load_ycb_hull(mid))
        except (FileNotFoundError, ValueError):
            out.append(procedural[i % len(procedural)])
    return out
