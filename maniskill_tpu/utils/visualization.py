"""Visualization: image tiling, obs→image conversion, video writing.

TPU-native analogue of the reference ``mani_skill/utils/visualization/misc.py``
(``tile_images``, video writing, text overlay) and
``sensors/camera.py:camera_observations_to_images``: converts the analytic
camera's depth/segmentation outputs into displayable uint8 images.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

# a small qualitative palette for segmentation ids (id 0 = background, black)
_PALETTE = np.array(
    [
        [0, 0, 0],
        [230, 25, 75], [60, 180, 75], [255, 225, 25], [0, 130, 200],
        [245, 130, 48], [145, 30, 180], [70, 240, 240], [240, 50, 230],
        [210, 245, 60], [250, 190, 212], [0, 128, 128], [220, 190, 255],
        [170, 110, 40], [255, 250, 200], [128, 0, 0], [170, 255, 195],
        [128, 128, 0], [255, 215, 180], [0, 0, 128], [128, 128, 128],
    ],
    np.uint8,
)


def tile_images(images: Sequence[np.ndarray], nrows: Optional[int] = None):
    """Tile a list of (H, W, C) images into one grid image (reference
    ``visualization/misc.py:tile_images``)."""
    images = [np.asarray(im) for im in images]
    n = len(images)
    if n == 1:
        return images[0]
    if nrows is None:
        nrows = int(np.floor(np.sqrt(n)))
    ncols = int(np.ceil(n / nrows))
    h, w = images[0].shape[:2]
    c = images[0].shape[2] if images[0].ndim == 3 else 1
    grid = np.zeros((nrows * h, ncols * w, c), images[0].dtype)
    for i, im in enumerate(images):
        r, col = divmod(i, ncols)
        grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = (
            im if im.ndim == 3 else im[..., None]
        )
    return grid


def depth_to_image(depth: np.ndarray, max_depth: Optional[float] = None):
    """Depth (H, W) meters (inf = no hit) → uint8 grayscale (H, W, 3)."""
    d = np.asarray(depth, np.float32).copy()
    hit = np.isfinite(d)
    if max_depth is None:
        max_depth = float(d[hit].max()) if hit.any() else 1.0
    d = np.clip(d / max(max_depth, 1e-6), 0.0, 1.0)
    img = ((1.0 - d) * 255).astype(np.uint8)
    img[~hit] = 0
    return np.repeat(img[..., None], 3, axis=-1)


def segmentation_to_image(seg: np.ndarray):
    """Segmentation ids (H, W) int → uint8 color image (H, W, 3)."""
    seg = np.asarray(seg).astype(np.int64) % len(_PALETTE)
    return _PALETTE[seg]


def observations_to_images(obs: Dict[str, np.ndarray]) -> List[np.ndarray]:
    """Camera obs dict (depth/segmentation/position) → list of uint8 images
    (reference ``camera_observations_to_images``, camera.py:299)."""
    out = []
    if "depth" in obs:
        out.append(depth_to_image(obs["depth"]))
    if "segmentation" in obs:
        out.append(segmentation_to_image(obs["segmentation"]))
    return out


def put_info_on_image(image: np.ndarray, info: Dict[str, float],
                      font_scale: float = 0.4):
    """Overlay key=value lines (reference ``misc.py:put_info_on_image``)."""
    import cv2

    img = np.ascontiguousarray(image)
    for i, (k, v) in enumerate(info.items()):
        text = f"{k}: {v:.3f}" if isinstance(v, float) else f"{k}: {v}"
        cv2.putText(img, text, (4, 16 + 16 * i), cv2.FONT_HERSHEY_SIMPLEX,
                    font_scale, (255, 255, 255), 1, cv2.LINE_AA)
    return img


def images_to_video(frames: Sequence[np.ndarray], output_path: str,
                    fps: int = 30):
    """Write uint8 RGB frames to an mp4 (reference ``misc.py`` video path;
    cv2.VideoWriter, no ffmpeg binary needed)."""
    import cv2

    assert len(frames) > 0, "no frames to write"
    os.makedirs(os.path.dirname(os.path.abspath(output_path)), exist_ok=True)
    h, w = frames[0].shape[:2]
    vw = cv2.VideoWriter(
        output_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    for f in frames:
        vw.write(cv2.cvtColor(np.asarray(f, np.uint8), cv2.COLOR_RGB2BGR))
    vw.release()
    return output_path
