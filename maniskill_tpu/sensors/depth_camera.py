"""Simulated active-stereo depth sensor (RealSense D415-class).

TPU-native replacement for the reference ``StereoDepthCamera``
(``mani_skill/sensors/depth_camera.py:19,38`` — a thin wrapper over
SAPIEN's binary ``StereoDepthSensor``, CPU-sim only and marked "TODO:
reimplement" upstream). Instead of wrapping an external sensor pipeline,
this models the three error sources that dominate real active-stereo
depth, analytically and fully batched/jittable:

1. **Disparity quantization**: depth is recovered from integer-subpixel
   disparity ``d = f·B / z`` rounded to 1/``subpixel_bits`` px (RealSense
   ASICs use 1/32 px), so depth resolution degrades quadratically with
   range — the familiar "depth banding".
2. **Stereo occlusion holes**: a point visible to the left (reference)
   eye but occluded to the right eye cannot be matched; those pixels
   return 0 (invalid), exactly like the left-edge shadows real stereo
   sensors produce behind foreground objects. Implemented by rendering a
   true right-eye depth map and reprojection-checking each left pixel.
3. **Range gating**: ``z < min_depth`` (reference
   ``StereoDepthSensorConfig.min_depth``) and ``z > far`` are invalid.

Optional per-render Gaussian disparity noise (``noise_sigma_px``) models
matcher jitter; default 0 keeps renders deterministic for tests.

Output convention matches the reference sensor: ``depth`` in float32
meters with 0.0 = invalid/hole (the reference emits int16 mm with 0 =
invalid; the env obs pipeline converts units, and 0 stays the hole
marker).
"""
from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp
import numpy as np

from ..math.rotations import quat_apply
from .camera import Camera, CameraConfig


@dataclass
class StereoDepthCameraConfig(CameraConfig):
    """Reference ``StereoDepthCameraConfig`` (depth_camera.py:19-35) +
    the physical stereo parameters SAPIEN hides inside its sensor."""

    min_depth: float = 0.05
    baseline: float = 0.0545  # D415 left-right IR spacing (meters)
    subpixel_bits: int = 32  # disparity quantization denominator (px)
    noise_sigma_px: float = 0.0  # matcher jitter (disparity px)
    occlusion_tol: float = 0.01  # right-eye depth agreement (rel.)

    @classmethod
    def fromCameraConfig(cls, cfg: CameraConfig):
        return cls(**cfg.__dict__)


class StereoDepthCamera(Camera):
    """Active-stereo depth camera over the analytic renderer. The config
    camera is the LEFT (reference) eye and also supplies rgb/segmentation;
    the right eye sits ``baseline`` to its right (camera frame -y)."""

    # BaseEnv._get_obs threads a per-step fold_in key into render() so
    # configured matcher noise applies to observations
    needs_key = True

    def __init__(self, cfg: StereoDepthCameraConfig, model):
        super().__init__(cfg, model)
        pose = np.asarray(cfg.pose, np.float32)
        p, q = pose[:3], pose[3:7]
        # camera frame: +x forward, +y left — right eye at -y, same frame
        # composition for world and mount-local poses
        offset = np.asarray(
            quat_apply(jnp.asarray(q), jnp.array([0.0, -cfg.baseline, 0.0]))
        )
        right_pose = np.concatenate([p + offset, q]).astype(np.float32)
        right_cfg = replace(cfg, uid=cfg.uid + "_right", pose=right_pose)
        self._right = Camera(right_cfg, model)
        # focal length in pixels (square pixels, vertical fov)
        self._f_px = 0.5 * cfg.height / np.tan(cfg.fov / 2)

    def render(self, state, body_pos, body_quat, key=None, wanted=None):
        cfg: StereoDepthCameraConfig = self.cfg
        # the stereo model itself consumes left depth (+ position for
        # invalidation) and right depth only
        if wanted is not None:
            wanted = tuple(set(wanted) | {"depth"})
        out = super().render(state, body_pos, body_quat, wanted=wanted)
        right = self._right.render(
            state, body_pos, body_quat, wanted=("depth",))
        H, W = cfg.height, cfg.width
        z = out["depth"]  # (H, W) float32 meters, inf = no hit
        zr = right["depth"]

        f, B = self._f_px, cfg.baseline
        finite = jnp.isfinite(z)
        z_safe = jnp.where(finite, z, cfg.far)

        # 1. subpixel disparity quantization
        disp = f * B / jnp.maximum(z_safe, 1e-6)
        if key is not None and cfg.noise_sigma_px > 0:
            disp = disp + cfg.noise_sigma_px * jax.random.normal(
                key, disp.shape
            )
        bits = float(cfg.subpixel_bits)
        disp_q = jnp.round(disp * bits) / bits
        z_q = f * B / jnp.maximum(disp_q, 1e-6)

        # 2. occlusion check: left pixel (i, j) maps to right column
        #    j - disp; the right eye must see (approximately) the same
        #    depth there, else the point is in stereo shadow
        cols = jnp.arange(W, dtype=jnp.float32)[None, :]
        jr = jnp.clip(jnp.round(cols - disp), 0, W - 1).astype(jnp.int32)
        zr_at = jnp.take_along_axis(
            jnp.where(jnp.isfinite(zr), zr, cfg.far), jr, axis=1
        )
        in_right_fov = (cols - disp) >= 0.0
        matched = jnp.abs(zr_at - z_safe) <= (
            cfg.occlusion_tol * z_safe + 0.005
        )

        # 3. range gating — on the EMITTED (quantized) depth, so a surface
        # near the far plane whose quantized depth lands beyond it cannot
        # leak out-of-range values to consumers
        in_range = (z_q >= cfg.min_depth) & (z_q <= cfg.far)

        valid = finite & in_right_fov & matched & in_range
        out["depth"] = jnp.where(valid, z_q, 0.0)
        # invalidated points vanish from the pointcloud too (pipeline
        # filters nonfinite positions)
        if "position" in out:
            out["position"] = jnp.where(
                valid[..., None], out["position"], jnp.inf
            )
        out["stereo_valid"] = valid
        return out
