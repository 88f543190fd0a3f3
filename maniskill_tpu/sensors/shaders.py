"""Named shader packs for the analytic renderer.

TPU-native analogue of the reference ShaderConfig system
(``mani_skill/render/shaders.py:11`` ``ShaderConfig``, ``:67``
``PREBUILT_SHADER_CONFIGS``): a named pack selects which textures a camera
emits and how RGB is shaded. Where the reference packs configure SAPIEN
Vulkan/OptiX pipelines (spp, path depth, denoiser), the analytic packs
configure the closed-form ray renderer — same registry surface, same pack
names, hardware-appropriate semantics:

- ``minimal``  — geometry channels only (depth + segmentation + position),
  the fastest/leanest pack (reference: packed PositionSegmentation uint16).
- ``default``  — everything (rgb/depth/segmentation/position/normal),
  single directional light, no shadows. This is the behavior cameras had
  before packs existed, byte-compatible.
- ``rt``       — three directional lights with TRUE shadow rays (one
  occlusion ray per pixel per light against every scene geom).
- ``rt-med``/``rt-fast`` — one shadowed key light (cheaper).

Select per camera via ``CameraConfig(shader_pack="rt")``.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple


@dataclass(frozen=True)
class ShaderConfig:
    """Reference render/shaders.py:11 — shader_pack name, texture set, and
    pack-specific render config (here: lighting/shadow parameters)."""

    shader_pack: str
    # None = emit every texture the renderer produces
    texture_names: Optional[Tuple[str, ...]] = None
    ambient: float = 0.45
    # ((direction xyz), intensity) per directional light
    lights: Tuple[Tuple[Tuple[float, float, float], float], ...] = (
        ((-0.45, -0.3, -0.84), 1.0),
    )
    shadows: bool = False


PREBUILT_SHADER_CONFIGS = {
    "minimal": ShaderConfig(
        shader_pack="minimal",
        texture_names=("depth", "segmentation", "position"),
    ),
    "default": ShaderConfig(shader_pack="default"),
    "rt": ShaderConfig(
        shader_pack="rt",
        ambient=0.25,
        lights=(
            ((-0.45, -0.3, -0.84), 0.75),
            ((0.6, 0.2, -0.77), 0.35),
            ((0.0, 0.8, -0.6), 0.2),
        ),
        shadows=True,
    ),
    "rt-med": ShaderConfig(
        shader_pack="rt-med",
        ambient=0.35,
        lights=(((-0.45, -0.3, -0.84), 1.0),),
        shadows=True,
    ),
    "rt-fast": ShaderConfig(
        shader_pack="rt-fast",
        ambient=0.35,
        lights=(((-0.45, -0.3, -0.84), 1.0),),
        shadows=True,
    ),
}


def get_shader_config(name: Optional[str]) -> ShaderConfig:
    if name is None:
        name = "default"
    if name not in PREBUILT_SHADER_CONFIGS:
        raise KeyError(
            f"unknown shader pack {name!r}; available: "
            f"{sorted(PREBUILT_SHADER_CONFIGS)}"
        )
    return PREBUILT_SHADER_CONFIGS[name]


def set_shader_pack(config: ShaderConfig) -> None:
    """Register/override a pack (reference shaders.py set_shader_pack)."""
    PREBUILT_SHADER_CONFIGS[config.shader_pack] = config
