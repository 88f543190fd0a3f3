"""Asset root resolution.

The framework is self-contained: vendored robot descriptions live in
``maniskill_tpu/assets`` (see assets/PROVENANCE.md). Override with
MS_TPU_ASSET_DIR to point at an external asset tree (the TPU-native
analogue of the reference's ASSET_DIR + download_asset.py machinery,
mani_skill/utils/download_asset.py — no network fetch is required for the
core robot zoo).
"""
import os
from pathlib import Path

ASSET_DIR = Path(
    os.environ.get(
        "MS_TPU_ASSET_DIR",
        Path(__file__).resolve().parent.parent / "assets",
    )
)
