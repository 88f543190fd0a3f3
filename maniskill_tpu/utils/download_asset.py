"""Asset management CLI.

Counterpart of the reference asset downloader
(``mani_skill/utils/download_asset.py``). The core robot zoo is VENDORED
(maniskill_tpu/assets, see PROVENANCE.md), so nothing must be downloaded
to use the framework; this tool lists/verifies the asset tree and keeps
the download plumbing for optional external asset packs (mesh datasets)
in networked deployments.

Usage:
  python -m maniskill_tpu.utils.download_asset --list
  python -m maniskill_tpu.utils.download_asset --verify
  python -m maniskill_tpu.utils.download_asset <pack>   # networked only
"""
from __future__ import annotations

import argparse
import hashlib
import sys
from pathlib import Path

from .assets import ASSET_DIR

# optional external packs: name -> (url, sha256). Mesh-based datasets the
# primitive narrowphase cannot consume yet are intentionally absent.
EXTERNAL_PACKS: dict = {}


def list_assets():
    for f in sorted(ASSET_DIR.rglob("*")):
        if f.is_file():
            print(f.relative_to(ASSET_DIR))


def verify():
    required = [
        "robots/panda/panda_v2.urdf",
        "robots/panda/panda_stick.urdf",
        "robots/fetch/fetch.urdf",
        "robots/trifinger/trifingerpro.urdf",
        "robots/xarm7/xarm7.urdf",
        "robots/allegro/allegro_hand_right.urdf",
        "robots/dclaw/dclaw_gripper_glb.urdf",
        "robots/humanoid/humanoid.xml",
        "control/hopper.xml",
        "control/ant.xml",
    ]
    missing = [r for r in required if not (ASSET_DIR / r).exists()]
    if missing:
        print("MISSING:", *missing, sep="\n  ")
        return 1
    print(f"ok: {len(required)} required assets present under {ASSET_DIR}")
    return 0


def download(pack: str):
    if pack not in EXTERNAL_PACKS:
        print(f"unknown pack {pack!r}; available: "
              f"{sorted(EXTERNAL_PACKS) or '(none — core assets are vendored)'}")
        return 1
    url, sha = EXTERNAL_PACKS[pack]
    import urllib.request

    dest = ASSET_DIR / f"{pack}.tar.gz"
    print(f"downloading {url} -> {dest}")
    urllib.request.urlretrieve(url, dest)
    digest = hashlib.sha256(dest.read_bytes()).hexdigest()
    if digest != sha:
        print("sha256 mismatch"); return 1
    import tarfile

    with tarfile.open(dest) as t:
        t.extractall(ASSET_DIR)
    return 0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("pack", nargs="?")
    p.add_argument("--list", action="store_true")
    p.add_argument("--verify", action="store_true")
    args = p.parse_args()
    if args.list:
        list_assets()
        return
    if args.verify or args.pack is None:
        sys.exit(verify())
    sys.exit(download(args.pack))


if __name__ == "__main__":
    main()
