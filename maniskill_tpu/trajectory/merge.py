"""Merge multiple trajectory files into one h5+json pair.

TPU-native analogue of the reference ``mani_skill/trajectory/
merge_trajectory.py:9``: combines the ``traj_{i}`` groups of several
RecordEpisode outputs, renumbering episode ids to stay unique, keeping the
first file's metadata for non-episode keys (conflicts are warned about).

CLI:
  python -m maniskill_tpu.trajectory.merge -o merged.h5 a.h5 b.h5
"""
from __future__ import annotations

import argparse
import json
import warnings
from typing import List


def merge_trajectories(output_path: str, traj_paths: List[str],
                       recompute_id: bool = True) -> int:
    """Returns the number of episodes written to ``output_path``."""
    import h5py

    assert output_path.endswith(".h5"), output_path
    out_json = dict(episodes=[])
    cnt = 0
    with h5py.File(output_path, "w") as out:
        for path in map(str, traj_paths):
            with h5py.File(path, "r") as f:
                meta = json.load(open(path[:-3] + ".json"))
                for k, v in meta.items():
                    if k == "episodes":
                        continue
                    if k not in out_json:
                        out_json[k] = v
                    elif out_json[k] != v:
                        warnings.warn(
                            f"metadata conflict on {k!r} in {path}; keeping "
                            "the first file's value"
                        )
                for ep in meta["episodes"]:
                    old_id = ep["episode_id"]
                    new_id = cnt if recompute_id else old_id
                    key = f"traj_{new_id}"
                    assert key not in out, f"duplicate episode id {new_id}"
                    f.copy(f[f"traj_{old_id}"], out, key)
                    ep = dict(ep, episode_id=new_id)
                    out_json["episodes"].append(ep)
                    cnt += 1
    with open(output_path[:-3] + ".json", "w") as f:
        json.dump(out_json, f, indent=2)
    return cnt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("inputs", nargs="+", help="input .h5 trajectory files")
    p.add_argument("-o", "--output", required=True, help="output .h5 path")
    p.add_argument("--keep-ids", action="store_true",
                   help="keep original episode ids (must be unique)")
    args = p.parse_args()
    n = merge_trajectories(args.output, args.inputs,
                           recompute_id=not args.keep_ids)
    print(f"merged {n} episodes from {len(args.inputs)} files into "
          f"{args.output}")


if __name__ == "__main__":
    main()
