"""Run each scripted solution on a small batch and report success rates.

Usage: python tools/validate_solutions.py [env_id ...]
Defaults to the newly added solutions. Writes SOLUTIONS_RESULTS.json.
"""
import json
import sys
import time

import numpy as np

import maniskill_tpu as mst
from maniskill_tpu.examples.motionplanning.solutions import (
    CONTROL_MODES, SOLUTIONS)

DEFAULT = [
    "PickSingleHull-v1", "LiftPegUpright-v1", "PegInsertionSide-v1",
    "PlugCharger-v1", "PullCubeTool-v1", "DrawTriangle-v1", "DrawSVG-v1",
    "FoldSuitcase-v1", "RollBall-v1",
]


RESULTS_PATH = "/root/repo/SOLUTIONS_RESULTS.json"


def main():
    ids = sys.argv[1:] or DEFAULT
    results = {}
    try:  # merge into prior (possibly partial) runs
        with open(RESULTS_PATH) as f:
            results = json.load(f)
    except Exception:
        pass
    for env_id in ids:
        t0 = time.time()
        try:
            env = mst.make(
                env_id, num_envs=4,
                control_mode=CONTROL_MODES.get(env_id, "pd_ee_delta_pos"),
                robot_init_qpos_noise=0.0,
            )
            env.reset(seed=0)
            success = SOLUTIONS[env_id](env)
            rate = float(np.mean(np.asarray(success, np.float32)))
            results[env_id] = {"success": rate,
                               "wall_s": round(time.time() - t0, 1)}
        except Exception as e:  # noqa: BLE001 - report and continue
            results[env_id] = {"error": f"{type(e).__name__}: {e}",
                               "wall_s": round(time.time() - t0, 1)}
        print(env_id, results[env_id], flush=True)
    with open(RESULTS_PATH, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
