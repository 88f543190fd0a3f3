"""Demo-generation CLI (reference ``mani_skill/examples/motionplanning/
panda/run.py`` analogue): run scripted solutions, record h5+json
trajectories.

  python -m maniskill_tpu.examples.motionplanning.run -e PickCube-v1 -n 16 \
      --traj-dir demos/
"""
from __future__ import annotations

import argparse

import numpy as np

import maniskill_tpu as mst
from maniskill_tpu.trajectory import RecordEpisode

from .solutions import CONTROL_MODES, SOLUTIONS


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-e", "--env-id", default="PickCube-v1")
    p.add_argument("-n", "--num-envs", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--traj-dir", default=None)
    p.add_argument("--save-video", action="store_true",
                   help="also write <traj-dir>/trajectory.mp4 (depth render)")
    args = p.parse_args()

    env = mst.make(
        args.env_id,
        num_envs=args.num_envs,
        control_mode=CONTROL_MODES.get(args.env_id, "pd_ee_delta_pos"),
        robot_init_qpos_noise=0.0,
    )
    recorder = None
    if args.traj_dir:
        recorder = RecordEpisode(env, args.traj_dir, save_obs=True,
                                 save_video=args.save_video,
                                 source_type="motionplanning")
        recorder.reset(seed=args.seed)
    else:
        env.reset(seed=args.seed)

    success = SOLUTIONS[args.env_id](env, recorder=recorder)
    print(f"{args.env_id}: solved {int(np.sum(success))}/{args.num_envs}")
    if recorder is not None:
        recorder.close()
        print(f"trajectories written to {args.traj_dir}")


if __name__ == "__main__":
    main()
