"""Demonstration-dataset CLI.

Counterpart of the reference demo downloader
(``mani_skill/utils/download_demo.py``: env-id -> hosted dataset registry
with a ``python -m ... <env_id>`` CLI). Hosted datasets are unreachable in
air-gapped deployments, and this framework can MANUFACTURE its own
reference-format demos (scripted motion-planning solutions + MPC solvers),
so the registry maps each env id to a local generator; the URL plumbing
remains for networked mirrors.

Usage:
  python -m maniskill_tpu.utils.download_demo --list
  python -m maniskill_tpu.utils.download_demo PickCube-v1 -n 16
  python -m maniskill_tpu.utils.download_demo all -n 8
"""
from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

DEMO_DIR = Path(os.environ.get(
    "MS_DEMO_DIR", Path.home() / ".maniskill_tpu" / "demos"))

# env id -> generation backend. "motionplanning" uses the scripted
# EE-space solutions (examples/motionplanning/solutions.py); "mpc" solves
# episodes with MPPI and records them (slower, any registered task).
DEMO_SOURCES = {
    "PushCube-v1": dict(backend="motionplanning"),
    "PickCube-v1": dict(backend="motionplanning"),
    "PullCube-v1": dict(backend="mpc"),
    "PokeCube-v1": dict(backend="mpc"),
    "TurnFaucet-v1": dict(backend="mpc"),
    # hosted-mirror slots (networked deployments can fill url/sha256)
}


def generate(env_id: str, n: int, out_dir: Path) -> bool:
    src = DEMO_SOURCES.get(env_id)
    if src is None:
        print(f"no demo source registered for {env_id}", file=sys.stderr)
        return False
    out_dir.mkdir(parents=True, exist_ok=True)
    if src["backend"] == "motionplanning":
        from ..examples.motionplanning.run import main as mp_main

        argv = ["-e", env_id, "-n", str(n), "--traj-dir", str(out_dir)]
        old = sys.argv
        try:
            sys.argv = ["run.py"] + argv
            mp_main()
        finally:
            sys.argv = old
        return True
    # MPC backend: solve + record
    import numpy as np

    import maniskill_tpu as mst
    from ..planners.mpc import run_episode
    from ..planners.mppi import MPPI, MPPIConfig
    from ..trajectory.record import RecordEpisode

    # solve on the raw env, then replay the planned actions through a
    # recorded env at the same seed (deterministic resets make the replay
    # byte-identical to the solve)
    env = mst.make(env_id, num_envs=1, obs_mode="state",
                   reward_mode="dense")
    planner = MPPI(env, MPPIConfig(horizon=20, num_samples=1024,
                                   sigma=0.5, temperature=0.3))
    rec = RecordEpisode(
        mst.make(env_id, num_envs=1, obs_mode="state",
                 reward_mode="dense"),
        str(out_dir), save_obs=True)
    solved = 0
    for i in range(n):
        r = run_episode(env, planner, seed=i)
        if not r["success"]:
            continue
        solved += 1
        rec.reset(seed=i)
        for a in r["actions"]:
            rec.step(a)
    rec.close()
    print(f"{env_id}: {solved}/{n} MPC demos recorded")
    return True


def main():
    p = argparse.ArgumentParser()
    p.add_argument("env_id", nargs="?", default=None,
                   help="env id, or 'all'")
    p.add_argument("-n", type=int, default=16, help="episodes per env")
    p.add_argument("--list", action="store_true")
    p.add_argument("-o", "--output-dir", default=None)
    args = p.parse_args()

    if args.list or args.env_id is None:
        for k, v in DEMO_SOURCES.items():
            print(f"{k}: {v['backend']}")
        return

    targets = (list(DEMO_SOURCES) if args.env_id == "all"
               else [args.env_id])
    base = Path(args.output_dir) if args.output_dir else DEMO_DIR
    ok = True
    for env_id in targets:
        ok &= generate(env_id, args.n, base / env_id)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
