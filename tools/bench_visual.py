"""Visual-observation throughput benchmark vs the reference headline table.

Reference numbers (RTX 4090, SURVEY.md §6 / BASELINE.md — protocol
``gpu_sim.py:44``: timed random-action step loop, sync-fenced):

  CartpoleBalanceBenchmark rgb   1x640x480, 512 envs : 10,792 fps
  CartpoleBalanceBenchmark depth 1x640x480, 512 envs :  9,935 fps
  CartpoleBalanceBenchmark rgb   3x320x180, 1024 envs:  8,516 fps
  FrankaBenchmark          rgb   1x640x480, 512 envs :  6,741 fps

Runs the same configs on one TPU chip through the analytic renderer and
writes SIMFPS_visual.json rows {env_id, obs_mode, cams, w, h, num_envs,
fps, ref_fps, vs_ref}.

Usage: python tools/bench_visual.py [--steps 100]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

CONFIGS = [
    # (env_id, obs_mode, cams, w, h, num_envs, reference_fps)
    ("CartpoleBalanceBenchmark-v1", "rgb", 1, 640, 480, 512, 10792.0),
    ("CartpoleBalanceBenchmark-v1", "depth", 1, 640, 480, 512, 9935.0),
    ("CartpoleBalanceBenchmark-v1", "rgb", 3, 320, 180, 1024, 8516.0),
    ("CartpoleBalanceBenchmark-v1", "rgbd", 1, 128, 128, 1024, None),
    ("FrankaPickCubeBenchmark-v1", "rgb", 1, 640, 480, 512, 6741.0),
]


def bench_one(env_id, obs_mode, cams, w, h, num_envs, steps):
    import maniskill_tpu as mst

    kw = dict(camera_width=w, camera_height=h, num_cameras=cams)
    env = mst.make(env_id, num_envs=num_envs, obs_mode=obs_mode, **kw)
    env.reset(seed=2022)
    rng = np.random.RandomState(0)

    def act():
        return rng.uniform(-1, 1, (num_envs, env.action_dim)).astype(
            np.float32)

    out = env.step(act())
    jax.block_until_ready(jax.tree.leaves(out[0])[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = env.step(act())
    jax.block_until_ready(jax.tree.leaves(out[0])[0])
    dt = time.perf_counter() - t0
    return steps * num_envs / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--out", default="SIMFPS_visual.json")
    args = p.parse_args()

    platform = jax.devices()[0].platform
    rows = []
    for env_id, obs_mode, cams, w, h, num_envs, ref in CONFIGS:
        if platform == "cpu":
            num_envs, steps = 8, 3  # smoke mode
        else:
            steps = args.steps
        try:
            fps = bench_one(env_id, obs_mode, cams, w, h, num_envs, steps)
            err = None
        except Exception as e:  # OOM etc: record, keep going
            fps, err = 0.0, f"{type(e).__name__}: {str(e)[:200]}"
        row = dict(env_id=env_id, obs_mode=obs_mode, cams=cams, w=w, h=h,
                   num_envs=num_envs, platform=platform,
                   fps=round(fps, 1), ref_fps_rtx4090=ref,
                   vs_ref=round(fps / ref, 3) if (ref and fps) else None,
                   error=err)
        rows.append(row)
        print(json.dumps(row), flush=True)
    if platform != "cpu":
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
