"""Simulation throughput benchmark.

Protocol parity with the reference harness
(``mani_skill/examples/benchmarking/gpu_sim.py:44``): warm-up, then N timed
``env.step`` calls with random actions (device-sync fenced), reporting FPS =
steps × num_envs / wall; then a step+reset phase with resets every
``reset_interval`` steps. Results appended to a CSV like the reference
``Profiler.update_csv``.

Usage:
  python -m maniskill_tpu.examples.benchmarking.tpu_sim \
      --env-id CartpoleBalanceBenchmark-v1 --num-envs 1024 --steps 1000
"""
from __future__ import annotations

import argparse
import csv
import os
import time

import jax
import numpy as np

import maniskill_tpu as mst


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env-id", default="CartpoleBalanceBenchmark-v1")
    p.add_argument("--num-envs", type=int, default=1024)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--reset-interval", type=int, default=200)
    p.add_argument("--obs-mode", default="state")
    p.add_argument("--csv", default="bench_results.csv")
    args = p.parse_args()

    env = mst.make(args.env_id, num_envs=args.num_envs, obs_mode=args.obs_mode)
    obs, _ = env.reset(seed=2022)
    rng = np.random.RandomState(0)

    def random_action():
        return rng.uniform(-1, 1, (args.num_envs, env.action_dim)).astype(
            np.float32
        )

    # warm up / compile
    out = env.step(random_action())
    jax.block_until_ready(out[0])

    t0 = time.perf_counter()
    for _ in range(args.steps):
        out = env.step(random_action())
    jax.block_until_ready(out[0])
    dt = time.perf_counter() - t0
    fps = args.steps * args.num_envs / dt
    print(f"env.step/fps: {fps:.0f}  ({args.steps} steps x {args.num_envs} envs in {dt:.2f}s)")

    # step+reset phase (reference gpu_sim.py:120-150)
    env.reset(seed=2022)
    t0 = time.perf_counter()
    for i in range(args.steps):
        out = env.step(random_action())
        if (i + 1) % args.reset_interval == 0:
            env.reset()
    jax.block_until_ready(env._state.sim.qpos)
    dt2 = time.perf_counter() - t0
    fps2 = args.steps * args.num_envs / dt2
    print(f"env.step+reset/fps: {fps2:.0f}")

    row = dict(
        env_id=args.env_id,
        num_envs=args.num_envs,
        obs_mode=args.obs_mode,
        platform=jax.devices()[0].platform,
        **{"env.step/fps": round(fps, 1), "env.step+reset/fps": round(fps2, 1)},
    )
    write_header = not os.path.exists(args.csv)
    with open(args.csv, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(row))
        if write_header:
            w.writeheader()
        w.writerow(row)
    print(f"appended to {args.csv}")


if __name__ == "__main__":
    main()
