"""Per-env fps table: mega-kernel fast path vs XLA path (VERDICT r2 #2).

For each flagship scene (the BASELINE.json configs + the round-3 kernel
generalization targets) measures sim-only env.step throughput at the same
protocol as tpu_sim.py (warm-up, timed steps, sync-fenced) on both
sim_backend="auto" (Pallas mega-kernel for TPU batches >= 512) and
sim_backend="xla", and records whether supports() routes the scene to the
kernel. Writes KERNEL_FPS.json.

Usage: python tools/bench_flagship.py [--num-envs 4096] [--steps 200]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

FLAGSHIPS = [
    "PickCube-v1",
    "StackCube-v1",
    "PegInsertionSide-v1",
    "PlugCharger-v1",
    "OpenCabinetDrawer-v1",
    "PushCube-v1",
    "TwoRobotPushCube-v1",  # documented fallback (P=832 exceeds VMEM)
]


def bench(env_id, num_envs, steps, backend):
    import maniskill_tpu as mst

    env = mst.make(env_id, num_envs=num_envs, obs_mode="none",
                   sim_backend=backend)
    env.reset(seed=2022)
    rng = np.random.RandomState(0)

    def act():
        return rng.uniform(-1, 1, (num_envs, env.action_dim)).astype(
            np.float32
        )

    out = env.step(act())
    jax.block_until_ready(out[1])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = env.step(act())
    jax.block_until_ready(out[1])
    dt = time.perf_counter() - t0
    return steps * num_envs / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-envs", type=int, default=4096)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--envs", nargs="*", default=FLAGSHIPS)
    args = p.parse_args()

    import maniskill_tpu as mst
    from maniskill_tpu.physics import megakernel

    platform = jax.devices()[0].platform
    if platform == "cpu":
        args.num_envs = min(args.num_envs, 64)
        args.steps = min(args.steps, 20)

    results = {}
    try:  # merge into prior chunked runs
        with open("/root/repo/KERNEL_FPS.json") as f:
            results = json.load(f)
    except Exception:
        pass
    for env_id in args.envs:
        probe = mst.make(env_id, num_envs=1)
        on_kernel = bool(megakernel.supports(probe.model))
        row = dict(
            platform=platform,
            num_envs=args.num_envs,
            kernel_supported=on_kernel,
            P=int(probe.model.n_points),
            n_all=int(probe.model.nq + 6 * probe.model.n_free),
        )
        try:
            row["fps_auto"] = round(
                bench(env_id, args.num_envs, args.steps, "auto"), 1
            )
            row["fps_xla"] = round(
                bench(env_id, args.num_envs, args.steps, "xla"), 1
            )
            row["speedup"] = round(row["fps_auto"] / row["fps_xla"], 2)
        except Exception as e:  # keep the table parsable on failures
            row["error"] = f"{type(e).__name__}: {str(e)[:300]}"
        results[env_id] = row
        print(env_id, row, flush=True)

    with open("/root/repo/KERNEL_FPS.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
