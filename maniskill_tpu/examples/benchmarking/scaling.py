"""MPPI rollout-sharding scaling benchmark.

Measures solves/s with the rollout batch sharded over an n-device mesh
(BASELINE.json scaling metric: solves/s efficiency at 1 vs N devices).
On a machine without a real multi-chip slice, run on the virtual CPU mesh:

  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
    python -m maniskill_tpu.examples.benchmarking.scaling --devices 1 2 4 8
"""
from __future__ import annotations

import argparse
import time

import jax
import numpy as np
from jax.sharding import Mesh

import maniskill_tpu as mst
from maniskill_tpu.planners import MPPI, MPPIConfig


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--horizon", type=int, default=10)
    p.add_argument("--samples", type=int, default=256)
    p.add_argument("--solves", type=int, default=3)
    args = p.parse_args()

    env = mst.make("PickCube-v1", num_envs=1, reward_mode="dense",
                   robot_init_qpos_noise=0.0)
    env.reset(seed=0)
    env_state = jax.tree.map(lambda x: x[0], env._state)

    results = {}
    for n in args.devices:
        if n > len(jax.devices()):
            print(f"skip n={n}: only {len(jax.devices())} devices")
            continue
        mesh = Mesh(np.array(jax.devices()[:n]), axis_names=("rollout",))
        planner = MPPI(
            env,
            MPPIConfig(horizon=args.horizon, num_samples=args.samples),
            mesh=mesh,
        )
        ps = planner.init(seed=0)
        ps, _ = planner.solve(ps, env_state)  # compile
        jax.block_until_ready(ps.nominal)
        t0 = time.perf_counter()
        for _ in range(args.solves):
            ps, _ = planner.solve(ps, env_state)
        jax.block_until_ready(ps.nominal)
        dt = (time.perf_counter() - t0) / args.solves
        results[n] = dt
        base = results[min(results)]
        n0 = min(results)
        eff = (base / dt) * (n0 / n)
        print(
            f"devices={n}: {dt*1e3:.0f} ms/solve "
            f"({args.samples/dt:.0f} rollouts/s, efficiency vs {n0}-dev: {eff:.2f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
