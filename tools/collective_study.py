"""Multi-chip sharding study: what collectives does the sharded MPPI
solve actually lower to, and is the math identical across mesh sizes?

VERDICT r2 §2.10: perf numbers on a virtual CPU mesh are meaningless
(devices share one thread pool — PLAN.md "negative results"), but the
COMPILED PROGRAM is the real program: this tool inspects the optimized
HLO of the sharded MPPI solve at several mesh sizes and records
  - which collective ops appear (all-reduce for the softmax/weighted-mean
    reductions, collective-permute/all-gather only if layouts force them),
  - that the solve result is identical (tolerance) across 1/2/4/8-device
    meshes — the sharding changes the schedule, not the math.

Run under a virtual mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python tools/collective_study.py
Writes MULTICHIP_STUDY.json.
"""
import json
import re
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

COLLECTIVE_OPS = ("all-reduce", "all-gather", "reduce-scatter",
                  "collective-permute", "all-to-all")


def solve_nominal(mesh, K=512, H=10, seed=0):
    import maniskill_tpu as mst
    from maniskill_tpu.planners.mppi import MPPI, MPPIConfig

    env = mst.make("PickCube-v1", num_envs=1, obs_mode="none")
    env.reset(seed=3)
    cfg = MPPIConfig(horizon=H, num_samples=K, sigma=0.4, temperature=0.2)
    planner = MPPI(env, cfg, mesh=mesh)
    ps = planner.init(seed=seed)
    est = jax.tree.map(lambda x: x[0], env._state)
    # compiled text of the solve
    lowered = jax.jit(planner._solve.__wrapped__
                      if hasattr(planner._solve, "__wrapped__")
                      else planner._solve).lower(ps, est)
    hlo = lowered.compile().as_text()
    counts = {
        op: len(re.findall(rf"\b{op}\b", hlo)) for op in COLLECTIVE_OPS
    }
    ps2, info = planner.solve(ps, est)
    return np.asarray(ps2.nominal), counts, float(info["best_return"])


def main():
    devs = jax.devices()
    results = {"n_devices_available": len(devs), "meshes": {}}
    baseline = None
    for n in (1, 2, 4, 8):
        if n > len(devs):
            continue
        mesh = Mesh(np.array(devs[:n]), ("rollout",))
        nominal, counts, best = solve_nominal(mesh)
        row = dict(collectives=counts, best_return=best)
        if baseline is None:
            baseline = nominal
            row["max_abs_diff_vs_1dev"] = 0.0
        else:
            row["max_abs_diff_vs_1dev"] = float(
                np.abs(nominal - baseline).max())
        results["meshes"][str(n)] = row
        print(n, "devices:", row, flush=True)
    # contract: sharding must not change the math beyond reduction
    # reordering noise
    diffs = [r["max_abs_diff_vs_1dev"] for r in results["meshes"].values()]
    results["consistent"] = bool(max(diffs) < 1e-4)
    with open("/root/repo/MULTICHIP_STUDY.json", "w") as f:
        json.dump(results, f, indent=1)
    print("consistent:", results["consistent"])


if __name__ == "__main__":
    main()
