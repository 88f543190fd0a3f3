"""Benchmark: PickCube-v1 MPPI rollout throughput per chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Protocol (mirrors the reference benchmark shape, gpu_sim.py:44: timed step
loop, sync-fenced): one warm-up + timed MPPI solves on PickCube-v1 at
horizon 50; rollouts/s = num_samples * solves / wall time. vs_baseline is
against the BASELINE.json target of 10,000 rollouts/s/chip.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


def main():
    import maniskill_tpu as mst
    from maniskill_tpu.planners import MPPI, MPPIConfig

    # Fail soft on backend init: the axon TPU tunnel can be down, in which
    # case jax.devices() either raises UNAVAILABLE or hangs. Probe it in a
    # watchdog thread; emit a machine-readable error JSON either way.
    import threading

    probe = {}

    def _probe():
        try:
            probe["platform"] = jax.devices()[0].platform
        except Exception as e:
            probe["error"] = f"backend init failed: {type(e).__name__}: {str(e)[:500]}"

    th = threading.Thread(target=_probe, daemon=True)
    th.start()
    th.join(timeout=float(os.environ.get("BENCH_INIT_TIMEOUT", 300)))
    if "platform" not in probe:
        print(json.dumps(dict(
            metric="PickCube-v1 MPPI rollouts/s/chip",
            value=0.0, unit="rollouts/s", vs_baseline=0.0,
            error=probe.get("error", "backend init timed out (TPU tunnel down?)"),
        )))
        sys.stdout.flush()
        os._exit(0)  # backend-init thread may be unkillable; exit hard

    horizon = int(os.environ.get("BENCH_HORIZON", 50))
    num_samples = int(os.environ.get("BENCH_SAMPLES", 4096))
    platform = probe["platform"]
    if platform == "cpu":
        # CPU smoke-mode so the bench is runnable anywhere
        num_samples = int(os.environ.get("BENCH_SAMPLES", 64))

    env = mst.make(
        "PickCube-v1", num_envs=1, reward_mode="dense", robot_init_qpos_noise=0.0
    )
    env.reset(seed=0)
    env_state = jax.tree.map(lambda x: x[0], env._state)

    planner = MPPI(
        env,
        MPPIConfig(horizon=horizon, num_samples=num_samples, sigma=0.6,
                   temperature=0.3),
    )
    ps = planner.init(seed=0)

    # warm-up / compile
    ps, info = planner.solve(ps, env_state)
    jax.block_until_ready(ps.nominal)

    n_solves = 5 if platform != "cpu" else 2
    t0 = time.perf_counter()
    for _ in range(n_solves):
        ps, info = planner.solve(ps, env_state)
    jax.block_until_ready(ps.nominal)
    dt = time.perf_counter() - t0

    rollouts_per_s = num_samples * n_solves / dt
    target = 10_000.0  # BASELINE.json: >=10k rollouts/s/chip
    print(
        json.dumps(
            dict(
                metric=f"PickCube-v1 MPPI rollouts/s/chip (H={horizon}, K={num_samples}, {platform})",
                value=round(rollouts_per_s, 1),
                unit="rollouts/s",
                vs_baseline=round(rollouts_per_s / target, 4),
            )
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # never print a bare traceback: keep output parsable
        import traceback

        traceback.print_exc(file=sys.stderr)
        print(json.dumps(dict(
            metric="PickCube-v1 MPPI rollouts/s/chip",
            value=0.0, unit="rollouts/s", vs_baseline=0.0,
            error=f"{type(e).__name__}: {str(e)[:500]}",
        )))
        sys.stdout.flush()
        os._exit(1)
