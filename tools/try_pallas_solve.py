"""Measure: does dispatching the robot solve to solve_psd_pallas under vmap
speed up the full MPPI bench? Monkeypatch experiment, no API change."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from jax import custom_batching

from maniskill_tpu.physics import engine
from maniskill_tpu.physics.linalg import solve_psd
from maniskill_tpu.physics.pallas_kernels import solve_psd_pallas

USE_PALLAS = os.environ.get("USE_PALLAS", "1") == "1"

@custom_batching.custom_vmap
def solve_auto(A, b):
    return solve_psd(A, b)

@solve_auto.def_vmap
def _rule(axis_size, in_batched, A, b):
    ok = (
        USE_PALLAS
        and jax.default_backend() == "tpu"
        and in_batched[0] and in_batched[1]
        and A.ndim == 3
        and axis_size % 128 == 0
    )
    if ok:
        block = 1024 if axis_size % 1024 == 0 else 128
        out = solve_psd_pallas(A, b, block=block)
        print(f"[pallas solve: n={A.shape[-1]} K={axis_size} block={block}]")
    else:
        in_axes = tuple(0 if f else None for f in in_batched)
        out = jax.vmap(solve_psd, in_axes=in_axes)(A, b)
    return out, True

engine.solve_psd = solve_auto  # rebind the engine's solver

import maniskill_tpu as mst
from maniskill_tpu.planners import MPPI, MPPIConfig

K, H = 4096, 50
env = mst.make("PickCube-v1", num_envs=1, reward_mode="dense",
               robot_init_qpos_noise=0.0)
env.reset(seed=0)
es = jax.tree.map(lambda x: x[0], env._state)
planner = MPPI(env, MPPIConfig(horizon=H, num_samples=K, sigma=0.6,
                               temperature=0.3))
ps = planner.init(seed=0)
ps, _ = planner.solve(ps, es)
jax.block_until_ready(ps.nominal)
t0 = time.perf_counter()
for _ in range(5):
    ps, _ = planner.solve(ps, es)
jax.block_until_ready(ps.nominal)
dt = (time.perf_counter() - t0) / 5
print(f"MPPI solve: {dt*1e3:.1f} ms -> {K/dt:.0f} rollouts/s (pallas={USE_PALLAS})")
