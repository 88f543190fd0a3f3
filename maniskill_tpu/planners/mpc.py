"""Receding-horizon MPC driver: proves the planner stack solves tasks
end-to-end.

This is the framework's north-star capability (BASELINE.json): a
sampling-based MPC loop that takes a registered task to ``success=True`` by
replanning with MPPI/CEM at every control step, warm-starting from the
shifted nominal sequence. The reference's closest analogues are the scripted
motion-planning solutions (``/root/reference/mani_skill/examples/
motionplanning/panda/solutions/`` — the task-completion bar) and the TD-MPC2
baseline (planning horizon 3, tdmpc2/config.yaml:47); here the *simulator
itself* is the model, so planning is exact.

Usage::

    from maniskill_tpu.planners.mpc import solve_task
    result = solve_task("PushCube-v1", planner="mppi",
                        config=MPPIConfig(horizon=10, num_samples=256),
                        episodes=5, seed=0)
    assert result["success_rate"] >= 0.8
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .cem import CEM, CEMConfig
from .mppi import MPPI, MPPIConfig


def _single(tree, i=0):
    """Slice env index i out of a batched EnvState pytree."""
    return jax.tree.map(lambda x: x[i], tree)


def make_planner(env, planner: str = "mppi", config=None, mesh=None):
    if planner == "mppi":
        return MPPI(env, config or MPPIConfig(), mesh=mesh)
    if planner == "cem":
        return CEM(env, config or CEMConfig(), mesh=mesh)
    raise ValueError(f"unknown planner {planner!r}")


def run_episode(
    env,
    planner_obj,
    seed: int = 0,
    max_steps: Optional[int] = None,
    stop_on_success: bool = True,
) -> Dict[str, Any]:
    """Run ONE receding-horizon episode on a num_envs=1 env.

    Returns dict with success, steps, return, actions (T, A) — the planned
    control sequence (the payload the oracle harness replays, tools/oracle.py).
    """
    assert env.num_envs == 1, "MPC driver plans for a single env"
    max_steps = max_steps or env.max_episode_steps or 50
    env.reset(seed=seed)
    ps = planner_obj.init(seed=seed)
    actions, rewards = [], []
    success = False
    infos = []
    for t in range(max_steps):
        env_state = _single(env._state)
        ps, action, info = planner_obj.plan_step(ps, env_state)
        obs, reward, terminated, truncated, step_info = env.step(action)
        actions.append(np.asarray(action))
        rewards.append(float(np.asarray(reward)[0]))
        infos.append({k: np.asarray(v)[0] for k, v in step_info.items()})
        if bool(np.asarray(step_info["success"])[0]):
            success = True
            if stop_on_success:
                break
    return dict(
        success=success,
        steps=len(actions),
        episode_return=float(np.sum(rewards)),
        actions=np.stack(actions) if actions else np.zeros((0, env.action_dim)),
        rewards=np.asarray(rewards),
        final_info=infos[-1] if infos else {},
        seed=seed,
    )


def solve_task(
    env_id: str,
    planner: str = "mppi",
    config=None,
    episodes: int = 5,
    seed: int = 0,
    max_steps: Optional[int] = None,
    env_kwargs: Optional[dict] = None,
    mesh=None,
) -> Dict[str, Any]:
    """Solve ``episodes`` seeded episodes of a registered task with receding-
    horizon MPC; returns success_rate + per-episode results."""
    from ..envs.registration import make

    kwargs = dict(num_envs=1, obs_mode="none", reward_mode="dense")
    kwargs.update(env_kwargs or {})
    env = make(env_id, **kwargs)
    planner_obj = make_planner(env, planner, config, mesh=mesh)
    results = [
        run_episode(env, planner_obj, seed=seed + i, max_steps=max_steps)
        for i in range(episodes)
    ]
    return dict(
        env_id=env_id,
        planner=planner,
        success_rate=float(np.mean([r["success"] for r in results])),
        mean_return=float(np.mean([r["episode_return"] for r in results])),
        mean_steps=float(np.mean([r["steps"] for r in results])),
        episodes=results,
    )
