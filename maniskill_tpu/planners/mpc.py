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

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .cem import CEM, CEMConfig, CEMState
from .ilqr import ILQR, ILQRConfig
from .mppi import MPPI, MPPIConfig


def _single(tree, i=0):
    """Slice env index i out of a batched EnvState pytree."""
    return jax.tree.map(lambda x: x[i], tree)


class CEMILQRConfig(NamedTuple):
    cem: CEMConfig = CEMConfig()
    ilqr: ILQRConfig = ILQRConfig()


class CEMILQR:
    """CEM warm-start + iLQR refinement (BASELINE config #3: "StackCube-v1,
    Panda, CEM with iLQR refinement, contact-rich cost, horizon 60").

    Per replan: a CEM solve proposes a nominal sequence (global sampling
    escapes the contact-rich local minima), then iLQR polishes it through
    the differentiable dynamics (local second-order refinement CEM's
    diagonal Gaussian cannot express). Planner state is the CEM state; the
    executed sequence is the refined one.
    """

    def __init__(self, env, config: CEMILQRConfig = CEMILQRConfig(),
                 mesh=None, rollout_axis: str = "rollout",
                 composite_jit: bool = True):
        assert config.cem.horizon == config.ilqr.horizon, (
            config.cem.horizon, config.ilqr.horizon)
        self.env = env
        self.config = config
        self.action_dim = env.action_dim
        self.composite_jit = composite_jit
        self.cem = CEM(env, config.cem, mesh=mesh, rollout_axis=rollout_axis)
        self.ilqr = ILQR(env, config.ilqr)
        cfg = config

        def plan_step(ps, env_state):
            ps2, cinfo = self.cem._solve.__wrapped__(ps, env_state) \
                if hasattr(self.cem._solve, "__wrapped__") \
                else self.cem.solve(ps, env_state)
            U, rinfo = self.ilqr._solve_fn(env_state, ps2.mean)
            action = U[0]
            shifted_mean = jnp.concatenate([U[1:], U[-1:]])
            shifted_sigma = jnp.concatenate(
                [ps2.sigma[1:],
                 jnp.full_like(ps2.sigma[-1:], cfg.cem.init_sigma)]
            )
            info = dict(
                cem_best_return=cinfo["best_return"],
                ilqr_initial_cost=rinfo["initial_cost"],
                ilqr_final_cost=rinfo["final_cost"],
            )
            return (CEMState(mean=shifted_mean, sigma=shifted_sigma,
                             key=ps2.key), action, info)

        self._plan_step = jax.jit(plan_step)

    def init(self, seed: int = 0) -> CEMState:
        return self.cem.init(seed=seed)

    def plan_step(self, ps, env_state):
        if self.composite_jit:
            return self._plan_step(ps, env_state)
        # split mode: two SEPARATE compiled programs sequenced on host —
        # the fused composite exceeds what the remote-compile service
        # handles for contact-rich scenes (observed round 5: repeated
        # UNAVAILABLE device errors on the fused StackCube program)
        cfg = self.config
        ps2, cinfo = self.cem.solve(ps, env_state)
        U, rinfo = self.ilqr.solve(env_state, ps2.mean)
        action = U[0]
        shifted_mean = jnp.concatenate([U[1:], U[-1:]])
        shifted_sigma = jnp.concatenate(
            [ps2.sigma[1:],
             jnp.full_like(ps2.sigma[-1:], cfg.cem.init_sigma)]
        )
        info = dict(
            cem_best_return=cinfo["best_return"],
            ilqr_initial_cost=rinfo["initial_cost"],
            ilqr_final_cost=rinfo["final_cost"],
        )
        return (CEMState(mean=shifted_mean, sigma=shifted_sigma,
                         key=ps2.key), action, info)


def make_planner(env, planner: str = "mppi", config=None, mesh=None):
    if planner == "mppi":
        return MPPI(env, config or MPPIConfig(), mesh=mesh)
    if planner == "cem":
        return CEM(env, config or CEMConfig(), mesh=mesh)
    if planner == "cem-ilqr":
        return CEMILQR(env, config or CEMILQRConfig(), mesh=mesh)
    if planner == "cem-ilqr-split":
        # CEM and iLQR as two separate compiled programs (host-sequenced)
        return CEMILQR(env, config or CEMILQRConfig(), mesh=mesh,
                       composite_jit=False)
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
    import time

    assert env.num_envs == 1, "MPC driver plans for a single env"
    max_steps = max_steps or env.max_episode_steps or 50
    env.reset(seed=seed)
    ps = planner_obj.init(seed=seed)
    actions, rewards = [], []
    success = False
    infos = []
    plan_wall = 0.0
    plans_timed = 0
    for t in range(max_steps):
        env_state = _single(env._state)
        t0 = time.perf_counter()
        ps, action, info = planner_obj.plan_step(ps, env_state)
        jax.block_until_ready(action)
        if t > 0:  # step 0 pays the compile
            plan_wall += time.perf_counter() - t0
            plans_timed += 1
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
        # post-compile planning rate (solve only; the host-loop driver —
        # device round trips excluded from the solve timing itself)
        replan_hz=(plans_timed / plan_wall) if plan_wall > 0 else 0.0,
    )


def run_episode_device(
    env,
    planner_obj,
    seed: int = 0,
    max_steps: Optional[int] = None,
) -> Dict[str, Any]:
    """One receding-horizon episode run ENTIRELY on device: plan + step
    fused into a single ``lax.scan``, so the control loop pays zero
    host↔device round trips per step (the per-step sync through a remote
    device link is what capped the replan rate at ~1 Hz). After success
    the state freezes; steps-to-success comes from the scanned flags.

    Returns the run_episode dict plus ``replan_hz`` (measured replanning
    rate = control steps / wall time of the fused scan, post-compile).
    """
    import time

    assert env.num_envs == 1, "MPC driver plans for a single env"
    max_steps = max_steps or env.max_episode_steps or 50
    env.reset(seed=seed)
    ps0 = planner_obj.init(seed=seed)
    st0 = env._state

    step_one_b = jax.vmap(env._step_one)

    def body(carry, _):
        ps, state, done = carry
        ps2, action, pinfo = planner_obj.plan_step(ps, _single(state))
        state2, obs, reward, terminated, sinfo = step_one_b(
            state, action[None]
        )
        succ = sinfo["success"][0]
        # freeze after success (episode over; keep shapes static)
        keep = lambda new, old: jax.tree.map(
            lambda n, o: jnp.where(done, o, n), new, old
        )
        state2 = keep(state2, state)
        ps2 = keep(ps2, ps)
        out = dict(
            action=jnp.where(done, jnp.zeros_like(action), action),
            reward=jnp.where(done, 0.0, reward[0]),
            success=succ | done,
        )
        return (ps2, state2, done | succ), out

    @jax.jit
    def episode(ps, state):
        (_, final_state, done), out = jax.lax.scan(
            body, (ps, state, jnp.asarray(False)), None, length=max_steps
        )
        return final_state, done, out

    final_state, done, out = episode(ps0, st0)
    jax.block_until_ready(done)
    t0 = time.perf_counter()
    final_state, done, out = episode(ps0, st0)
    jax.block_until_ready(done)
    wall = time.perf_counter() - t0

    succ_flags = np.asarray(out["success"])
    success = bool(succ_flags.any())
    steps = int(np.argmax(succ_flags)) + 1 if success else max_steps
    rewards = np.asarray(out["reward"])[:steps]
    env._state = final_state
    return dict(
        success=success,
        steps=steps,
        episode_return=float(rewards.sum()),
        actions=np.asarray(out["action"])[:steps],
        rewards=rewards,
        final_info={},
        seed=seed,
        replan_hz=max_steps / wall,
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
    device_loop: bool = False,
) -> Dict[str, Any]:
    """Solve ``episodes`` seeded episodes of a registered task with receding-
    horizon MPC; returns success_rate + per-episode results."""
    from ..envs.registration import make

    kwargs = dict(num_envs=1, obs_mode="none", reward_mode="dense")
    kwargs.update(env_kwargs or {})
    env = make(env_id, **kwargs)
    planner_obj = make_planner(env, planner, config, mesh=mesh)
    runner = run_episode_device if device_loop else run_episode
    results = [
        runner(env, planner_obj, seed=seed + i, max_steps=max_steps)
        for i in range(episodes)
    ]
    out = dict(
        env_id=env_id,
        planner=planner,
        success_rate=float(np.mean([r["success"] for r in results])),
        mean_return=float(np.mean([r["episode_return"] for r in results])),
        mean_steps=float(np.mean([r["steps"] for r in results])),
        episodes=results,
    )
    hzs = [r["replan_hz"] for r in results if r.get("replan_hz")]
    if hzs:
        out["replan_hz"] = float(np.mean(hzs))
    return out
