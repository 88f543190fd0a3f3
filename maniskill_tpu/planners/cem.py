"""CEM (Cross-Entropy Method) planner.

Iterative elite-refit sampling MPC (BASELINE.json config #3: "StackCube-v1,
Panda, CEM with iLQR refinement"). Same rollout machinery as MPPI; per solve
it runs ``iterations`` rounds of sample → top-k elites → refit mean/std.
Elite selection over a sharded rollout axis lowers to XLA ``top_k`` +
collectives under jit.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class CEMConfig(NamedTuple):
    horizon: int = 50
    num_samples: int = 512
    num_elites: int = 64
    iterations: int = 4
    init_sigma: float = 0.6
    min_sigma: float = 0.05
    momentum: float = 0.1  # mean/std update momentum
    gamma: float = 1.0


class CEMState(NamedTuple):
    mean: jnp.ndarray  # (H, A)
    sigma: jnp.ndarray  # (H, A)
    key: jnp.ndarray


class CEM:
    def __init__(self, env, config: CEMConfig = CEMConfig(), mesh: Optional[Mesh] = None,
                 rollout_axis: str = "rollout"):
        self.env = env
        self.config = config
        self.action_dim = env.action_dim
        self.mesh = mesh
        cfg = config

        def rollout(env_state, controls):
            def step(carry, a):
                st, disc = carry
                st, r, _ = self.env._rollout_step(st, a)
                return (st, disc * cfg.gamma), r * disc

            (_, _), rews = jax.lax.scan(
                step, (env_state, jnp.float32(1.0)), controls
            )
            return jnp.sum(rews)

        def iteration(carry, _):
            mean, sigma, key, env_state = carry
            key, k = jax.random.split(key)
            noise = jax.random.normal(
                k, (cfg.num_samples, cfg.horizon, self.action_dim)
            )
            if mesh is not None:
                noise = jax.lax.with_sharding_constraint(
                    noise, NamedSharding(mesh, P(rollout_axis, None, None))
                )
            controls = jnp.clip(mean[None] + sigma[None] * noise, -1.0, 1.0)
            returns = jax.vmap(rollout, in_axes=(None, 0))(env_state, controls)
            # a diverged rollout (non-finite return) must never be an elite
            returns = jnp.where(jnp.isfinite(returns), returns, -jnp.inf)
            _, elite_idx = jax.lax.top_k(returns, cfg.num_elites)
            elites = controls[elite_idx]  # (E, H, A)
            new_mean = elites.mean(axis=0)
            new_sigma = elites.std(axis=0)
            mean = cfg.momentum * mean + (1 - cfg.momentum) * new_mean
            sigma = jnp.maximum(
                cfg.momentum * sigma + (1 - cfg.momentum) * new_sigma,
                cfg.min_sigma,
            )
            return (mean, sigma, key, env_state), returns.max()

        def solve(planner_state: CEMState, env_state):
            (mean, sigma, key, _), best = jax.lax.scan(
                iteration,
                (planner_state.mean, planner_state.sigma, planner_state.key,
                 env_state),
                None,
                length=cfg.iterations,
            )
            info = dict(best_return=best[-1])
            return CEMState(mean=mean, sigma=sigma, key=key), info

        self._solve = jax.jit(solve)

        def plan_step(planner_state, env_state):
            ps, info = solve(planner_state, env_state)
            action = ps.mean[0]
            shifted_mean = jnp.concatenate([ps.mean[1:], ps.mean[-1:]])
            shifted_sigma = jnp.concatenate(
                [ps.sigma[1:], jnp.full_like(ps.sigma[-1:], cfg.init_sigma)]
            )
            return (
                CEMState(mean=shifted_mean, sigma=shifted_sigma, key=ps.key),
                action,
                info,
            )

        self._plan_step = jax.jit(plan_step)

    def init(self, seed: int = 0) -> CEMState:
        cfg = self.config
        return CEMState(
            mean=jnp.zeros((cfg.horizon, self.action_dim)),
            sigma=jnp.full((cfg.horizon, self.action_dim), cfg.init_sigma),
            key=jax.random.key(seed),
        )

    def solve(self, ps, env_state):
        return self._solve(ps, env_state)

    def plan_step(self, ps, env_state):
        return self._plan_step(ps, env_state)
