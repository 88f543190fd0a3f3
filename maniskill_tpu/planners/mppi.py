"""MPPI (Model-Predictive Path Integral) planner.

The new capability this framework adds over the reference (BASELINE.json
north star): sampling-based MPC directly through the batched JAX dynamics.
One solve = K perturbed control sequences rolled out over horizon H via
``vmap(scan(env._rollout_step))``, importance-weighted with a softmax over
returns, warm-started receding-horizon style.

Scaling: the K rollout axis is the natural data-parallel axis. Pass a
``jax.sharding.Mesh`` and the solver shards rollouts across chips; the
softmax/weighted-mean reductions become XLA ``psum`` collectives over ICI
automatically under jit.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class MPPIConfig(NamedTuple):
    horizon: int = 50
    num_samples: int = 1024
    sigma: float = 0.5  # exploration std in normalized action units
    temperature: float = 0.5  # softmax temperature λ
    gamma: float = 1.0  # reward discount
    shift_fill: str = "repeat"  # warm-start fill for the last step
    # optional (H, A) initial nominal control sequence — a behavior prior
    # for sparse-gradient scenes (e.g. "drive the base toward the
    # workpiece" on mobile-manipulation tasks, where the reaching reward
    # is flat beyond ~0.4 m and undirected exploration never finds it)
    nominal_init: object = None
    # quadratic control cost per step (classic MPPI λ·uᵀΣ⁻¹u analogue):
    # biases the importance-weighted nominal toward stillness, which is
    # what success criteria of the is_robot_static family require
    ctrl_cost: float = 0.0
    # temporal noise correlation β (OU-style): ε_t = β ε_{t-1} +
    # sqrt(1-β²) ξ_t. Smooth exploration keeps the weighted nominal from
    # inheriting per-step jitter (the arm then PD-chases a quieter
    # target). 0 = white noise.
    noise_beta: float = 0.0


class MPPIState(NamedTuple):
    nominal: jnp.ndarray  # (H, A) nominal control sequence
    key: jnp.ndarray
    # hyperparameters ride the planner STATE (traced operands, not
    # trace-time constants) so retuning sigma/temperature reuses the
    # compiled solve — a remote-compile round trip costs ~an hour on the
    # tunneled TPU, a cache hit costs nothing
    sigma: jnp.ndarray = None  # (A,) exploration std
    temperature: jnp.ndarray = None  # () softmax temperature λ
    ctrl_cost: jnp.ndarray = None  # () quadratic action penalty weight
    noise_beta: jnp.ndarray = None  # () temporal noise correlation


class MPPI:
    """Sampling MPC over a maniskill_tpu env's functional core."""

    def __init__(
        self,
        env,
        config: MPPIConfig = MPPIConfig(),
        mesh: Optional[Mesh] = None,
        rollout_axis: str = "rollout",
    ):
        self.env = env
        self.config = config
        self.action_dim = env.action_dim
        self.mesh = mesh
        self.rollout_axis = rollout_axis

        cfg = config

        def rollout(env_state, controls):
            """Return of one control sequence from one start state."""

            def step(carry, a):
                st, disc = carry
                st, r, success = self.env._rollout_step(st, a)
                return (st, disc * cfg.gamma), (r * disc, success)

            (_, _), (rews, succ) = jax.lax.scan(
                step, (env_state, jnp.float32(1.0)), controls
            )
            return jnp.sum(rews), succ.any()

        def solve(planner_state: MPPIState, env_state):
            """One MPPI solve from a single env state. env_state is a
            single-env EnvState pytree."""
            key, k_noise = jax.random.split(planner_state.key)
            white = jax.random.normal(
                k_noise, (cfg.num_samples, cfg.horizon, self.action_dim)
            )
            # OU-style temporal smoothing along the horizon (β=0 -> white)
            beta = planner_state.noise_beta

            def smooth(carry, xi):
                eps = beta * carry + jnp.sqrt(1.0 - beta * beta) * xi
                return eps, eps

            _, smoothed = jax.lax.scan(
                smooth, jnp.zeros((cfg.num_samples, self.action_dim)),
                jnp.swapaxes(white, 0, 1))
            noise = (jnp.swapaxes(smoothed, 0, 1)
                     * planner_state.sigma[None, None, :])
            if self.mesh is not None:
                noise = jax.lax.with_sharding_constraint(
                    noise,
                    NamedSharding(self.mesh, P(self.rollout_axis, None, None)),
                )
            controls = jnp.clip(planner_state.nominal[None] + noise, -1.0, 1.0)
            returns, succ = jax.vmap(rollout, in_axes=(None, 0))(
                env_state, controls
            )
            # importance weights (softmax over the global rollout axis; XLA
            # inserts the cross-chip reductions when sharded). A rollout
            # that blew up (non-finite return) gets -inf weight instead of
            # poisoning the whole softmax — simulator divergence on one
            # violent sample must not kill the planner.
            returns = returns - planner_state.ctrl_cost * jnp.sum(
                controls * controls, axis=(1, 2))
            returns = jnp.where(jnp.isfinite(returns), returns, -jnp.inf)
            w = jax.nn.softmax(returns / planner_state.temperature)
            nominal = jnp.einsum("k,khA->hA", w, controls)
            info = dict(
                best_return=returns.max(),
                mean_return=returns.mean(),
                ess=1.0 / jnp.sum(w * w),
                any_success=succ.any(),
            )
            return planner_state._replace(nominal=nominal, key=key), info

        self._solve = jax.jit(solve)

        def plan_step(planner_state, env_state):
            """Receding-horizon: solve, return first action, shift nominal."""
            ps, info = solve(planner_state, env_state)
            action = ps.nominal[0]
            shifted = jnp.concatenate([ps.nominal[1:], ps.nominal[-1:]])
            return ps._replace(nominal=shifted), action, info

        self._plan_step = jax.jit(plan_step)

    def init(self, seed: int = 0) -> MPPIState:
        if self.config.nominal_init is not None:
            nom = jnp.asarray(self.config.nominal_init, jnp.float32)
            assert nom.shape == (self.config.horizon, self.action_dim), (
                nom.shape, (self.config.horizon, self.action_dim))
        else:
            nom = jnp.zeros((self.config.horizon, self.action_dim))
        sigma = jnp.broadcast_to(
            jnp.asarray(self.config.sigma, jnp.float32), (self.action_dim,))
        return MPPIState(
            nominal=nom, key=jax.random.key(seed), sigma=sigma,
            temperature=jnp.asarray(self.config.temperature, jnp.float32),
            ctrl_cost=jnp.asarray(self.config.ctrl_cost, jnp.float32),
            noise_beta=jnp.asarray(self.config.noise_beta, jnp.float32))

    def solve(self, planner_state: MPPIState, env_state):
        return self._solve(planner_state, env_state)

    def plan_step(self, planner_state: MPPIState, env_state):
        return self._plan_step(planner_state, env_state)
