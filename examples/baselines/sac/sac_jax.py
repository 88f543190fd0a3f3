"""SAC baseline on maniskill_tpu envs (state observations).

Capability parity with the reference SAC (``examples/baselines/sac/sac.py``):
twin Q critics, tanh-squashed Gaussian actor, autotuned temperature, replay
buffer — all device-resident and jitted: the environment interaction and the
gradient updates run inside one XLA program per iteration.

Usage:
  python examples/baselines/sac/sac_jax.py --env-id PushCube-v1 --num-envs 64
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from typing import NamedTuple

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "../../.."))

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax.training.train_state import TrainState

import maniskill_tpu as mst


class Actor(nn.Module):
    action_dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.tanh(nn.Dense(256)(x))
        x = nn.tanh(nn.Dense(256)(x))
        mean = nn.Dense(self.action_dim)(x)
        log_std = nn.Dense(self.action_dim)(x)
        log_std = jnp.clip(log_std, -5.0, 2.0)
        return mean, log_std


class Critic(nn.Module):
    @nn.compact
    def __call__(self, obs, action):
        x = jnp.concatenate([obs, action], -1)
        x = nn.relu(nn.Dense(256)(x))
        x = nn.relu(nn.Dense(256)(x))
        return nn.Dense(1)(x)[..., 0]


class DoubleCritic(nn.Module):
    @nn.compact
    def __call__(self, obs, action):
        return Critic()(obs, action), Critic()(obs, action)


class Buffer(NamedTuple):
    obs: jnp.ndarray
    action: jnp.ndarray
    reward: jnp.ndarray
    next_obs: jnp.ndarray
    done: jnp.ndarray
    ptr: jnp.ndarray
    size: jnp.ndarray


def sample_squashed(params, actor, obs, key):
    mean, log_std = actor.apply(params, obs)
    std = jnp.exp(log_std)
    eps = jax.random.normal(key, mean.shape)
    pre = mean + std * eps
    a = jnp.tanh(pre)
    logp = jnp.sum(
        -0.5 * (eps**2) - log_std - 0.5 * jnp.log(2 * jnp.pi)
        - jnp.log(1 - a**2 + 1e-6),
        axis=-1,
    )
    return a, logp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env-id", default="PushCube-v1")
    p.add_argument("--num-envs", type=int, default=64)
    p.add_argument("--buffer-size", type=int, default=200_000)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--total-timesteps", type=int, default=200_000)
    p.add_argument("--gamma", type=float, default=0.9)
    p.add_argument("--tau", type=float, default=0.005)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--steps-per-iter", type=int, default=16)
    p.add_argument("--updates-per-iter", type=int, default=16)
    p.add_argument("--max-episode-steps", type=int, default=50)
    p.add_argument("--seed", type=int, default=1)
    args = p.parse_args()

    env = mst.make(args.env_id, num_envs=args.num_envs, obs_mode="state",
                   reward_mode="normalized_dense")
    obs0, _ = env.reset(seed=args.seed)
    obs_dim = obs0.shape[-1]
    act_dim = env.action_dim

    key = jax.random.key(args.seed)
    key, ka, kc = jax.random.split(key, 3)
    actor = Actor(act_dim)
    critic = DoubleCritic()
    a_params = actor.init(ka, jnp.zeros((1, obs_dim)))
    c_params = critic.init(kc, jnp.zeros((1, obs_dim)), jnp.zeros((1, act_dim)))
    a_ts = TrainState.create(apply_fn=actor.apply, params=a_params,
                             tx=optax.adam(args.lr))
    c_ts = TrainState.create(apply_fn=critic.apply, params=c_params,
                             tx=optax.adam(args.lr))
    target_c = c_params
    log_alpha = jnp.zeros(())
    alpha_opt = optax.adam(args.lr)
    alpha_state = alpha_opt.init(log_alpha)
    target_entropy = -float(act_dim)

    buf = Buffer(
        obs=jnp.zeros((args.buffer_size, obs_dim)),
        action=jnp.zeros((args.buffer_size, act_dim)),
        reward=jnp.zeros(args.buffer_size),
        next_obs=jnp.zeros((args.buffer_size, obs_dim)),
        done=jnp.zeros(args.buffer_size, dtype=bool),
        ptr=jnp.zeros((), jnp.int32),
        size=jnp.zeros((), jnp.int32),
    )

    step_env = jax.vmap(env._step_one)
    reset_env = jax.vmap(env._reset_one)

    @jax.jit
    def iteration(carry, _):
        (a_ts, c_ts, target_c, log_alpha, alpha_state, buf, env_state, obs,
         key) = carry

        # ---- collect ----
        def env_step(carry, _):
            env_state, obs, buf, key = carry
            key, k_act, k_reset = jax.random.split(key, 3)
            action, _ = sample_squashed(a_ts.params, actor, obs, k_act)
            env_state, next_obs, reward, terminated, info = step_env(
                env_state, action
            )
            truncated = env_state.elapsed_steps >= args.max_episode_steps
            done = terminated | truncated
            idx = (buf.ptr + jnp.arange(args.num_envs)) % args.buffer_size
            buf2 = buf._replace(
                obs=buf.obs.at[idx].set(obs),
                action=buf.action.at[idx].set(action),
                reward=buf.reward.at[idx].set(reward),
                next_obs=buf.next_obs.at[idx].set(next_obs),
                done=buf.done.at[idx].set(terminated),  # bootstrap on trunc
                ptr=(buf.ptr + args.num_envs) % args.buffer_size,
                size=jnp.minimum(buf.size + args.num_envs, args.buffer_size),
            )
            keys = jax.random.split(k_reset, args.num_envs)
            fresh_state, fresh_obs, _ = reset_env(keys)
            env_state = jax.tree.map(
                lambda f, o: jnp.where(
                    done.reshape((-1,) + (1,) * (f.ndim - 1)), f, o
                ),
                fresh_state, env_state,
            )
            next_obs = jnp.where(done[:, None], fresh_obs, next_obs)
            return (env_state, next_obs, buf2, key), reward.mean()

        (env_state, obs, buf, key), rews = jax.lax.scan(
            env_step, (env_state, obs, buf, key), None,
            length=args.steps_per_iter,
        )

        # ---- update ----
        def update(carry, _):
            a_ts, c_ts, target_c, log_alpha, alpha_state, key = carry
            key, k_samp, k_next, k_pi = jax.random.split(key, 4)
            idx = jax.random.randint(k_samp, (args.batch_size,), 0,
                                     jnp.maximum(buf.size, 1))
            b_obs = buf.obs[idx]
            b_act = buf.action[idx]
            b_rew = buf.reward[idx]
            b_next = buf.next_obs[idx]
            b_done = buf.done[idx]
            alpha = jnp.exp(log_alpha)

            na, nlogp = sample_squashed(a_ts.params, actor, b_next, k_next)
            q1t, q2t = critic.apply(target_c, b_next, na)
            target = b_rew + args.gamma * (1 - b_done) * (
                jnp.minimum(q1t, q2t) - alpha * nlogp
            )

            def c_loss(params):
                q1, q2 = critic.apply(params, b_obs, b_act)
                return ((q1 - target) ** 2 + (q2 - target) ** 2).mean()

            c_grads = jax.grad(c_loss)(c_ts.params)
            c_ts = c_ts.apply_gradients(grads=c_grads)

            def a_loss(params):
                a, logp = sample_squashed(params, actor, b_obs, k_pi)
                q1, q2 = critic.apply(c_ts.params, b_obs, a)
                return (alpha * logp - jnp.minimum(q1, q2)).mean(), logp

            a_grads, logp = jax.grad(a_loss, has_aux=True)(a_ts.params)
            a_ts = a_ts.apply_gradients(grads=a_grads)

            alpha_grad = jax.grad(
                lambda la: (-jnp.exp(la) * (logp + target_entropy)).mean()
            )(log_alpha)
            upd, alpha_state = alpha_opt.update(alpha_grad, alpha_state)
            log_alpha = log_alpha + upd

            target_c = jax.tree.map(
                lambda t, o: t * (1 - args.tau) + o * args.tau, target_c,
                c_ts.params,
            )
            return (a_ts, c_ts, target_c, log_alpha, alpha_state, key), None

        (a_ts, c_ts, target_c, log_alpha, alpha_state, key), _ = jax.lax.scan(
            update, (a_ts, c_ts, target_c, log_alpha, alpha_state, key), None,
            length=args.updates_per_iter,
        )
        return (
            (a_ts, c_ts, target_c, log_alpha, alpha_state, buf, env_state,
             obs, key),
            rews.mean(),
        )

    carry = (a_ts, c_ts, target_c, log_alpha, alpha_state, buf, env._state,
             obs0, key)
    steps_per_iter = args.num_envs * args.steps_per_iter
    iters = args.total_timesteps // steps_per_iter
    t0 = time.time()
    for it in range(iters):
        carry, mean_rew = iteration(carry, None)
        if it % 10 == 0:
            sps = steps_per_iter * (it + 1) / (time.time() - t0)
            print(f"iter {it}/{iters} reward={float(mean_rew):.3f} sps={sps:.0f}",
                  flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
