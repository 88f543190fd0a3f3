"""PPO baseline on maniskill_tpu envs (state observations).

Capability-parity with the reference CleanRL-style PPO
(``examples/baselines/ppo/ppo.py``): GAE, clipped surrogate, minibatch
epochs, vectorized envs with partial auto-reset (ignore_terminations-style
infinite horizon like ppo.py:201-213) — but fully jitted end-to-end in JAX:
rollout collection is a lax.scan over the batched env step, so one update
iteration is a single XLA program.

Usage:
  python examples/baselines/ppo/ppo_jax.py --env-id PushCube-v1 \
      --num-envs 256 --total-timesteps 1000000
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from functools import partial
from typing import NamedTuple

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "../../.."))

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax.training.train_state import TrainState

import maniskill_tpu as mst


class ActorCritic(nn.Module):
    action_dim: int

    @nn.compact
    def __call__(self, x):
        def mlp(out_dim, scale):
            return [
                nn.Dense(256), nn.tanh, nn.Dense(256), nn.tanh,
                nn.Dense(out_dim, kernel_init=nn.initializers.orthogonal(scale)),
            ]

        a = x
        for layer in mlp(self.action_dim, 0.01):
            a = layer(a) if not isinstance(layer, nn.Module) else layer(a)
        v = x
        for layer in mlp(1, 1.0):
            v = layer(v) if not isinstance(layer, nn.Module) else layer(v)
        log_std = self.param(
            "log_std", nn.initializers.constant(-0.5), (self.action_dim,)
        )
        return a, log_std, v[..., 0]


class Batch(NamedTuple):
    obs: jnp.ndarray
    actions: jnp.ndarray
    logp: jnp.ndarray
    advantages: jnp.ndarray
    returns: jnp.ndarray
    values: jnp.ndarray


def make_train(args):
    env = mst.make(
        args.env_id,
        num_envs=args.num_envs,
        obs_mode="state",
        reward_mode="normalized_dense",
        control_mode=args.control_mode,
    )
    obs0, _ = env.reset(seed=args.seed)
    obs_dim = obs0.shape[-1]
    act_dim = env.action_dim

    net = ActorCritic(act_dim)
    key = jax.random.key(args.seed)
    key, k_init = jax.random.split(key)
    params = net.init(k_init, jnp.zeros((1, obs_dim)))
    tx = optax.chain(
        optax.clip_by_global_norm(0.5),
        optax.adam(args.lr, eps=1e-5),
    )
    ts = TrainState.create(apply_fn=net.apply, params=params, tx=tx)

    step_env = jax.vmap(env._step_one)
    reset_env = jax.vmap(env._reset_one)

    def sample_action(params, obs, key):
        mean, log_std, value = net.apply(params, obs)
        std = jnp.exp(log_std)
        noise = jax.random.normal(key, mean.shape)
        action = mean + std * noise
        logp = (
            -0.5 * jnp.sum(((action - mean) / std) ** 2, -1)
            - jnp.sum(log_std)
            - 0.5 * act_dim * jnp.log(2 * jnp.pi)
        )
        return action, logp, value

    def logp_entropy(params, obs, action):
        mean, log_std, value = net.apply(params, obs)
        std = jnp.exp(log_std)
        logp = (
            -0.5 * jnp.sum(((action - mean) / std) ** 2, -1)
            - jnp.sum(log_std)
            - 0.5 * act_dim * jnp.log(2 * jnp.pi)
        )
        entropy = jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e))
        return logp, entropy, value

    @jax.jit
    def rollout_and_update(ts, env_state, obs, key):
        # ---- collect ----
        def env_step(carry, _):
            env_state, obs, key = carry
            key, k_act, k_reset = jax.random.split(key, 3)
            action, logp, value = sample_action(ts.params, obs, k_act)
            action_c = jnp.clip(action, -1.0, 1.0)
            env_state, next_obs, reward, terminated, info = step_env(
                env_state, action_c
            )
            truncated = env_state.elapsed_steps >= args.num_steps_per_episode
            done = terminated | truncated
            # partial auto-reset (infinite-horizon PPO like the reference)
            keys = jax.random.split(k_reset, args.num_envs)
            fresh_state, fresh_obs, _ = reset_env(keys)
            env_state = jax.tree.map(
                lambda f, o: jnp.where(
                    done.reshape((-1,) + (1,) * (f.ndim - 1)), f, o
                ),
                fresh_state,
                env_state,
            )
            next_obs = jnp.where(done[:, None], fresh_obs, next_obs)
            transition = (obs, action, logp, reward, done, value,
                          info.get("success", jnp.zeros_like(done)))
            return (env_state, next_obs, key), transition

        (env_state, obs, key), traj = jax.lax.scan(
            env_step, (env_state, obs, key), None, length=args.num_steps
        )
        obs_t, act_t, logp_t, rew_t, done_t, val_t, succ_t = traj

        # ---- GAE ----
        _, _, last_val = net.apply(ts.params, obs)

        def gae_step(carry, x):
            adv, next_val = carry
            reward, done, value = x
            nonterm = 1.0 - done.astype(jnp.float32)
            delta = reward + args.gamma * next_val * nonterm - value
            adv = delta + args.gamma * args.gae_lambda * nonterm * adv
            return (adv, value), adv

        _, adv_t = jax.lax.scan(
            gae_step,
            (jnp.zeros(args.num_envs), last_val),
            (rew_t, done_t, val_t),
            reverse=True,
        )
        ret_t = adv_t + val_t

        batch = Batch(
            obs=obs_t.reshape(-1, obs_dim),
            actions=act_t.reshape(-1, act_dim),
            logp=logp_t.reshape(-1),
            advantages=adv_t.reshape(-1),
            returns=ret_t.reshape(-1),
            values=val_t.reshape(-1),
        )

        # ---- update ----
        n = batch.obs.shape[0]
        mb = n // args.num_minibatches

        def epoch(carry, _):
            ts, key = carry
            key, k_perm = jax.random.split(key)
            perm = jax.random.permutation(k_perm, n)

            def minibatch(ts, idx):
                b = jax.tree.map(lambda x: x[idx], batch)

                def loss_fn(params):
                    logp, entropy, value = logp_entropy(params, b.obs, b.actions)
                    ratio = jnp.exp(logp - b.logp)
                    adv = (b.advantages - b.advantages.mean()) / (
                        b.advantages.std() + 1e-8
                    )
                    pg1 = -adv * ratio
                    pg2 = -adv * jnp.clip(
                        ratio, 1 - args.clip_coef, 1 + args.clip_coef
                    )
                    pg_loss = jnp.maximum(pg1, pg2).mean()
                    v_loss = 0.5 * jnp.mean((value - b.returns) ** 2)
                    return (
                        pg_loss
                        + args.vf_coef * v_loss
                        - args.ent_coef * entropy
                    ), (pg_loss, v_loss)

                grads, aux = jax.grad(loss_fn, has_aux=True)(ts.params)
                return ts.apply_gradients(grads=grads), aux

            idxs = perm.reshape(args.num_minibatches, mb)
            ts, aux = jax.lax.scan(minibatch, ts, idxs)
            return (ts, key), aux

        (ts, key), _ = jax.lax.scan(
            epoch, (ts, key), None, length=args.update_epochs
        )
        stats = dict(
            mean_reward=rew_t.mean(),
            success_rate=succ_t.mean(),
            mean_value=val_t.mean(),
        )
        return ts, env_state, obs, key, stats

    return env, ts, rollout_and_update, obs0, key


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env-id", default="PushCube-v1")
    p.add_argument("--control-mode", default="pd_joint_delta_pos")
    p.add_argument("--num-envs", type=int, default=128)
    p.add_argument("--num-steps", type=int, default=32)
    p.add_argument("--num-steps-per-episode", type=int, default=50)
    p.add_argument("--total-timesteps", type=int, default=500_000)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--gamma", type=float, default=0.8)
    p.add_argument("--gae-lambda", type=float, default=0.9)
    p.add_argument("--clip-coef", type=float, default=0.2)
    p.add_argument("--vf-coef", type=float, default=0.5)
    p.add_argument("--ent-coef", type=float, default=0.0)
    p.add_argument("--update-epochs", type=int, default=4)
    p.add_argument("--num-minibatches", type=int, default=8)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--out-json", default=None,
                   help="write a training-evidence artifact (final stats, "
                        "curve samples, steps/s)")
    args = p.parse_args()

    env, ts, step_fn, obs, key = make_train(args)
    env_state = env._state
    steps_per_iter = args.num_envs * args.num_steps
    iters = args.total_timesteps // steps_per_iter
    t0 = time.time()
    curve = []
    stats = None
    for it in range(iters):
        ts, env_state, obs, key, stats = step_fn(ts, env_state, obs, key)
        if it % 10 == 0:
            sps = steps_per_iter * (it + 1) / (time.time() - t0)
            print(
                f"iter {it}/{iters} reward={float(stats['mean_reward']):.3f} "
                f"success={float(stats['success_rate']):.3f} sps={sps:.0f}",
                flush=True,
            )
            curve.append(dict(
                env_steps=steps_per_iter * (it + 1),
                mean_reward=round(float(stats["mean_reward"]), 4),
                success_rate=round(float(stats["success_rate"]), 4),
            ))
    wall = time.time() - t0
    print("done", flush=True)
    if args.out_json and stats is not None:
        import json

        import jax as _jax

        payload = dict(
            env_id=args.env_id,
            num_envs=args.num_envs,
            total_timesteps=steps_per_iter * iters,
            wall_s=round(wall, 1),
            env_steps_per_s=round(steps_per_iter * iters / wall, 1),
            platform=_jax.devices()[0].platform,
            final_success_rate=round(float(stats["success_rate"]), 4),
            final_mean_reward=round(float(stats["mean_reward"]), 4),
            curve=curve,
        )
        with open(args.out_json, "w") as f:
            json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
