"""PPO from RGB-D pixels (NatureCNN torso).

Counterpart of the reference visual PPO (``examples/baselines/ppo/
ppo_rgb.py``): same jitted rollout+GAE+clipped-surrogate loop as
ppo_jax.py, but over ``obs_mode="rgbd"`` camera observations encoded by
``maniskill_tpu.vector.NatureCNN`` (rgb + depth channels + proprio state
branch). The analytic TPU camera renders inside the same XLA program —
no host round-trips.

Usage:
  python examples/baselines/ppo/ppo_rgb_jax.py --env-id PushCube-v1 \
      --num-envs 64 --total-timesteps 200000
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from typing import NamedTuple

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "../../.."))

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax.training.train_state import TrainState

import maniskill_tpu as mst
from maniskill_tpu.vector.encoders import NatureCNN
from maniskill_tpu.envs.base_env import flatten_state_dict


class VisualActorCritic(nn.Module):
    action_dim: int
    feature_dim: int = 256

    @nn.compact
    def __call__(self, obs):
        feat = NatureCNN(feature_dim=self.feature_dim)(obs)
        a = nn.tanh(nn.Dense(256)(feat))
        a = nn.Dense(self.action_dim,
                     kernel_init=nn.initializers.orthogonal(0.01))(a)
        v = nn.tanh(nn.Dense(256)(feat))
        v = nn.Dense(1, kernel_init=nn.initializers.orthogonal(1.0))(v)
        log_std = self.param(
            "log_std", nn.initializers.constant(-0.5), (self.action_dim,)
        )
        return a, log_std, v[..., 0]


class Batch(NamedTuple):
    obs: dict
    actions: jnp.ndarray
    logp: jnp.ndarray
    advantages: jnp.ndarray
    returns: jnp.ndarray
    values: jnp.ndarray


def make_train(args):
    env = mst.make(
        args.env_id,
        num_envs=args.num_envs,
        obs_mode="rgbd",
        reward_mode="normalized_dense",
        control_mode=args.control_mode,
    )

    def conv(obs):
        """rgbd dict obs -> NatureCNN input dict (pure, jit-safe)."""
        sensor = obs["sensor_data"]
        rgb = jnp.concatenate(
            [d["rgb"] for d in sensor.values()], axis=-1)
        depth = jnp.stack(
            [d["depth"] for d in sensor.values()], axis=-1)
        state = flatten_state_dict(
            {k: v for k, v in obs.items() if k != "sensor_data"})
        return dict(rgb=rgb, depth=depth, state=state)

    obs0_raw, _ = env.reset(seed=args.seed)
    obs0 = jax.jit(conv)(obs0_raw)
    act_dim = env.action_dim

    net = VisualActorCritic(act_dim)
    key = jax.random.key(args.seed)
    key, k_init = jax.random.split(key)
    params = net.init(k_init, jax.tree.map(lambda x: x[:1], obs0))
    tx = optax.chain(optax.clip_by_global_norm(0.5),
                     optax.adam(args.lr, eps=1e-5))
    ts = TrainState.create(apply_fn=net.apply, params=params, tx=tx)

    step_env = jax.vmap(env._step_one)
    reset_env = jax.vmap(env._reset_one)

    def gaussian_logp(mean, log_std, action):
        std = jnp.exp(log_std)
        return (
            -0.5 * jnp.sum(((action - mean) / std) ** 2, -1)
            - jnp.sum(log_std)
            - 0.5 * act_dim * jnp.log(2 * jnp.pi)
        )

    @jax.jit
    def rollout_and_update(ts, env_state, obs, key):
        def env_step(carry, _):
            env_state, obs, key = carry
            key, k_act, k_reset = jax.random.split(key, 3)
            mean, log_std, value = net.apply(ts.params, obs)
            action = mean + jnp.exp(log_std) * jax.random.normal(
                k_act, mean.shape)
            logp = gaussian_logp(mean, log_std, action)
            action_c = jnp.clip(action, -1.0, 1.0)
            env_state, next_raw, reward, terminated, info = step_env(
                env_state, action_c)
            next_obs = conv(next_raw)
            truncated = env_state.elapsed_steps >= args.num_steps_per_episode
            done = terminated | truncated
            keys = jax.random.split(k_reset, args.num_envs)
            fresh_state, fresh_raw, _ = reset_env(keys)
            fresh_obs = conv(fresh_raw)
            env_state = jax.tree.map(
                lambda f, o: jnp.where(
                    done.reshape((-1,) + (1,) * (f.ndim - 1)), f, o),
                fresh_state, env_state)
            next_obs = jax.tree.map(
                lambda f, o: jnp.where(
                    done.reshape((-1,) + (1,) * (f.ndim - 1)), f, o),
                fresh_obs, next_obs)
            tr = (obs, action, logp, reward, done, value,
                  info.get("success", jnp.zeros_like(done)))
            return (env_state, next_obs, key), tr

        (env_state, obs, key), traj = jax.lax.scan(
            env_step, (env_state, obs, key), None, length=args.num_steps)
        obs_t, act_t, logp_t, rew_t, done_t, val_t, succ_t = traj

        _, _, last_val = net.apply(ts.params, obs)

        def gae_step(carry, x):
            adv, next_val = carry
            reward, done, value = x
            nonterm = 1.0 - done.astype(jnp.float32)
            delta = reward + args.gamma * next_val * nonterm - value
            adv = delta + args.gamma * args.gae_lambda * nonterm * adv
            return (adv, value), adv

        _, adv_t = jax.lax.scan(
            gae_step, (jnp.zeros(args.num_envs), last_val),
            (rew_t, done_t, val_t), reverse=True)
        ret_t = adv_t + val_t

        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        batch = Batch(
            obs=jax.tree.map(flat, obs_t),
            actions=flat(act_t),
            logp=logp_t.reshape(-1),
            advantages=adv_t.reshape(-1),
            returns=ret_t.reshape(-1),
            values=val_t.reshape(-1),
        )
        n = batch.logp.shape[0]
        mb = n // args.num_minibatches

        def epoch(carry, _):
            ts, key = carry
            key, k_perm = jax.random.split(key)
            perm = jax.random.permutation(k_perm, n)

            def minibatch(ts, idx):
                b = jax.tree.map(lambda x: x[idx], batch)

                def loss_fn(params):
                    mean, log_std, value = net.apply(params, b.obs)
                    logp = gaussian_logp(mean, log_std, b.actions)
                    entropy = jnp.sum(
                        log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e))
                    ratio = jnp.exp(logp - b.logp)
                    adv = (b.advantages - b.advantages.mean()) / (
                        b.advantages.std() + 1e-8)
                    pg = jnp.maximum(
                        -adv * ratio,
                        -adv * jnp.clip(ratio, 1 - args.clip_coef,
                                        1 + args.clip_coef)).mean()
                    v_loss = 0.5 * jnp.mean((value - b.returns) ** 2)
                    return pg + args.vf_coef * v_loss - args.ent_coef * entropy

                grads = jax.grad(loss_fn)(ts.params)
                return ts.apply_gradients(grads=grads), ()

            idxs = perm.reshape(args.num_minibatches, mb)
            ts, _ = jax.lax.scan(minibatch, ts, idxs)
            return (ts, key), ()

        (ts, key), _ = jax.lax.scan(
            epoch, (ts, key), None, length=args.update_epochs)
        stats = dict(mean_reward=rew_t.mean(), success_rate=succ_t.mean())
        return ts, env_state, obs, key, stats

    return env, ts, rollout_and_update, obs0, key


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env-id", default="PushCube-v1")
    p.add_argument("--control-mode", default="pd_joint_delta_pos")
    p.add_argument("--num-envs", type=int, default=64)
    p.add_argument("--num-steps", type=int, default=16)
    p.add_argument("--num-steps-per-episode", type=int, default=50)
    p.add_argument("--total-timesteps", type=int, default=200_000)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--gamma", type=float, default=0.8)
    p.add_argument("--gae-lambda", type=float, default=0.9)
    p.add_argument("--clip-coef", type=float, default=0.2)
    p.add_argument("--vf-coef", type=float, default=0.5)
    p.add_argument("--ent-coef", type=float, default=0.0)
    p.add_argument("--update-epochs", type=int, default=2)
    p.add_argument("--num-minibatches", type=int, default=4)
    p.add_argument("--seed", type=int, default=1)
    args = p.parse_args()

    env, ts, step_fn, obs, key = make_train(args)
    env_state = env._state
    steps_per_iter = args.num_envs * args.num_steps
    iters = args.total_timesteps // steps_per_iter
    t0 = time.time()
    for it in range(iters):
        ts, env_state, obs, key, stats = step_fn(ts, env_state, obs, key)
        if it % 5 == 0:
            sps = steps_per_iter * (it + 1) / (time.time() - t0)
            print(f"iter {it}/{iters} "
                  f"reward={float(stats['mean_reward']):.3f} "
                  f"success={float(stats['success_rate']):.3f} "
                  f"sps={sps:.0f}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
