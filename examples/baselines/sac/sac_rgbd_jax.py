"""SAC from RGB-D pixels on maniskill_tpu envs.

Capability parity with the reference ``examples/baselines/sac/sac_rgbd.py``:
twin Q critics and a tanh-Gaussian actor over NatureCNN features of the
in-program rendered rgb+depth observation (plus proprioceptive state), with
the encoder trained by the critic loss only (the actor takes
stop-gradient features, the reference's shared-encoder convention).
Replay stores uint8 rgb / float16 depth at half resolution to bound
memory; everything — rendering, interaction, updates — is jitted.

Usage:
  python examples/baselines/sac/sac_rgbd_jax.py --env-id PushCube-v1 \
      --num-envs 32 --total-timesteps 100000
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
from maniskill_tpu.envs.base_env import flatten_state_dict
from maniskill_tpu.vector.encoders import NatureCNN


class Heads(nn.Module):
    """Actor + twin critics over shared visual features."""

    action_dim: int

    def setup(self):
        self.encoder = NatureCNN(feature_dim=256)
        self.actor_mlp = nn.Sequential(
            [nn.Dense(256), nn.tanh, nn.Dense(256), nn.tanh])
        self.mean = nn.Dense(self.action_dim)
        self.log_std = nn.Dense(self.action_dim)
        self.q1 = nn.Sequential([nn.Dense(256), nn.relu, nn.Dense(256),
                                 nn.relu, nn.Dense(1)])
        self.q2 = nn.Sequential([nn.Dense(256), nn.relu, nn.Dense(256),
                                 nn.relu, nn.Dense(1)])

    def features(self, obs):
        return self.encoder(obs)

    def pi(self, obs):
        # actor sees stop-gradient features (encoder belongs to the critic)
        f = jax.lax.stop_gradient(self.encoder(obs))
        h = self.actor_mlp(f)
        return self.mean(h), jnp.clip(self.log_std(h), -5.0, 2.0)

    def q(self, obs, action):
        f = self.encoder(obs)
        x = jnp.concatenate([f, action], -1)
        return self.q1(x)[..., 0], self.q2(x)[..., 0]

    def __call__(self, obs, action):
        return self.pi(obs), self.q(obs, action)


class Buffer(NamedTuple):
    rgb: jnp.ndarray       # (N, H, W, 3) uint8
    depth: jnp.ndarray     # (N, H, W, 1) f16
    state: jnp.ndarray
    action: jnp.ndarray
    reward: jnp.ndarray
    next_rgb: jnp.ndarray
    next_depth: jnp.ndarray
    next_state: jnp.ndarray
    done: jnp.ndarray
    ptr: jnp.ndarray
    size: jnp.ndarray


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env-id", default="PushCube-v1")
    p.add_argument("--num-envs", type=int, default=32)
    p.add_argument("--buffer-size", type=int, default=10_000)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--total-timesteps", type=int, default=100_000)
    p.add_argument("--gamma", type=float, default=0.9)
    p.add_argument("--tau", type=float, default=0.005)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--steps-per-iter", type=int, default=8)
    p.add_argument("--updates-per-iter", type=int, default=8)
    p.add_argument("--max-episode-steps", type=int, default=50)
    p.add_argument("--seed", type=int, default=1)
    args = p.parse_args()

    env = mst.make(args.env_id, num_envs=args.num_envs, obs_mode="rgbd",
                   reward_mode="normalized_dense")

    def conv(obs):
        """rgbd dict obs -> buffer-sized NatureCNN input (half-res)."""
        sensor = obs["sensor_data"]
        rgb = jnp.concatenate([d["rgb"] for d in sensor.values()], -1)
        depth = jnp.stack(
            [d["depth"].astype(jnp.float32) / 1000.0
             for d in sensor.values()], -1)
        state = flatten_state_dict(
            {k: v for k, v in obs.items() if k != "sensor_data"})
        return dict(rgb=rgb[:, ::2, ::2], depth=depth[:, ::2, ::2],
                    state=state)

    obs0_raw, _ = env.reset(seed=args.seed)
    obs0 = jax.jit(conv)(obs0_raw)
    H, W = obs0["rgb"].shape[1:3]
    state_dim = obs0["state"].shape[-1]
    act_dim = env.action_dim

    key = jax.random.key(args.seed)
    key, k_init = jax.random.split(key)
    net = Heads(act_dim)
    one = jax.tree.map(lambda x: x[:1], obs0)
    params = net.init(k_init, one, jnp.zeros((1, act_dim)))
    ts = TrainState.create(apply_fn=net.apply, params=params,
                           tx=optax.adam(args.lr))
    target = params
    log_alpha = jnp.zeros(())
    alpha_opt = optax.adam(args.lr)
    alpha_state = alpha_opt.init(log_alpha)
    target_entropy = -float(act_dim)

    B = args.buffer_size
    buf = Buffer(
        rgb=jnp.zeros((B, H, W, obs0["rgb"].shape[-1]), jnp.uint8),
        depth=jnp.zeros((B, H, W, obs0["depth"].shape[-1]), jnp.float16),
        state=jnp.zeros((B, state_dim)),
        action=jnp.zeros((B, act_dim)),
        reward=jnp.zeros(B),
        next_rgb=jnp.zeros((B, H, W, obs0["rgb"].shape[-1]), jnp.uint8),
        next_depth=jnp.zeros((B, H, W, obs0["depth"].shape[-1]), jnp.float16),
        next_state=jnp.zeros((B, state_dim)),
        done=jnp.zeros(B, bool),
        ptr=jnp.zeros((), jnp.int32),
        size=jnp.zeros((), jnp.int32),
    )

    step_env = jax.vmap(env._step_one)
    reset_env = jax.vmap(env._reset_one)

    def sample_pi(params, obs, key):
        mean, log_std = net.apply(params, obs, method=Heads.pi)
        std = jnp.exp(log_std)
        eps = jax.random.normal(key, mean.shape)
        a = jnp.tanh(mean + std * eps)
        logp = jnp.sum(
            -0.5 * eps**2 - log_std - 0.5 * jnp.log(2 * jnp.pi)
            - jnp.log(1 - a**2 + 1e-6), -1)
        return a, logp

    def obs_of(rgb, depth, state):
        return dict(rgb=rgb.astype(jnp.float32),
                    depth=depth.astype(jnp.float32), state=state)

    @jax.jit
    def iteration(carry, _):
        ts, target, log_alpha, alpha_state, buf, env_state, obs, key = carry

        def env_step(carry, _):
            env_state, obs, buf, key = carry
            key, k_act, k_reset = jax.random.split(key, 3)
            action, _ = sample_pi(ts.params, obs, k_act)
            env_state, raw, reward, terminated, info = step_env(
                env_state, action)
            next_obs = conv(raw)
            truncated = env_state.elapsed_steps >= args.max_episode_steps
            done = terminated | truncated
            idx = (buf.ptr + jnp.arange(args.num_envs)) % B
            buf2 = buf._replace(
                rgb=buf.rgb.at[idx].set(obs["rgb"].astype(jnp.uint8)),
                depth=buf.depth.at[idx].set(obs["depth"].astype(jnp.float16)),
                state=buf.state.at[idx].set(obs["state"]),
                action=buf.action.at[idx].set(action),
                reward=buf.reward.at[idx].set(reward),
                next_rgb=buf.next_rgb.at[idx].set(
                    next_obs["rgb"].astype(jnp.uint8)),
                next_depth=buf.next_depth.at[idx].set(
                    next_obs["depth"].astype(jnp.float16)),
                next_state=buf.next_state.at[idx].set(next_obs["state"]),
                done=buf.done.at[idx].set(terminated),
                ptr=(buf.ptr + args.num_envs) % B,
                size=jnp.minimum(buf.size + args.num_envs, B),
            )
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
            return (env_state, next_obs, buf2, key), reward.mean()

        (env_state, obs, buf, key), rews = jax.lax.scan(
            env_step, (env_state, obs, buf, key), None,
            length=args.steps_per_iter)

        def update(carry, _):
            ts, target, log_alpha, alpha_state, key = carry
            key, k_samp, k_next, k_pi = jax.random.split(key, 4)
            idx = jax.random.randint(k_samp, (args.batch_size,), 0,
                                     jnp.maximum(buf.size, 1))
            b = obs_of(buf.rgb[idx], buf.depth[idx], buf.state[idx])
            bn = obs_of(buf.next_rgb[idx], buf.next_depth[idx],
                        buf.next_state[idx])
            alpha = jnp.exp(log_alpha)

            na, nlogp = sample_pi(ts.params, bn, k_next)
            q1t, q2t = net.apply(target, bn, na, method=Heads.q)
            y = buf.reward[idx] + args.gamma * (1 - buf.done[idx]) * (
                jnp.minimum(q1t, q2t) - alpha * nlogp)

            def loss_fn(params):
                q1, q2 = net.apply(params, b, buf.action[idx],
                                   method=Heads.q)
                c_loss = ((q1 - y) ** 2 + (q2 - y) ** 2).mean()
                a, logp = sample_pi(params, b, k_pi)
                q1p, q2p = net.apply(jax.lax.stop_gradient(params), b, a,
                                     method=Heads.q)
                a_loss = (alpha * logp - jnp.minimum(q1p, q2p)).mean()
                return c_loss + a_loss, logp

            grads, logp = jax.grad(loss_fn, has_aux=True)(ts.params)
            ts = ts.apply_gradients(grads=grads)
            alpha_grad = jax.grad(
                lambda la: (-jnp.exp(la) * (logp + target_entropy)).mean()
            )(log_alpha)
            upd, alpha_state = alpha_opt.update(alpha_grad, alpha_state)
            log_alpha = log_alpha + upd
            target = jax.tree.map(
                lambda t, o: t * (1 - args.tau) + o * args.tau, target,
                ts.params)
            return (ts, target, log_alpha, alpha_state, key), None

        (ts, target, log_alpha, alpha_state, key), _ = jax.lax.scan(
            update, (ts, target, log_alpha, alpha_state, key), None,
            length=args.updates_per_iter)
        return (ts, target, log_alpha, alpha_state, buf, env_state, obs,
                key), rews.mean()

    carry = (ts, target, log_alpha, alpha_state, buf, env._state, obs0, key)
    steps_per_iter = args.num_envs * args.steps_per_iter
    iters = max(args.total_timesteps // steps_per_iter, 1)
    t0 = time.time()
    for it in range(iters):
        carry, mean_rew = iteration(carry, None)
        if it % 5 == 0:
            sps = steps_per_iter * (it + 1) / (time.time() - t0)
            print(f"iter {it}/{iters} reward={float(mean_rew):.3f} "
                  f"sps={sps:.0f}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
