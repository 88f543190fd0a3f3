"""Diffusion-policy baseline on maniskill_tpu trajectories (state obs).

Capability counterpart of the reference diffusion-policy baseline
(``examples/baselines/diffusion_policy``): a DDPM over ACTION CHUNKS
conditioned on the current state — train on RecordEpisode h5 demos,
evaluate by receding-horizon chunk execution. Compact MLP denoiser
(the reference uses a 1D UNet; documented deviation), jitted end to end.

Usage (after generating demos, see bc_jax.py):
  python examples/baselines/diffusion_policy/dp_jax.py \
      --env-id PushCube-v1 --dataset demos/trajectory.h5 --epochs 50
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "../../.."))

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax.training.train_state import TrainState

import maniskill_tpu as mst
from maniskill_tpu.trajectory.record import load_trajectories


class Denoiser(nn.Module):
    chunk: int
    act_dim: int

    @nn.compact
    def __call__(self, obs, noisy_chunk, t_frac):
        """Predict the noise eps given (obs, noisy action chunk, t)."""
        x = jnp.concatenate(
            [obs, noisy_chunk.reshape(*noisy_chunk.shape[:-2], -1),
             t_frac[..., None]], axis=-1)
        emb = jnp.concatenate(
            [jnp.sin(2 ** jnp.arange(6) * jnp.pi * t_frac[..., None]),
             jnp.cos(2 ** jnp.arange(6) * jnp.pi * t_frac[..., None])],
            axis=-1)
        x = jnp.concatenate([x, emb], axis=-1)
        x = nn.swish(nn.Dense(512)(x))
        x = nn.swish(nn.Dense(512)(x))
        x = nn.Dense(self.chunk * self.act_dim)(x)
        return x.reshape(*x.shape[:-1], self.chunk, self.act_dim)


def make_schedule(n_steps=16, beta_max=0.3):
    betas = jnp.linspace(1e-4, beta_max, n_steps)
    alphas = 1.0 - betas
    abar = jnp.cumprod(alphas)
    return betas, alphas, abar


def load_chunks(h5_path: str, chunk: int):
    obs_l, chunk_l = [], []
    for ep in load_trajectories(h5_path):
        acts = np.asarray(ep["actions"], np.float32)
        obs = np.asarray(ep["obs"], np.float32)[: len(acts)]
        T = len(acts)
        for t in range(T):
            idx = np.clip(np.arange(t, t + chunk), 0, T - 1)
            obs_l.append(obs[t])
            chunk_l.append(acts[idx])
    return np.stack(obs_l), np.stack(chunk_l)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env-id", default="PushCube-v1")
    p.add_argument("--dataset", required=True)
    p.add_argument("--control-mode", default="pd_ee_delta_pos")
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--chunk", type=int, default=8)
    p.add_argument("--exec-steps", type=int, default=4)
    p.add_argument("--diffusion-steps", type=int, default=16)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--eval-envs", type=int, default=16)
    p.add_argument("--eval-steps", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    obs_np, chunks_np = load_chunks(args.dataset, args.chunk)
    # standardize obs (state features mix meters/radians/velocities)
    obs_mu = obs_np.mean(0)
    obs_sd = np.maximum(obs_np.std(0), 1e-2)  # floor: dims constant in
    # the demos (noise-free recording) must not explode on eval obs
    obs_np = (obs_np - obs_mu) / obs_sd
    print(f"dataset: {len(obs_np)} chunked samples")
    act_dim = chunks_np.shape[-1]
    obs_dim = obs_np.shape[-1]

    model = Denoiser(chunk=args.chunk, act_dim=act_dim)
    key = jax.random.key(args.seed)
    key, k0 = jax.random.split(key)
    params = model.init(
        k0, jnp.zeros((1, obs_dim)), jnp.zeros((1, args.chunk, act_dim)),
        jnp.zeros((1,)),
    )
    ts = TrainState.create(apply_fn=model.apply, params=params,
                           tx=optax.adam(args.lr))
    betas, alphas, abar = make_schedule(args.diffusion_steps)

    @jax.jit
    def train_epoch(ts, key):
        n = obs_np.shape[0]
        obs_d = jnp.asarray(obs_np)
        ch_d = jnp.asarray(chunks_np)

        def step(ts, k):
            k1, k2, k3 = jax.random.split(k, 3)
            idx = jax.random.randint(k1, (args.batch_size,), 0, n)
            o, c = obs_d[idx], ch_d[idx]
            t = jax.random.randint(k2, (args.batch_size,), 0,
                                   args.diffusion_steps)
            eps = jax.random.normal(k3, c.shape)
            ab = abar[t][:, None, None]
            noisy = jnp.sqrt(ab) * c + jnp.sqrt(1 - ab) * eps

            def loss_fn(p):
                pred = model.apply(
                    p, o, noisy, t / args.diffusion_steps)
                return jnp.mean((pred - eps) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(ts.params)
            return ts.apply_gradients(grads=grads), loss

        keys = jax.random.split(key, max(n // args.batch_size, 1))
        ts, losses = jax.lax.scan(step, ts, keys)
        return ts, losses.mean()

    @jax.jit
    def sample_chunk(params, obs, key):
        """Reverse diffusion to an action chunk, batched over envs."""
        B = obs.shape[0]
        x = jax.random.normal(key, (B, args.chunk, act_dim))

        def body(x, i):
            t = args.diffusion_steps - 1 - i
            eps = model.apply(
                params, obs, x,
                jnp.full((B,), t / args.diffusion_steps))
            a, b, ab = alphas[t], betas[t], abar[t]
            mean = (x - b / jnp.sqrt(1 - ab) * eps) / jnp.sqrt(a)
            noise = jax.random.normal(
                jax.random.fold_in(key, i), x.shape)
            x = mean + jnp.where(t > 0, jnp.sqrt(b), 0.0) * noise
            return x, ()

        x, _ = jax.lax.scan(body, x, jnp.arange(args.diffusion_steps))
        return jnp.clip(x, -1, 1)

    t0 = time.time()
    for ep in range(args.epochs):
        key, k = jax.random.split(key)
        ts, loss = train_epoch(ts, k)
        if (ep + 1) % max(args.epochs // 5, 1) == 0:
            print(f"epoch {ep+1}  loss {float(loss):.5f} "
                  f"({time.time()-t0:.1f}s)", flush=True)

    # evaluation: receding-horizon chunk execution
    env = mst.make(args.env_id, num_envs=args.eval_envs,
                   control_mode=args.control_mode)
    obs, _ = env.reset(seed=123)
    success_once = np.zeros(args.eval_envs, bool)
    mu_d, sd_d = jnp.asarray(obs_mu), jnp.asarray(obs_sd)
    t = 0
    while t < args.eval_steps:
        key, k = jax.random.split(key)
        o_n = (jnp.asarray(obs) - mu_d) / sd_d
        chunk = np.asarray(sample_chunk(ts.params, o_n, k))
        for j in range(min(args.exec_steps, args.eval_steps - t)):
            obs, rew, term, trunc, info = env.step(chunk[:, j])
            success_once |= np.asarray(info["success"])
            t += 1
    print(f"eval success_once: {success_once.mean():.2f}")


if __name__ == "__main__":
    main()
