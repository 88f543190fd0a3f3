"""ACT-style baseline (Action Chunking with a CVAE).

Counterpart of the reference ACT baseline (``examples/baselines/act``,
Zhao et al. 2023): a conditional VAE over ACTION CHUNKS — a training-time
encoder infers a style latent z from (obs, chunk); the decoder predicts
the chunk from (obs, z); at eval z = 0 and chunks execute receding-
horizon with temporal ensembling. Compact MLP encoder/decoder (the
reference uses transformers over image tokens; documented deviation —
state obs here), jitted end to end.

Usage (after generating demos, see bc_jax.py):
  python examples/baselines/act/act_jax.py --env-id PushCube-v1 \
      --dataset demos/trajectory.h5 --epochs 200
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


class CVAE(nn.Module):
    chunk: int
    act_dim: int
    z_dim: int = 32

    def setup(self):
        def mlp(out):
            return nn.Sequential(
                [nn.Dense(512), nn.relu, nn.Dense(512), nn.relu,
                 nn.Dense(out)])

        self.enc = mlp(2 * self.z_dim)
        self.dec = mlp(self.chunk * self.act_dim)

    def encode(self, obs, chunk):
        h = self.enc(jnp.concatenate(
            [obs, chunk.reshape(*chunk.shape[:-2], -1)], -1))
        mu, logvar = jnp.split(h, 2, axis=-1)
        return mu, logvar

    def decode(self, obs, z):
        out = self.dec(jnp.concatenate([obs, z], -1))
        return out.reshape(*out.shape[:-1], self.chunk, self.act_dim)

    def __call__(self, obs, chunk, z):
        mu, lv = self.encode(obs, chunk)
        return self.decode(obs, z), mu, lv


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
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--chunk", type=int, default=8)
    p.add_argument("--kl-weight", type=float, default=10.0)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--eval-envs", type=int, default=16)
    p.add_argument("--eval-steps", type=int, default=50)
    p.add_argument("--ensemble-k", type=float, default=0.1,
                   help="temporal-ensembling exponential weight")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    obs_np, chunks_np = load_chunks(args.dataset, args.chunk)
    obs_mu = obs_np.mean(0)
    obs_sd = np.maximum(obs_np.std(0), 1e-2)  # floor: dims constant in
    # the demos (noise-free recording) must not explode on eval obs
    obs_np = (obs_np - obs_mu) / obs_sd
    print(f"dataset: {len(obs_np)} chunked samples")
    act_dim = chunks_np.shape[-1]
    obs_dim = obs_np.shape[-1]

    model = CVAE(chunk=args.chunk, act_dim=act_dim)
    key = jax.random.key(args.seed)
    key, k0 = jax.random.split(key)
    params = model.init(
        k0, jnp.zeros((1, obs_dim)), jnp.zeros((1, args.chunk, act_dim)),
        jnp.zeros((1, 32)))
    ts = TrainState.create(apply_fn=model.apply, params=params,
                           tx=optax.adam(args.lr))
    n = len(obs_np)
    obs_d = jnp.asarray(obs_np)
    ch_d = jnp.asarray(chunks_np)

    @jax.jit
    def train_epoch(ts, key):
        def step(ts, k):
            k1, k2 = jax.random.split(k)
            idx = jax.random.randint(k1, (args.batch_size,), 0, n)
            o, c = obs_d[idx], ch_d[idx]

            def loss_fn(p):
                mu, lv = model.apply(p, o, c, method=CVAE.encode)
                z = mu + jnp.exp(0.5 * lv) * jax.random.normal(k2, mu.shape)
                pred = model.apply(p, o, z, method=CVAE.decode)
                rec = jnp.mean(jnp.abs(pred - c))  # L1 like the reference
                kl = -0.5 * jnp.mean(1 + lv - mu**2 - jnp.exp(lv))
                return rec + args.kl_weight * kl, (rec, kl)

            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(ts.params)
            return ts.apply_gradients(grads=grads), loss

        keys = jax.random.split(key, max(n // args.batch_size, 1))
        ts, losses = jax.lax.scan(step, ts, keys)
        return ts, losses.mean()

    t0 = time.time()
    for ep in range(args.epochs):
        key, k = jax.random.split(key)
        ts, loss = train_epoch(ts, k)
        if (ep + 1) % max(args.epochs // 5, 1) == 0:
            print(f"epoch {ep+1}  loss {float(loss):.5f} "
                  f"({time.time()-t0:.1f}s)", flush=True)

    # ---- eval: receding-horizon with temporal ensembling ----
    env = mst.make(args.env_id, num_envs=args.eval_envs,
                   control_mode=args.control_mode)
    obs, _ = env.reset(seed=123)
    mu_d, sd_d = jnp.asarray(obs_mu), jnp.asarray(obs_sd)

    @jax.jit
    def predict(params, obs):
        o = (obs - mu_d) / sd_d
        z = jnp.zeros((o.shape[0], 32))
        return model.apply(params, o, z, method=CVAE.decode)

    B = args.eval_envs
    pending = np.zeros((B, args.chunk, act_dim), np.float32)
    weights = np.zeros((B, args.chunk), np.float32)
    success_once = np.zeros(B, bool)
    for t in range(args.eval_steps):
        chunk = np.asarray(predict(ts.params, jnp.asarray(obs)))
        # temporal ensembling: exponential-weighted average over chunks
        pending = np.concatenate(
            [pending[:, 1:], np.zeros((B, 1, act_dim), np.float32)], 1)
        weights = np.concatenate(
            [weights[:, 1:], np.zeros((B, 1), np.float32)], 1)
        w_new = np.exp(-args.ensemble_k * np.arange(args.chunk)
                       ).astype(np.float32)
        pending += chunk * w_new[None, :, None]
        weights += w_new[None]
        a = pending[:, 0] / np.maximum(weights[:, 0:1], 1e-8)
        obs, rew, term, trunc, info = env.step(np.clip(a, -1, 1))
        success_once |= np.asarray(info["success"])
    print(f"eval success_once: {success_once.mean():.2f}")


if __name__ == "__main__":
    main()
