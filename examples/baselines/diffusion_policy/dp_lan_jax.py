"""Language-conditioned diffusion policy (the fork's flagship baseline).

Capability counterpart of the fork's ``train_rgbd_lan.py`` (language-
conditioned diffusion policy with a SigLIP text encoder over
``get_language_instruction``): a DDPM over action chunks conditioned on
state features AND an embedded natural-language instruction, trained on
demos from MULTIPLE tasks at once — the instruction is what
disambiguates which behavior to produce. Text encoding is a trainable
bag-of-token-hash embedding (documented stand-in for SigLIP: pretrained
language towers are download-only; the conditioning plumbing — tokenize,
embed, concatenate into the denoiser — is identical).

Usage (multi-task; each dataset paired with its env id):
  python examples/baselines/diffusion_policy/dp_lan_jax.py \
      --datasets demos/push.h5 demos/pick.h5 \
      --env-ids PushCube-v1 PickCube-v1 --epochs 50
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

VOCAB = 512
MAX_TOKENS = 12


def tokenize(text: str) -> np.ndarray:
    """Hash whitespace tokens into a fixed-width id sequence (0 = pad)."""
    ids = [1 + (hash(w.lower()) % (VOCAB - 1)) for w in text.split()]
    ids = ids[:MAX_TOKENS]
    return np.array(ids + [0] * (MAX_TOKENS - len(ids)), np.int32)


def default_instruction(env_id: str) -> str:
    env = mst.make(env_id, num_envs=1, obs_mode="none")
    lang = env.get_language_instruction()
    if lang:
        return lang[0]
    # tasks without an explicit instruction: derive one from the id
    return env_id.split("-")[0].replace("_", " ").lower()


class TextEncoder(nn.Module):
    dim: int = 64

    @nn.compact
    def __call__(self, tokens):  # (B, T) int
        emb = nn.Embed(VOCAB, self.dim)(tokens)          # (B, T, D)
        mask = (tokens > 0)[..., None].astype(jnp.float32)
        pooled = (emb * mask).sum(-2) / jnp.maximum(mask.sum(-2), 1.0)
        return nn.tanh(nn.Dense(self.dim)(pooled))


class LanDenoiser(nn.Module):
    chunk: int
    act_dim: int

    @nn.compact
    def __call__(self, obs, tokens, noisy_chunk, t_frac):
        lang = TextEncoder()(tokens)
        x = jnp.concatenate(
            [obs, lang, noisy_chunk.reshape(*noisy_chunk.shape[:-2], -1),
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--datasets", nargs="+", required=True)
    p.add_argument("--env-ids", nargs="+", required=True)
    p.add_argument("--chunk", type=int, default=8)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--n-diffusion-steps", type=int, default=16)
    p.add_argument("--eval-episodes", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--control-mode", default="pd_ee_delta_pos",
                   help="must match the demos' control mode")
    args = p.parse_args()
    assert len(args.datasets) == len(args.env_ids)

    # ---- load multi-task demos, tag each window with its instruction ----
    obs_w, act_w, tok_w = [], [], []
    for path, env_id in zip(args.datasets, args.env_ids):
        toks = tokenize(default_instruction(env_id))
        for ep in load_trajectories(path):
            obs = np.asarray(ep["obs"], np.float32)       # (T+1, D)
            acts = np.asarray(ep["actions"], np.float32)  # (T, A)
            T = len(acts)
            for t in range(T):
                idx = np.minimum(np.arange(t, t + args.chunk), T - 1)
                obs_w.append(obs[t])
                act_w.append(acts[idx])
                tok_w.append(toks)
    # tasks have different obs widths: zero-pad to the max (the language
    # embedding tells the policy which layout it is seeing)
    obs_dim = max(o.shape[-1] for o in obs_w)
    obs_w = [np.pad(o, (0, obs_dim - o.shape[-1])) for o in obs_w]
    obs_w = jnp.asarray(np.stack(obs_w))
    act_w = jnp.asarray(np.stack(act_w))
    tok_w = jnp.asarray(np.stack(tok_w))
    act_dim = act_w.shape[-1]
    n = len(obs_w)
    print(f"{n} windows from {len(args.datasets)} tasks, obs {obs_dim}, "
          f"act {act_dim}", flush=True)

    # per-dim standardization with a sigma floor (constant dims explode
    # standardized eval obs otherwise)
    mu, sig = obs_w.mean(0), jnp.maximum(obs_w.std(0), 1e-2)
    obs_w = (obs_w - mu) / sig

    net = LanDenoiser(args.chunk, act_dim)
    key = jax.random.key(args.seed)
    key, k_init = jax.random.split(key)
    params = net.init(k_init, obs_w[:1], tok_w[:1], act_w[:1],
                      jnp.zeros((1,)))
    ts = TrainState.create(apply_fn=net.apply, params=params,
                           tx=optax.adam(args.lr))
    betas, alphas, abar = make_schedule(args.n_diffusion_steps)

    @jax.jit
    def epoch(ts, key):
        def batch_step(ts, k):
            k1, k2, k3 = jax.random.split(k, 3)
            idx = jax.random.randint(k1, (args.batch_size,), 0, n)
            t = jax.random.randint(k2, (args.batch_size,), 0,
                                   args.n_diffusion_steps)
            eps = jax.random.normal(k3, (args.batch_size, args.chunk,
                                         act_dim))
            a0 = act_w[idx]
            at = (jnp.sqrt(abar[t])[:, None, None] * a0
                  + jnp.sqrt(1 - abar[t])[:, None, None] * eps)

            def loss_fn(p):
                pred = net.apply(p, obs_w[idx], tok_w[idx], at,
                                 t / args.n_diffusion_steps)
                return ((pred - eps) ** 2).mean()

            loss, grads = jax.value_and_grad(loss_fn)(ts.params)
            return ts.apply_gradients(grads=grads), loss

        keys = jax.random.split(key, max(n // args.batch_size, 1))
        ts, losses = jax.lax.scan(batch_step, ts, keys)
        return ts, losses.mean()

    t0 = time.time()
    for ep_i in range(args.epochs):
        key, k = jax.random.split(key)
        ts, loss = epoch(ts, k)
        if ep_i % 10 == 0:
            print(f"epoch {ep_i} loss={float(loss):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    # ---- evaluation: language selects the behavior ----
    def sample_chunk(params, obs, toks, key):
        x = jax.random.normal(key, (obs.shape[0], args.chunk, act_dim))
        for t in reversed(range(args.n_diffusion_steps)):
            tf = jnp.full((obs.shape[0],), t / args.n_diffusion_steps)
            eps = net.apply(params, obs, toks, x, tf)
            x = (x - betas[t] / jnp.sqrt(1 - abar[t]) * eps) / jnp.sqrt(
                alphas[t])
            if t > 0:
                key, k = jax.random.split(key)
                x = x + jnp.sqrt(betas[t]) * jax.random.normal(k, x.shape)
        return jnp.clip(x, -1, 1)

    for env_id in args.env_ids:
        env = mst.make(env_id, num_envs=args.eval_episodes,
                       obs_mode="state", control_mode=args.control_mode)
        toks = jnp.tile(jnp.asarray(tokenize(default_instruction(env_id))),
                        (args.eval_episodes, 1))
        obs, _ = env.reset(seed=args.seed)
        succ = np.zeros(args.eval_episodes, bool)
        key_e = jax.random.key(100)
        steps = env.max_episode_steps or 50
        for t0_ in range(0, steps, args.chunk):
            key_e, k = jax.random.split(key_e)
            o = np.asarray(obs)
            o = np.pad(o, ((0, 0), (0, obs_dim - o.shape[-1])))
            o = (jnp.asarray(o) - mu) / sig
            chunk = sample_chunk(ts.params, o, toks, k)
            for j in range(args.chunk):
                obs, rew, term, trunc, info = env.step(
                    np.asarray(chunk[:, j]))
                succ |= np.asarray(info["success"])
        print(f"EVAL {env_id}: success {succ.mean():.2f}", flush=True)


if __name__ == "__main__":
    main()
