"""Behavior-cloning baseline on maniskill_tpu trajectories (state obs).

Capability-parity with the reference BC baseline (``examples/baselines/bc``):
an MLP policy regressed onto demonstration actions with MSE loss, trained
from a RecordEpisode h5 file (the same trajectory format replay/dataset
consume), then evaluated on the batched env. Fully jitted: one epoch is a
``lax.scan`` over minibatches.

Generate demos first, e.g.:
  python -m maniskill_tpu.examples.motionplanning.run -e PickCube-v1 -n 16 \
      --traj-dir demos/
Then:
  python examples/baselines/bc/bc_jax.py --env-id PickCube-v1 \
      --dataset demos/trajectory.h5 --epochs 100 \
      --control-mode pd_ee_delta_pos
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "../../.."))

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax.training.train_state import TrainState

import maniskill_tpu as mst
from maniskill_tpu.trajectory.record import load_trajectories


class Policy(nn.Module):
    action_dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.tanh(nn.Dense(256)(x))
        x = nn.tanh(nn.Dense(256)(x))
        return nn.Dense(
            self.action_dim, kernel_init=nn.initializers.orthogonal(0.01)
        )(x)


def load_transitions(h5_path: str):
    """Flatten episodes into (obs, action) pairs. Episodes store obs[T+1]
    and actions[T]; pair obs[t] -> actions[t]."""
    obs_list, act_list = [], []
    for ep in load_trajectories(h5_path):
        acts = np.asarray(ep["actions"], np.float32)
        obs = ep["obs"]
        assert not isinstance(obs, dict), (
            "BC baseline consumes flat state obs; record with obs_mode='state'"
        )
        obs = np.asarray(obs, np.float32)
        obs_list.append(obs[: len(acts)])
        act_list.append(acts)
    return np.concatenate(obs_list), np.concatenate(act_list)


def train(args):
    obs, acts = load_transitions(args.dataset)
    n, obs_dim = obs.shape
    action_dim = acts.shape[-1]
    print(f"dataset: {n} transitions, obs_dim={obs_dim}, action_dim={action_dim}")

    rng = jax.random.key(args.seed)
    rng, init_key = jax.random.split(rng)
    policy = Policy(action_dim)
    ts = TrainState.create(
        apply_fn=policy.apply,
        params=policy.init(init_key, jnp.zeros((1, obs_dim))),
        tx=optax.adam(args.lr),
    )

    bs = min(args.batch_size, n)
    nb = max(1, n // bs)
    used = nb * bs

    @jax.jit
    def epoch(ts, key):
        perm = jax.random.permutation(key, n)[:used].reshape(nb, bs)

        def mb(ts, idx):
            def loss_fn(params):
                pred = ts.apply_fn(params, jnp.asarray(obs)[idx])
                return jnp.mean((pred - jnp.asarray(acts)[idx]) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(ts.params)
            return ts.apply_gradients(grads=grads), loss

        ts, losses = jax.lax.scan(mb, ts, perm)
        return ts, losses.mean()

    t0 = time.time()
    for ep in range(args.epochs):
        rng, key = jax.random.split(rng)
        ts, loss = epoch(ts, key)
        if (ep + 1) % max(1, args.epochs // 10) == 0:
            print(f"epoch {ep + 1}/{args.epochs} loss={float(loss):.5f} "
                  f"({time.time() - t0:.1f}s)")
    return ts, policy


def evaluate(args, ts, policy):
    env = mst.make(args.env_id, num_envs=args.eval_envs,
                   control_mode=args.control_mode)
    obs, _ = env.reset(seed=args.seed + 1)
    success = np.zeros(args.eval_envs, bool)
    for _ in range(args.eval_steps):
        act = ts.apply_fn(ts.params, jnp.asarray(obs))
        obs, _, term, trunc, info = env.step(act)
        if "success" in info:
            success |= np.asarray(info["success"])
    rate = success.mean()
    print(f"eval success_once: {rate:.2%} over {args.eval_envs} envs")
    return rate


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env-id", default="PickCube-v1")
    p.add_argument("--dataset", required=True)
    p.add_argument("--control-mode", default="pd_joint_delta_pos")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval-envs", type=int, default=16)
    p.add_argument("--eval-steps", type=int, default=100)
    p.add_argument("--no-eval", action="store_true")
    args = p.parse_args()

    ts, policy = train(args)
    if not args.no_eval:
        evaluate(args, ts, policy)


if __name__ == "__main__":
    main()
