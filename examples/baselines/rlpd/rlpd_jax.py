"""RLPD-style demo-bootstrapped SAC.

Counterpart of the reference RLPD baseline (``examples/baselines/rlpd``):
off-policy SAC where every gradient batch is sampled 50/50 from the
ONLINE replay buffer and an OFFLINE demonstration buffer (symmetric
sampling, Ball et al. 2023), with a higher update-to-data ratio. Reuses
the SAC networks (sac_jax.Actor/DoubleCritic) and the fully jitted
collect+update loop; demos come from RecordEpisode h5 files (which now
store per-step rewards).

Usage (after generating demos, see bc_jax.py):
  python examples/baselines/rlpd/rlpd_jax.py --env-id PushCube-v1 \
      --demo-dataset demos/trajectory.h5 --total-timesteps 100000
"""
from __future__ import annotations

import argparse
import importlib.util
import os
import sys
import time
from typing import NamedTuple

_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "../../..")
sys.path.insert(0, _ROOT)

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training.train_state import TrainState

import maniskill_tpu as mst
from maniskill_tpu.trajectory.record import load_trajectories

_spec = importlib.util.spec_from_file_location(
    "sac_jax", os.path.join(_ROOT, "examples/baselines/sac/sac_jax.py"))
_sac = importlib.util.module_from_spec(_spec)
sys.modules["sac_jax"] = _sac  # flax dataclasses resolve via sys.modules
_spec.loader.exec_module(_sac)
Actor, DoubleCritic = _sac.Actor, _sac.DoubleCritic
sample_squashed, Buffer = _sac.sample_squashed, _sac.Buffer


def load_demo_transitions(h5_path: str):
    obs_l, act_l, rew_l, next_l, done_l = [], [], [], [], []
    for ep in load_trajectories(h5_path):
        if "obs" not in ep or "rewards" not in ep:
            raise ValueError(
                "RLPD demos need obs + rewards: record with "
                "RecordEpisode(save_obs=True) (rewards are stored since "
                "round 2)")
        obs = np.asarray(ep["obs"], np.float32)
        acts = np.asarray(ep["actions"], np.float32)
        rews = np.asarray(ep["rewards"], np.float32)
        term = np.asarray(ep["terminated"], bool)
        T = len(acts)
        obs_l.append(obs[:T])
        next_l.append(obs[1:T + 1])
        act_l.append(acts)
        rew_l.append(rews)
        done_l.append(term)
    return (np.concatenate(obs_l), np.concatenate(act_l),
            np.concatenate(rew_l), np.concatenate(next_l),
            np.concatenate(done_l))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env-id", default="PushCube-v1")
    p.add_argument("--demo-dataset", required=True)
    p.add_argument("--control-mode", default=None,
                   help="defaults to the demos' recorded control mode")
    p.add_argument("--num-envs", type=int, default=32)
    p.add_argument("--buffer-size", type=int, default=100_000)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--total-timesteps", type=int, default=100_000)
    p.add_argument("--gamma", type=float, default=0.9)
    p.add_argument("--tau", type=float, default=0.005)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--steps-per-iter", type=int, default=8)
    p.add_argument("--updates-per-iter", type=int, default=32)  # high UTD
    p.add_argument("--max-episode-steps", type=int, default=50)
    p.add_argument("--seed", type=int, default=1)
    args = p.parse_args()

    d_obs, d_act, d_rew, d_next, d_done = load_demo_transitions(
        args.demo_dataset)
    print(f"demo transitions: {len(d_obs)}")
    d_obs_j = jnp.asarray(d_obs)
    d_act_j = jnp.asarray(d_act)
    d_rew_j = jnp.asarray(d_rew)
    d_next_j = jnp.asarray(d_next)
    d_done_j = jnp.asarray(d_done)
    n_demo = len(d_obs)

    if args.control_mode is None:
        import json
        with open(args.demo_dataset.replace(".h5", ".json")) as f:
            args.control_mode = json.load(f)["episodes"][0]["control_mode"]
    env = mst.make(args.env_id, num_envs=args.num_envs, obs_mode="state",
                   reward_mode="normalized_dense",
                   control_mode=args.control_mode)
    obs0, _ = env.reset(seed=args.seed)
    obs_dim = obs0.shape[-1]
    act_dim = env.action_dim
    assert obs_dim == d_obs.shape[-1], "demo obs dim mismatch (obs_mode?)"

    key = jax.random.key(args.seed)
    key, ka, kc = jax.random.split(key, 3)
    actor = Actor(act_dim)
    critic = DoubleCritic()
    a_ts = TrainState.create(
        apply_fn=actor.apply,
        params=actor.init(ka, jnp.zeros((1, obs_dim))),
        tx=optax.adam(args.lr))
    c_ts = TrainState.create(
        apply_fn=critic.apply,
        params=critic.init(kc, jnp.zeros((1, obs_dim)),
                           jnp.zeros((1, act_dim))),
        tx=optax.adam(args.lr))
    target_c = c_ts.params
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

        def env_step(carry, _):
            env_state, obs, buf, key = carry
            key, k_act, k_reset = jax.random.split(key, 3)
            action, _ = sample_squashed(a_ts.params, actor, obs, k_act)
            env_state, next_obs, reward, terminated, info = step_env(
                env_state, action)
            truncated = env_state.elapsed_steps >= args.max_episode_steps
            done = terminated | truncated
            idx = (buf.ptr + jnp.arange(args.num_envs)) % args.buffer_size
            buf2 = buf._replace(
                obs=buf.obs.at[idx].set(obs),
                action=buf.action.at[idx].set(action),
                reward=buf.reward.at[idx].set(reward),
                next_obs=buf.next_obs.at[idx].set(next_obs),
                done=buf.done.at[idx].set(terminated),
                ptr=(buf.ptr + args.num_envs) % args.buffer_size,
                size=jnp.minimum(buf.size + args.num_envs, args.buffer_size),
            )
            keys = jax.random.split(k_reset, args.num_envs)
            fresh_state, fresh_obs, _ = reset_env(keys)
            env_state = jax.tree.map(
                lambda f, o: jnp.where(
                    done.reshape((-1,) + (1,) * (f.ndim - 1)), f, o),
                fresh_state, env_state)
            next_obs = jnp.where(done[:, None], fresh_obs, next_obs)
            return (env_state, next_obs, buf2, key), reward.mean()

        (env_state, obs, buf, key), rews = jax.lax.scan(
            env_step, (env_state, obs, buf, key), None,
            length=args.steps_per_iter)

        half = args.batch_size // 2

        def update(carry, _):
            a_ts, c_ts, target_c, log_alpha, alpha_state, key = carry
            key, k_on, k_off, k_next, k_pi = jax.random.split(key, 5)
            # symmetric 50/50 sampling (RLPD)
            i_on = jax.random.randint(k_on, (half,), 0,
                                      jnp.maximum(buf.size, 1))
            i_off = jax.random.randint(k_off, (half,), 0, n_demo)
            b_obs = jnp.concatenate([buf.obs[i_on], d_obs_j[i_off]])
            b_act = jnp.concatenate([buf.action[i_on], d_act_j[i_off]])
            b_rew = jnp.concatenate([buf.reward[i_on], d_rew_j[i_off]])
            b_next = jnp.concatenate([buf.next_obs[i_on], d_next_j[i_off]])
            b_done = jnp.concatenate([buf.done[i_on], d_done_j[i_off]])
            alpha = jnp.exp(log_alpha)

            na, nlogp = sample_squashed(a_ts.params, actor, b_next, k_next)
            q1t, q2t = critic.apply(target_c, b_next, na)
            target = b_rew + args.gamma * (1 - b_done) * (
                jnp.minimum(q1t, q2t) - alpha * nlogp)

            def c_loss(params):
                q1, q2 = critic.apply(params, b_obs, b_act)
                return ((q1 - target) ** 2 + (q2 - target) ** 2).mean()

            c_ts = c_ts.apply_gradients(grads=jax.grad(c_loss)(c_ts.params))

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
                lambda t, o: t * (1 - args.tau) + o * args.tau,
                target_c, c_ts.params)
            return (a_ts, c_ts, target_c, log_alpha, alpha_state, key), None

        (a_ts, c_ts, target_c, log_alpha, alpha_state, key), _ = jax.lax.scan(
            update, (a_ts, c_ts, target_c, log_alpha, alpha_state, key),
            None, length=args.updates_per_iter)
        return ((a_ts, c_ts, target_c, log_alpha, alpha_state, buf,
                 env_state, obs, key), rews.mean())

    carry = (a_ts, c_ts, target_c, log_alpha, alpha_state, buf, env._state,
             obs0, key)
    steps_per_iter = args.num_envs * args.steps_per_iter
    iters = args.total_timesteps // steps_per_iter
    t0 = time.time()
    for it in range(iters):
        carry, mean_rew = iteration(carry, None)
        if it % 10 == 0:
            sps = steps_per_iter * (it + 1) / (time.time() - t0)
            print(f"iter {it}/{iters} reward={float(mean_rew):.3f} "
                  f"sps={sps:.0f}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
