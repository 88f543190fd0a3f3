"""RFCL: Reverse Forward Curriculum Learning (jitted JAX, TPU-native).

Parity port of the reference baseline (``examples/baselines/rfcl/`` —
Tao et al., "Reverse Forward Curriculum Learning for Extreme Sample and
Demonstration Efficiency", ICLR 2024): off-policy SAC where episodes
START FROM DEMONSTRATION STATES under two curricula —

  * reverse curriculum: each demo has a start pointer that begins near
    the demo's END (short, easy remainder) and walks BACKWARD toward the
    start as the agent's per-demo success rate passes a threshold;
  * forward curriculum: demos are sampled with probability weighted by
    recent failure (mastered demos fade, unmastered ones get data).

Demonstrations come from the scripted motion-planning solutions
(maniskill_tpu/examples/motionplanning/solutions.py) — per-step EnvState
snapshots, so "reset to demo state" is a pure pytree index + replace.
The whole loop (collect with curriculum resets + SAC updates) is one
jitted scan iteration, same architecture as sac_jax.py.
"""
import argparse
import sys
import time
from typing import NamedTuple

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax.training.train_state import TrainState

import maniskill_tpu as mst


class Actor(nn.Module):
    act_dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.tanh(nn.Dense(256)(x))
        x = nn.tanh(nn.Dense(256)(x))
        mean = nn.Dense(self.act_dim)(x)
        log_std = nn.Dense(self.act_dim)(x)
        return mean, jnp.clip(log_std, -5.0, 2.0)


class DoubleCritic(nn.Module):
    @nn.compact
    def __call__(self, obs, action):
        x = jnp.concatenate([obs, action], axis=-1)

        def q():
            h = nn.tanh(nn.Dense(256)(x))
            h = nn.tanh(nn.Dense(256)(h))
            return nn.Dense(1)(h)[..., 0]

        return q(), q()


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
    eps = jax.random.normal(key, mean.shape)
    pre = mean + eps * jnp.exp(log_std)
    act = jnp.tanh(pre)
    logp = (
        -0.5 * (eps**2 + 2 * log_std + jnp.log(2 * jnp.pi)).sum(-1)
        - jnp.log(1 - act**2 + 1e-6).sum(-1)
    )
    return act, logp


def collect_demos(env_id: str, n_demos: int, seed: int = 0):
    """Run the scripted solution n_demos times, snapshotting the full
    EnvState + obs each control step; keep successful episodes."""
    from maniskill_tpu.examples.motionplanning.solutions import SOLUTIONS

    # scripted solutions drive pd_ee_delta_pos; train in the same mode so
    # EnvState pytree structures match the demo bank
    env = mst.make(env_id, num_envs=1, obs_mode="state",
                   reward_mode="normalized_dense",
                   control_mode="pd_ee_delta_pos")
    solver = SOLUTIONS[env_id]
    states, obses, lengths = [], [], []
    d = 0
    attempt = 0
    while d < n_demos and attempt < 4 * n_demos:
        snap_states, snap_obs = [], []

        class Rec:
            """Recorder protocol: .step(a) steps the env + snapshots."""

            def step(self, action):
                out = env.step(action)
                snap_states.append(env._state)  # immutable pytree snapshot
                snap_obs.append(np.asarray(out[0])[0])
                return out

        obs0, _ = env.reset(seed=seed + attempt)
        snap_states.append(env._state)
        snap_obs.append(np.asarray(obs0)[0])
        ok = solver(env, recorder=Rec())
        attempt += 1
        if not bool(np.asarray(ok)[0]):
            continue
        states.append(snap_states)
        obses.append(np.stack(snap_obs))
        lengths.append(len(snap_states))
        d += 1
    assert states, f"no successful scripted demos for {env_id}"
    T = max(lengths)

    def pad(seq):
        return seq + [seq[-1]] * (T - len(seq))

    bank = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[jax.tree.map(lambda *ys: jnp.stack(ys), *pad(s)) for s in states],
    )
    # (D, T, 1, ...) -> (D, T, ...): drop the num_envs=1 axis
    bank = jax.tree.map(lambda x: x[:, :, 0] if x.ndim >= 3 else x, bank)
    obs_bank = jnp.stack([
        np.concatenate([o, np.tile(o[-1:], (T - len(o), 1))]) for o in obses
    ])
    return bank, obs_bank, jnp.asarray(lengths)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env-id", default="PickCube-v1")
    p.add_argument("--num-envs", type=int, default=64)
    p.add_argument("--n-demos", type=int, default=8)
    p.add_argument("--buffer-size", type=int, default=200_000)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--total-timesteps", type=int, default=200_000)
    p.add_argument("--gamma", type=float, default=0.9)
    p.add_argument("--tau", type=float, default=0.005)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--steps-per-iter", type=int, default=16)
    p.add_argument("--updates-per-iter", type=int, default=16)
    p.add_argument("--max-episode-steps", type=int, default=50)
    p.add_argument("--reverse-step", type=int, default=4,
                   help="how far the start pointer walks back per advance")
    p.add_argument("--success-to-advance", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=1)
    args = p.parse_args()

    bank, obs_bank, lengths = collect_demos(
        args.env_id, args.n_demos, seed=args.seed
    )
    D = int(lengths.shape[0])
    print(f"collected {D} demos, lengths {np.asarray(lengths)}", flush=True)

    env = mst.make(args.env_id, num_envs=args.num_envs, obs_mode="state",
                   reward_mode="normalized_dense",
                   control_mode="pd_ee_delta_pos")
    obs0, _ = env.reset(seed=args.seed)
    obs_dim = obs0.shape[-1]
    act_dim = env.action_dim

    key = jax.random.key(args.seed)
    key, ka, kc = jax.random.split(key, 3)
    actor = Actor(act_dim)
    critic = DoubleCritic()
    a_params = actor.init(ka, jnp.zeros((1, obs_dim)))
    c_params = critic.init(kc, jnp.zeros((1, obs_dim)),
                           jnp.zeros((1, act_dim)))
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

    # curriculum state: per-demo reverse pointer (starts near the END),
    # per-demo success EMA (drives both pointer advance + forward weights)
    ptrs0 = jnp.maximum(lengths - 1 - args.reverse_step, 0)
    succ_ema0 = jnp.zeros(D)
    env_demo0 = jnp.arange(args.num_envs) % D

    def reset_from_demo(ds, ptrs):
        """Batched: EnvState for each env i from demo ds[i] at ptrs[ds[i]]."""
        ts = ptrs[ds]

        def gather(leaf):
            return leaf[ds, ts]

        st = jax.tree.map(gather, bank)
        st = st.replace(elapsed_steps=jnp.zeros_like(st.elapsed_steps))
        return st, obs_bank[ds, ts]

    @jax.jit
    def iteration(carry, _):
        (a_ts, c_ts, target_c, log_alpha, alpha_state, buf, env_state, obs,
         env_demo, ptrs, succ_ema, key) = carry

        def env_step(carry, _):
            (env_state, obs, buf, env_demo, ptrs, succ_ema, key) = carry
            key, k_act, k_d = jax.random.split(key, 3)
            action, _ = sample_squashed(a_ts.params, actor, obs, k_act)
            env_state, next_obs, reward, terminated, info = step_env(
                env_state, action
            )
            truncated = env_state.elapsed_steps >= args.max_episode_steps
            done = terminated | truncated
            success = info["success"]
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
            # per-demo success EMA on episode ends
            w_done = done.astype(jnp.float32)
            upd = 0.1 * w_done * (success.astype(jnp.float32) - succ_ema[env_demo])
            succ_ema2 = succ_ema.at[env_demo].add(upd)
            # reverse curriculum: demos above threshold walk backward
            advance = succ_ema2 > args.success_to_advance
            ptrs2 = jnp.where(
                advance, jnp.maximum(ptrs - args.reverse_step, 0), ptrs
            )
            succ_ema2 = jnp.where(advance, 0.5 * succ_ema2, succ_ema2)
            # forward curriculum: sample demos ∝ (1 - success) + floor
            wts = (1.0 - succ_ema2) + 0.1
            new_demo = jax.random.categorical(
                k_d, jnp.log(wts)[None].repeat(args.num_envs, 0), axis=-1
            )
            env_demo2 = jnp.where(done, new_demo, env_demo)
            fresh_state, fresh_obs = reset_from_demo(env_demo2, ptrs2)
            env_state = jax.tree.map(
                lambda f, o: jnp.where(
                    done.reshape((-1,) + (1,) * (f.ndim - 1)), f, o
                ),
                fresh_state, env_state,
            )
            next_obs = jnp.where(done[:, None], fresh_obs, next_obs)
            return (env_state, next_obs, buf2, env_demo2, ptrs2, succ_ema2,
                    key), (reward.mean(), (success & done).sum())

        (env_state, obs, buf, env_demo, ptrs, succ_ema, key), (rews, succ) = (
            jax.lax.scan(
                env_step,
                (env_state, obs, buf, env_demo, ptrs, succ_ema, key),
                None, length=args.steps_per_iter,
            )
        )

        def update(carry, _):
            a_ts, c_ts, target_c, log_alpha, alpha_state, key = carry
            key, k_samp, k_next, k_pi = jax.random.split(key, 4)
            idx = jax.random.randint(k_samp, (args.batch_size,), 0,
                                     jnp.maximum(buf.size, 1))
            b_obs, b_act = buf.obs[idx], buf.action[idx]
            b_rew, b_next, b_done = (buf.reward[idx], buf.next_obs[idx],
                                     buf.done[idx])
            alpha = jnp.exp(log_alpha)
            na, nlogp = sample_squashed(a_ts.params, actor, b_next, k_next)
            q1t, q2t = critic.apply(target_c, b_next, na)
            target = b_rew + args.gamma * (1 - b_done) * (
                jnp.minimum(q1t, q2t) - alpha * nlogp
            )

            def c_loss(params):
                q1, q2 = critic.apply(params, b_obs, b_act)
                return ((q1 - target) ** 2 + (q2 - target) ** 2).mean()

            def a_loss(params):
                a_, logp_ = sample_squashed(params, actor, b_obs, k_pi)
                q1, q2 = critic.apply(c_ts.params, b_obs, a_)
                return (alpha * logp_ - jnp.minimum(q1, q2)).mean(), logp_

            c_ts2 = c_ts.apply_gradients(grads=jax.grad(c_loss)(c_ts.params))
            (grads, logp_) = jax.grad(a_loss, has_aux=True)(a_ts.params)
            a_ts2 = a_ts.apply_gradients(grads=grads)
            ent_err = (-logp_ - target_entropy).mean()
            g_alpha = -jnp.exp(log_alpha) * ent_err
            upd, alpha_state2 = alpha_opt.update(g_alpha, alpha_state)
            log_alpha2 = log_alpha + upd
            target_c2 = jax.tree.map(
                lambda t, p: t * (1 - args.tau) + p * args.tau,
                target_c, c_ts2.params,
            )
            return (a_ts2, c_ts2, target_c2, log_alpha2, alpha_state2,
                    key), None

        (a_ts, c_ts, target_c, log_alpha, alpha_state, key), _ = jax.lax.scan(
            update, (a_ts, c_ts, target_c, log_alpha, alpha_state, key),
            None, length=args.updates_per_iter,
        )
        return (
            (a_ts, c_ts, target_c, log_alpha, alpha_state, buf, env_state,
             obs, env_demo, ptrs, succ_ema, key),
            (rews.mean(), succ.sum(), ptrs.mean()),
        )

    # start every env from a demo-state reset
    key, k0 = jax.random.split(key)
    st0, obs_d0 = reset_from_demo(env_demo0, ptrs0)
    carry = (a_ts, c_ts, target_c, log_alpha, alpha_state, buf, st0, obs_d0,
             env_demo0, ptrs0, succ_ema0, key)
    steps_per_iter = args.num_envs * args.steps_per_iter
    iters = args.total_timesteps // steps_per_iter
    t0 = time.time()
    for it in range(iters):
        carry, (mean_rew, n_succ, mean_ptr) = iteration(carry, None)
        if it % 10 == 0:
            sps = steps_per_iter * (it + 1) / (time.time() - t0)
            print(
                f"iter {it}/{iters} reward={float(mean_rew):.3f} "
                f"succ={int(n_succ)} curriculum_ptr={float(mean_ptr):.1f} "
                f"sps={sps:.0f}",
                flush=True,
            )
    print("done", flush=True)


if __name__ == "__main__":
    main()
