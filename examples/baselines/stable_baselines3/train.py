"""Stable-Baselines3 PPO on the TPU-native simulator via the SB3 adapter.

Parity port of the reference SB3 path
(``/root/reference/examples/baselines/stable_baselines3/example.py``):
make a batched env, wrap it with the SB3 VecEnv adapter
(maniskill_tpu/vector/sb3.py), train PPO, and evaluate. The simulator
runs batched on TPU/JAX; SB3's torch networks train on CPU — the adapter
moves (obs, reward, done) across as numpy.

stable_baselines3 is an optional dependency; the script exits with a
clear message when absent (this image does not ship it).
"""
import argparse
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

import maniskill_tpu as mst
from maniskill_tpu.vector.sb3 import make_sb3_vec_env


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env-id", default="PushCube-v1")
    p.add_argument("--num-envs", type=int, default=64)
    p.add_argument("--total-timesteps", type=int, default=500_000)
    p.add_argument("--n-steps", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--n-epochs", type=int, default=8)
    p.add_argument("--gamma", type=float, default=0.8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save-path", default="ppo_sb3_policy")
    args = p.parse_args()

    try:
        from stable_baselines3 import PPO
    except ImportError:
        print(
            "stable_baselines3 is not installed in this environment; "
            "`pip install stable_baselines3` to run this baseline. "
            "The adapter itself (maniskill_tpu/vector/sb3.py) is "
            "covered by tests/test_wrappers_extra.py."
        )
        return 0

    env = mst.make(args.env_id, num_envs=args.num_envs, obs_mode="state",
                   reward_mode="normalized_dense")
    vec_env = make_sb3_vec_env(env)

    model = PPO(
        "MlpPolicy", vec_env, gamma=args.gamma, gae_lambda=0.9,
        n_steps=args.n_steps, batch_size=args.batch_size,
        n_epochs=args.n_epochs, seed=args.seed, verbose=1,
    )
    model.learn(total_timesteps=args.total_timesteps)
    model.save(args.save_path)

    # evaluation: success_once over 16 envs
    eval_env = mst.make(args.env_id, num_envs=16, obs_mode="state")
    obs, _ = eval_env.reset(seed=args.seed + 1000)
    success = np.zeros(16, bool)
    for _ in range(eval_env.max_episode_steps or 50):
        action, _ = model.predict(np.asarray(obs), deterministic=True)
        obs, rew, term, trunc, info = eval_env.step(action)
        success |= np.asarray(info["success"])
    print(f"eval success_once: {success.mean():.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
