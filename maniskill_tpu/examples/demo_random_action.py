"""Canonical quick-start demo (reference ``mani_skill/examples/
demo_random_action.py``): make an env, reset, run random actions, print
reward/success."""
import argparse

import numpy as np

import maniskill_tpu as mst


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-e", "--env-id", default="PushCube-v1")
    p.add_argument("-n", "--num-envs", type=int, default=4)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    env = mst.make(args.env_id, num_envs=args.num_envs)
    obs, info = env.reset(seed=args.seed)
    print(f"{args.env_id}: obs {np.asarray(obs).shape}, action_dim {env.action_dim}")
    rng = np.random.RandomState(args.seed)
    for t in range(args.steps):
        a = rng.uniform(-1, 1, (args.num_envs, env.action_dim)).astype(np.float32)
        obs, rew, term, trunc, info = env.step(a)
    print("final reward:", np.asarray(rew).round(3))
    print("success:", np.asarray(info.get("success", False)))


if __name__ == "__main__":
    main()
