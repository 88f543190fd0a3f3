"""VLA (vision-language-action) evaluation harness over the digital twins.

Reference analogue: the fork's RDT-1B / Octo evaluation flow (``run_rdt.sh``
→ bridge digital-twin envs, SURVEY §2.11 "VLA eval"): a policy that maps
(camera rgb, language instruction, proprioception) -> end-effector action
is rolled out on the BridgeData eval envs and scored by the envs' own
success logic (src-on-target + grasp tracking).

The harness defines the policy interface and ships two built-ins:
  - ``random``: uniform actions (floor baseline)
  - ``zero``:   hold still (sanity floor)
Real VLA checkpoints plug in via ``--policy mymodule:make_policy`` where
``make_policy()`` returns ``fn(rgb_uint8(B,H,W,3), instructions, proprio)
-> actions (B, A)`` — the same call surface the reference wraps RDT with.

Usage:
  python examples/vla_eval.py --env-ids PutCarrotOnPlateInScene-v1 \
      --episodes 5 --policy random
"""
from __future__ import annotations

import argparse
import importlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

import maniskill_tpu as mst

BRIDGE_ENVS = [
    "PutCarrotOnPlateInScene-v1",
    "PutSpoonOnTableClothInScene-v1",
    "StackGreenCubeOnYellowCubeBakedTexInScene-v1",
    "PutEggplantInBasketScene-v1",
]


def make_random_policy(seed=0):
    rng = np.random.RandomState(seed)

    def policy(rgb, instructions, proprio):
        b = rgb.shape[0]
        a = rng.uniform(-1, 1, (b, policy.action_dim)).astype(np.float32)
        return a

    return policy


def make_zero_policy():
    def policy(rgb, instructions, proprio):
        return np.zeros((rgb.shape[0], policy.action_dim), np.float32)

    return policy


def load_policy(spec: str):
    if spec == "random":
        return make_random_policy()
    if spec == "zero":
        return make_zero_policy()
    mod, fn = spec.split(":")
    return getattr(importlib.import_module(mod), fn)()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env-ids", nargs="*", default=BRIDGE_ENVS)
    p.add_argument("--episodes", type=int, default=5)
    p.add_argument("--policy", default="random")
    p.add_argument("--control-mode", default="pd_ee_delta_pose",
                   help="the bridge eval control mode")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None, help="write a results JSON")
    args = p.parse_args()

    policy = load_policy(args.policy)
    results = {}
    for env_id in args.env_ids:
        env = mst.make(env_id, num_envs=args.episodes, obs_mode="rgb",
                       control_mode=args.control_mode)
        policy.action_dim = env.action_dim
        instructions = env.get_language_instruction()
        obs, _ = env.reset(seed=args.seed)
        succ = np.zeros(args.episodes, bool)
        grasped = np.zeros(args.episodes, bool)
        t0 = time.time()
        steps = env.max_episode_steps or 60
        cam_uid = next(iter(obs["sensor_data"]))
        for t in range(steps):
            rgb = np.asarray(obs["sensor_data"][cam_uid]["rgb"])
            proprio = np.asarray(obs["agent"]) if "agent" in obs else None
            action = policy(rgb, instructions, proprio)
            obs, rew, term, trunc, info = env.step(action)
            succ |= np.asarray(info["success"])
            grasped |= np.asarray(info["is_src_obj_grasped"])
        results[env_id] = dict(
            success_rate=float(succ.mean()),
            grasp_rate=float(grasped.mean()),
            episodes=args.episodes,
            policy=args.policy,
            instruction=instructions[0],
            wall_s=round(time.time() - t0, 1),
        )
        print(env_id, results[env_id], flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
