"""Trajectory dataset for imitation learning.

Parity port of the reference ``ManiSkillTrajectoryDataset``
(``mani_skill/trajectory/dataset.py:23``): a torch ``Dataset`` over the
h5 trajectory format yielding per-transition (obs, action, terminated,
truncated, success/fail when present).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

try:
    from torch.utils.data import Dataset as _TorchDataset
except Exception:  # pragma: no cover
    _TorchDataset = object

from .record import load_trajectories


class ManiSkillTrajectoryDataset(_TorchDataset):
    def __init__(self, dataset_file: str, success_only: bool = False,
                 load_count: Optional[int] = None):
        trajs = load_trajectories(dataset_file)
        if load_count is not None:
            trajs = trajs[:load_count]
        obs_l, act_l, term_l, trunc_l, succ_l = [], [], [], [], []
        for tr in trajs:
            if "obs" not in tr:
                raise ValueError(
                    "trajectories were recorded without observations "
                    "(RecordEpisode(save_obs=True))"
                )
            if success_only and "success" in tr and not tr["success"][-1]:
                continue
            T = tr["actions"].shape[0]
            obs_l.append(tr["obs"][:T])  # obs_t aligned with action_t
            act_l.append(tr["actions"])
            term_l.append(tr["terminated"])
            trunc_l.append(tr["truncated"])
            if "success" in tr:
                succ_l.append(tr["success"])
        self.obs = np.concatenate(obs_l).astype(np.float32)
        self.actions = np.concatenate(act_l).astype(np.float32)
        self.terminated = np.concatenate(term_l)
        self.truncated = np.concatenate(trunc_l)
        self.success = np.concatenate(succ_l) if succ_l else None

    def __len__(self):
        return self.actions.shape[0]

    def __getitem__(self, idx):
        out = dict(
            obs=self.obs[idx],
            action=self.actions[idx],
            terminated=self.terminated[idx],
            truncated=self.truncated[idx],
        )
        if self.success is not None:
            out["success"] = self.success[idx]
        return out
