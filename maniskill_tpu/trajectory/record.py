"""Trajectory recording in the reference's h5+json format.

Format-parity implementation of the reference ``RecordEpisode`` wrapper's
trajectory side (``mani_skill/utils/wrappers/record.py:113-186``): one
``.h5`` file with ``traj_{i}`` groups (actions [T,A], terminated/truncated
[T], success/fail [T] when defined, env_states as a nested dict-of-sequences,
optional obs) plus a JSON metadata file (env_info with env_id/env_kwargs,
per-episode reset_kwargs incl. seed — enough to recreate and replay).

Works on the batched env: each sub-env's stream is split into episodes at its
reset boundaries (partial-reset aware like the reference).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional

import h5py
import numpy as np


def _tree_to_numpy(d):
    if isinstance(d, dict):
        return {k: _tree_to_numpy(v) for k, v in d.items()}
    return np.asarray(d)


def _stack_dicts(dicts: List[Dict]) -> Dict:
    if not dicts:
        return {}
    out = {}
    for k in dicts[0]:
        if isinstance(dicts[0][k], dict):
            out[k] = _stack_dicts([d[k] for d in dicts])
        else:
            out[k] = np.stack([np.asarray(d[k]) for d in dicts])
    return out


def _write_dict(group, name, d):
    if isinstance(d, dict):
        sub = group.create_group(name)
        for k, v in d.items():
            _write_dict(sub, k, v)
    else:
        group.create_dataset(name, data=np.asarray(d))


class RecordEpisode:
    """Wraps a batched env; writes trajectories on episode completion."""

    def __init__(
        self,
        env,
        output_dir: str,
        trajectory_name: str = "trajectory",
        save_obs: bool = False,
        save_video: bool = False,
        video_fps: int = 20,
        source_type: Optional[str] = None,
        source_desc: Optional[str] = None,
    ):
        self.env = env
        self.save_video = save_video
        self.video_fps = video_fps
        self._video_frames: List = []
        self._video_path = os.path.join(
            output_dir, f"{trajectory_name}.mp4"
        )
        os.makedirs(output_dir, exist_ok=True)
        self._h5_path = os.path.join(output_dir, f"{trajectory_name}.h5")
        self._json_path = os.path.join(output_dir, f"{trajectory_name}.json")
        self._h5 = h5py.File(self._h5_path, "w")
        self.save_obs = save_obs
        self._episode_id = 0
        self._meta = dict(
            env_info=dict(
                env_id=getattr(env, "env_id", type(env).__name__),
                max_episode_steps=env.max_episode_steps,
                env_kwargs=dict(
                    obs_mode=env.obs_mode,
                    reward_mode=env.reward_mode,
                    control_mode=env.control_mode,
                    robot_uids=env.robot_uids,
                    num_envs=1,
                ),
            ),
            episodes=[],
        )
        if source_type:
            self._meta["source_type"] = source_type
        if source_desc:
            self._meta["source_desc"] = source_desc
        n = env.num_envs
        self._buffers = [
            dict(actions=[], terminated=[], truncated=[], success=[],
                 fail=[], rewards=[],
                 states=[], obs=[])
            for _ in range(n)
        ]
        self._last_seed = None

    # -- env API -----------------------------------------------------------
    @property
    def num_envs(self):
        return self.env.num_envs

    @property
    def action_dim(self):
        return self.env.action_dim

    def reset(self, seed=None, options=None):
        obs, info = self.env.reset(seed=seed, options=options)
        self._last_seed = seed
        env_idx = (
            options.get("env_idx") if options else None
        )
        idxs = range(self.num_envs) if env_idx is None else env_idx
        state = _tree_to_numpy(self.env.get_state_dict())
        for i in idxs:
            if self._buffers[i]["actions"]:
                self._flush(i)
            self._buffers[i]["states"].append(_index_tree(state, i))
            if self.save_obs:
                self._buffers[i]["obs"].append(np.asarray(obs)[i])
        if self.save_video:
            self._video_frames.append(self.env.render())
        return obs, info

    def step(self, action):
        obs, rew, term, trunc, info = self.env.step(action)
        state = _tree_to_numpy(self.env.get_state_dict())
        action = np.asarray(action)
        term_np = np.asarray(term)
        trunc_np = np.asarray(trunc)
        for i in range(self.num_envs):
            b = self._buffers[i]
            b["actions"].append(action[i])
            b["terminated"].append(bool(term_np[i]))
            b["truncated"].append(bool(trunc_np[i]))
            if "success" in info:
                b["success"].append(bool(np.asarray(info["success"])[i]))
            if "fail" in info:
                b["fail"].append(bool(np.asarray(info["fail"])[i]))
            b["rewards"].append(float(np.asarray(rew)[i]))
            b["states"].append(_index_tree(state, i))
            if self.save_obs:
                b["obs"].append(np.asarray(obs)[i])
        if self.save_video:
            self._video_frames.append(self.env.render())
        return obs, rew, term, trunc, info

    def _flush(self, i: int):
        b = self._buffers[i]
        T = len(b["actions"])
        if T == 0:
            return
        g = self._h5.create_group(f"traj_{self._episode_id}")
        g.create_dataset("actions", data=np.stack(b["actions"]).astype(np.float32))
        g.create_dataset("terminated", data=np.asarray(b["terminated"], bool))
        g.create_dataset("truncated", data=np.asarray(b["truncated"], bool))
        if b["success"]:
            g.create_dataset("success", data=np.asarray(b["success"], bool))
        if b["fail"]:
            g.create_dataset("fail", data=np.asarray(b["fail"], bool))
        if b["rewards"]:
            g.create_dataset(
                "rewards", data=np.asarray(b["rewards"], np.float32))
        _write_dict(g, "env_states", _stack_dicts(b["states"]))
        if self.save_obs and b["obs"]:
            g.create_dataset("obs", data=np.stack(b["obs"]).astype(np.float32))
        self._meta["episodes"].append(
            dict(
                episode_id=self._episode_id,
                reset_kwargs=dict(seed=self._last_seed),
                control_mode=self.env.control_mode,
                elapsed_steps=T,
                env_idx=i,
            )
        )
        self._episode_id += 1
        for k in b:
            b[k].clear()

    def flush_all(self):
        for i in range(self.num_envs):
            self._flush(i)
        self._save_json()

    def _save_json(self):
        with open(self._json_path, "w") as f:
            json.dump(self._meta, f, indent=2)

    def close(self):
        self.flush_all()
        if self.save_video and self._video_frames:
            from ..utils.visualization import images_to_video

            images_to_video(self._video_frames, self._video_path,
                            fps=self.video_fps)
            self._video_frames = []
        self._h5.close()


def _index_tree(d, i):
    if isinstance(d, dict):
        return {k: _index_tree(v, i) for k, v in d.items()}
    return np.asarray(d)[i]


def load_trajectories(h5_path: str):
    """Read a trajectory file into a list of dicts (actions, env_states, ...).
    Reference analogue: ``mani_skill/trajectory/dataset.py``."""
    out = []
    with h5py.File(h5_path, "r") as f:
        for key in sorted(f.keys(), key=lambda s: int(s.split("_")[1])):
            g = f[key]

            def read(node):
                if isinstance(node, h5py.Group):
                    return {k: read(node[k]) for k in node}
                return node[()]

            out.append({k: read(g[k]) for k in g})
    return out
