"""Trajectory merging: episode renumbering + metadata union."""
import json

import h5py
import numpy as np

import maniskill_tpu as mst
from maniskill_tpu.trajectory import RecordEpisode
from maniskill_tpu.trajectory.merge import merge_trajectories
from maniskill_tpu.trajectory.record import load_trajectories


def _record(tmp_path, name, n_envs, seed):
    env = mst.make("PushCube-v1", num_envs=n_envs)
    rec = RecordEpisode(env, str(tmp_path), trajectory_name=name)
    rec.reset(seed=seed)
    for _ in range(4):
        rec.step(np.zeros((n_envs, env.action_dim), np.float32))
    rec.close()
    return str(tmp_path / f"{name}.h5")


def test_merge_trajectories(tmp_path):
    a = _record(tmp_path, "a", 2, 0)
    b = _record(tmp_path, "b", 3, 7)
    out = str(tmp_path / "merged.h5")
    n = merge_trajectories(out, [a, b])
    assert n == 5
    with h5py.File(out) as f:
        assert sorted(f.keys()) == [f"traj_{i}" for i in range(5)]
    meta = json.load(open(str(tmp_path / "merged.json")))
    assert [e["episode_id"] for e in meta["episodes"]] == list(range(5))
    assert meta["env_info"]["env_id"] == "PushCube-v1"
    eps = load_trajectories(out)
    assert len(eps) == 5 and eps[0]["actions"].shape[0] == 4
