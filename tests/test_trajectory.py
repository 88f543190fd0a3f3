"""Trajectory record/replay tests (reference test_wrappers.py RecordEpisode
coverage + the h5 format contract, record.py:120-186)."""
import os

import numpy as np
import pytest

import maniskill_tpu as mst
from maniskill_tpu.trajectory import RecordEpisode, load_trajectories, replay_trajectory

pytestmark = pytest.mark.slow  # h5 record/replay roundtrips


def test_record_and_replay(tmp_path):
    env = mst.make("PushCube-v1", num_envs=2)
    rec = RecordEpisode(env, str(tmp_path), save_obs=True)
    obs, _ = rec.reset(seed=7)
    rng = np.random.RandomState(0)
    T = 5
    actions = rng.uniform(-1, 1, (T, 2, env.action_dim)).astype(np.float32)
    for t in range(T):
        rec.step(actions[t])
    rec.close()

    h5p = os.path.join(str(tmp_path), "trajectory.h5")
    trajs = load_trajectories(h5p)
    assert len(trajs) == 2  # one per sub-env
    tr = trajs[0]
    assert tr["actions"].shape == (T, env.action_dim)
    assert tr["terminated"].shape == (T,)
    assert "actors" in tr["env_states"]
    assert tr["env_states"]["actors"]["cube"].shape == (T + 1, 13)
    assert tr["obs"].shape[0] == T + 1

    # replay via env states: runs through without error and matches shapes
    env2 = mst.make("PushCube-v1", num_envs=1)
    results = replay_trajectory(h5p, env=env2, use_env_states=True)
    assert len(results) == 2
    assert all(r["steps"] == T for r in results)


def test_replay_reports_state_error(tmp_path):
    """Action replay must track drift vs the recorded state trajectory:
    same-seed same-controller replay drifts ~0."""
    env = mst.make("PushCube-v1", num_envs=1)
    rec = RecordEpisode(env, str(tmp_path), save_obs=False)
    rec.reset(seed=11)
    rng = np.random.RandomState(1)
    for t in range(4):
        rec.step(rng.uniform(-1, 1, (1, env.action_dim)).astype(np.float32))
    rec.close()
    h5p = os.path.join(str(tmp_path), "trajectory.h5")
    env2 = mst.make("PushCube-v1", num_envs=1)
    res = replay_trajectory(h5p, env=env2)
    assert res[0]["max_state_err"] < 1e-4, res
    # env-state replay: one-step drift also tiny
    res2 = replay_trajectory(h5p, env=env2, use_env_states=True)
    assert res2[0]["max_state_err"] < 1e-4, res2


def test_replay_control_mode_conversion(tmp_path):
    """Demos recorded in pd_joint_delta_pos replay through pd_joint_pos
    with the converted action sequence (reference
    replay_trajectory.py:110-253 from_pd_joint_pos path)."""
    env = mst.make("PushCube-v1", num_envs=1,
                   control_mode="pd_joint_delta_pos")
    rec = RecordEpisode(env, str(tmp_path), save_obs=False)
    rec.reset(seed=3)
    rng = np.random.RandomState(2)
    for t in range(5):
        rec.step(rng.uniform(-0.5, 0.5, (1, env.action_dim)).astype(np.float32))
    rec.close()
    h5p = os.path.join(str(tmp_path), "trajectory.h5")
    res = replay_trajectory(h5p, target_control_mode="pd_joint_pos")
    # converted actions reproduce the same drive targets -> tiny drift
    assert res[0]["max_state_err"] < 5e-3, res
