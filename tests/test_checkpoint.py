"""Checkpoint/resume: the EnvState pytree round-trips through disk and
reproduces identical behavior (SURVEY.md §5 restart-payload contract)."""
import numpy as np

import maniskill_tpu as mst
from maniskill_tpu.utils import checkpoint


def test_env_checkpoint_roundtrip(tmp_path):
    env = mst.make("PushCube-v1", num_envs=2)
    env.reset(seed=9)
    a = np.random.RandomState(1).uniform(-1, 1, (2, env.action_dim)).astype(np.float32)
    env.step(a)
    path = str(tmp_path / "ckpt")
    checkpoint.save_env(path, env)
    obs_a = np.asarray(env.step(a)[0])
    # restore and redo the same step: identical observations
    checkpoint.restore_env(path, env)
    obs_b = np.asarray(env.step(a)[0])
    assert np.array_equal(obs_a, obs_b)
