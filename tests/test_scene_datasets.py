"""Dataset-scene builders + playground envs + humanoid stand tasks."""
import numpy as np
import pytest

import maniskill_tpu as mst


@pytest.mark.parametrize("env_id,kwargs", [
    ("SceneManipulation-v1", {}),
    ("SceneManipulation-v1", dict(scene_builder="ai2thor")),
    ("RoboCasaKitchen-v1", dict(build_config_idx=2)),
])
def test_scene_env_runs(env_id, kwargs):
    env = mst.make(env_id, num_envs=2, obs_mode="state", **kwargs)
    obs, _ = env.reset(seed=0)
    for _ in range(3):
        obs, rew, term, trunc, info = env.step(
            np.zeros((2, env.action_dim), np.float32)
        )
    assert np.all(np.isfinite(np.asarray(obs)))
    nav = env.scene_builder.navigable_positions()
    assert len(nav) > 10  # most of the floor is free
    assert len(env.scene_builder.build_configs) >= 3


def test_scene_layouts_differ():
    """Different build configs must produce different static geometry."""
    e0 = mst.make("SceneManipulation-v1", num_envs=1, build_config_idx=0)
    e1 = mst.make("SceneManipulation-v1", num_envs=1, build_config_idx=1)
    p0 = np.concatenate([g.offset_p for g in e0.model.geoms])
    p1 = np.concatenate([g.offset_p for g in e1.model.geoms])
    s0 = np.concatenate([np.asarray(e0.model.static_pose).ravel()])
    s1 = np.concatenate([np.asarray(e1.model.static_pose).ravel()])
    assert (p0.shape != p1.shape) or not np.allclose(s0, s1)


@pytest.mark.parametrize("env_id", ["UnitreeH1Stand-v1", "UnitreeG1Stand-v1"])
def test_humanoid_stand_holds(env_id):
    env = mst.make(env_id, num_envs=2, obs_mode="state")
    env.reset(seed=0)
    for _ in range(10):
        obs, rew, term, trunc, info = env.step(
            np.zeros((2, env.action_dim), np.float32)
        )
    assert np.asarray(info["is_standing"]).all()
    assert np.all(np.asarray(rew) > 0.5)
