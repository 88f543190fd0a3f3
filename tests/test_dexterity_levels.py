"""RotateValve + RotateSingleObjectInHand difficulty ladders
(reference dexterity family parity: rotate_valve.py:255-315,
rotate_single_object_in_hand.py:320-375)."""
import numpy as np
import pytest

import maniskill_tpu as mst

VALVE_LEVELS = [f"RotateValveLevel{i}-v1" for i in range(5)]
HAND_LEVELS = [f"RotateSingleObjectInHandLevel{i}-v1" for i in range(4)]


@pytest.mark.parametrize("eid", VALVE_LEVELS + HAND_LEVELS)
def test_levels_run(eid):
    env = mst.make(eid, num_envs=2)
    obs, _ = env.reset(seed=0)
    rng = np.random.RandomState(0)
    for _ in range(3):
        obs, rew, term, trunc, info = env.step(env.sample_action(rng))
    assert np.isfinite(np.asarray(obs)).all()
    assert np.isfinite(np.asarray(rew)).all()


def test_valve_level_heterogeneity():
    env = mst.make("RotateValveLevel3-v1", num_envs=8)
    env.reset(seed=0)
    sizes = np.asarray(env._state.sim.geom_size[:, env._spoke_geoms, 0])
    heads = (sizes > 0.01).sum(axis=1)
    assert heads.min() >= 3 and heads.max() <= 6
    assert len(set(heads.tolist())) >= 2  # per-env head counts differ
    dirs = np.asarray(env._state.extras["rotate_dir"])
    assert set(dirs.tolist()) == {-1.0, 1.0}  # both directions sampled


def test_valve_level0_threshold():
    env = mst.make("RotateValveLevel0-v1", num_envs=1)
    assert env.success_threshold == pytest.approx(np.pi / 2)
    env4 = mst.make("RotateValveLevel4-v1", num_envs=1)
    assert env4.success_threshold == pytest.approx(2 * np.pi)


def test_hand_level_heterogeneity():
    env = mst.make("RotateSingleObjectInHandLevel3-v1", num_envs=4)
    env.reset(seed=0)
    m = np.asarray(env._state.sim.free_mass[:, 0])
    assert len(set(np.round(m, 4).tolist())) >= 3  # different objects
