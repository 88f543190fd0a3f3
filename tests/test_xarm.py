"""XArm7 agent (robot-zoo expansion; reference agents/robots/xarm*)."""
import numpy as np

import maniskill_tpu as mst
from maniskill_tpu.agents.base_agent import REGISTERED_AGENTS


def test_xarm7_loads_and_reaches():
    a = REGISTERED_AGENTS["xarm7"](control_mode=None)
    assert a.nq == 7
    assert a.robot_spec.frame_of("link_eef")[0] == 6
    assert len(a.collision_geoms()) >= 7  # auto-capsule per link


def test_xarm7_pushcube_runs():
    env = mst.make("PushCube-v1", num_envs=2, robot_uids="xarm7")
    obs, _ = env.reset(seed=0)
    for t in range(5):
        act = np.random.default_rng(t).uniform(
            -1, 1, (2, env.action_dim)).astype(np.float32)
        obs, rew, term, trunc, info = env.step(act)
    assert np.isfinite(np.asarray(obs)).all()
    assert np.isfinite(np.asarray(rew)).all()


def test_allegro_and_dclaw_load():
    for uid, nq in [("allegro_hand_right", 16), ("dclaw", 9)]:
        a = REGISTERED_AGENTS[uid](control_mode=None)
        assert a.nq == nq
        assert len(a.collision_geoms()) >= nq


def test_rotate_valve_dclaw_runs():
    env = mst.make("RotateValveDClaw-v1", num_envs=2)
    obs, _ = env.reset(seed=0)
    for t in range(5):
        act = np.random.default_rng(t).uniform(
            -1, 1, (2, env.action_dim)).astype(np.float32)
        obs, rew, term, trunc, info = env.step(act)
    assert np.isfinite(np.asarray(obs)).all()
