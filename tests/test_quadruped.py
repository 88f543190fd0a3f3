"""Quadruped family: AnymalC-Reach/Spin-v1, UnitreeGo2-Reach-v1.

Parity targets: reference quadruped_reach.py / quadruped_spin.py (goal
distribution, success/fail, dense-reward structure) and the agent specs
(anymal_c.py, unitree_go2.py: joint names, standing keyframes)."""
import jax.numpy as jnp
import numpy as np
import pytest

import maniskill_tpu as mst


@pytest.mark.parametrize("env_id,robot_z", [
    ("AnymalC-Reach-v1", 0.55),
    ("UnitreeGo2-Reach-v1", 0.26),
])
def test_quadruped_stands_under_pd_hold(env_id, robot_z):
    """Absolute PD on the standing keyframe holds the robot upright with
    centimetre-level sag (the reference keyframe contract)."""
    env = mst.make(env_id, num_envs=1, control_mode="pd_joint_pos")
    env.reset(seed=0)
    names = list(env.model.robot.joint_names)
    li = [names.index(n) for n in env.agent.leg_joint_names]
    hold = np.asarray(env._state.sim.qpos[0])[li][None]
    for _ in range(100):
        obs, rew, term, trunc, info = env.step(jnp.asarray(hold))
    q = np.asarray(env._state.sim.qpos[0])
    base_idx = list(env.model.robot.link_names).index("base")
    # settled, upright, not fallen
    assert float(np.linalg.norm(np.asarray(env._state.sim.qvel[0]))) < 0.05
    assert not bool(np.asarray(info["is_fallen"])[0])
    assert abs(q[2]) < 0.06  # z-slide sag from keyframe
    assert np.isfinite(np.asarray(obs)).all()


def test_anymal_reach_reward_structure():
    env = mst.make("AnymalC-Reach-v1", num_envs=2, control_mode="pd_joint_pos")
    obs, _ = env.reset(seed=0)
    names = list(env.model.robot.joint_names)
    li = [names.index(n) for n in env.agent.leg_joint_names]
    hold = np.tile(np.asarray(env._state.sim.qpos[0])[li], (2, 1))
    obs, rew, term, trunc, info = env.step(jnp.asarray(hold))
    rew = np.asarray(rew)
    # standing near the keyframe, not fallen: reward ≈ 1 + 2*reaching > 0
    assert (rew > 0).all()
    assert not np.asarray(info["fail"]).any()
    d = np.asarray(info["robot_to_goal_dist"])
    assert (d > 1.4).all() and (d < 4.0).all()  # goal 2.5±0.5 fwd, ±1 lat


def test_anymal_spin_reward_tracks_yaw_rate():
    env = mst.make("AnymalC-Spin-v1", num_envs=1, control_mode="pd_joint_pos")
    env.reset(seed=0)
    # inject positive yaw rate on the root hinge_2 (z) dof
    names = list(env.model.robot.joint_names)
    zi = names.index("root_hinge_2")
    sim = env._state.sim
    env._state = env._state.replace(
        sim=sim.replace(qvel=sim.qvel.at[:, zi].set(1.0))
    )
    li = [names.index(n) for n in env.agent.leg_joint_names]
    hold = np.asarray(env._state.sim.qpos[0])[li][None]
    obs, rew_pos, *_ = env.step(jnp.asarray(hold))
    env.reset(seed=0)
    sim = env._state.sim
    env._state = env._state.replace(
        sim=sim.replace(qvel=sim.qvel.at[:, zi].set(-1.0))
    )
    obs, rew_neg, *_ = env.step(jnp.asarray(hold))
    assert float(rew_pos[0]) > float(rew_neg[0])


def test_quadruped_registered_and_runs():
    rng = np.random.RandomState(0)
    for eid in ["AnymalC-Reach-v1", "AnymalC-Spin-v1", "UnitreeGo2-Reach-v1"]:
        env = mst.make(eid, num_envs=2)
        obs, _ = env.reset(seed=1)
        for _ in range(3):
            obs, rew, term, trunc, info = env.step(env.sample_action(rng))
        assert np.isfinite(np.asarray(obs)).all()
        assert np.isfinite(np.asarray(rew)).all()
