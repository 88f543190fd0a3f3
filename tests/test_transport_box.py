"""UnitreeG1TransportBox-v1 (reference humanoid/transport_box.py parity)."""
import jax.numpy as jnp
import numpy as np

import maniskill_tpu as mst


def test_transport_box_runs_and_box_rests():
    env = mst.make("UnitreeG1TransportBox-v1", num_envs=2)
    obs, _ = env.reset(seed=0)
    rng = np.random.RandomState(0)
    for _ in range(10):
        obs, rew, term, trunc, info = env.step(env.sample_action(rng) * 0.0)
    z = np.asarray(env._state.sim.free_pose[:, 0, 2])
    # box rests on the source table at its exact height (0.7506)
    np.testing.assert_allclose(z, 0.7506, atol=2e-3)
    assert np.isfinite(np.asarray(obs)).all()
    assert not np.asarray(info["success"]).any()
    assert not np.asarray(info["box_grasped"]).any()


def test_transport_box_staged_reward():
    env = mst.make("UnitreeG1TransportBox-v1", num_envs=1,
                   control_mode="pd_joint_pos")
    env.reset(seed=0)
    names = list(env.model.robot.joint_names)
    ctrl = env.agent._body_joints
    hold = np.array([[env._state.sim.qpos[0, names.index(n)]
                      for n in ctrl]], np.float32)
    obs, r0, *_ = env.step(jnp.asarray(hold))
    # turn the torso toward the box table: stage-1 reward increases
    t_idx = ctrl.index("torso_joint")
    hold2 = hold.copy()
    hold2[0, t_idx] = -1.0
    for _ in range(20):
        obs, r1, *_, info = env.step(jnp.asarray(hold2))
    assert float(r1[0]) > float(r0[0])
    # success metric plumbing
    assert "facing_table_with_box" in info


def test_transport_box_success_on_placed_box():
    env = mst.make("UnitreeG1TransportBox-v1", num_envs=1)
    env.reset(seed=0)
    # teleport the box onto the target table, resting
    sim = env._state.sim
    pose = jnp.array([0.0, 0.66, 0.7506, 1.0, 0, 0, 0])
    env._state = env._state.replace(
        sim=sim.replace(
            free_pose=sim.free_pose.at[:, env.box].set(pose),
            free_vel=sim.free_vel.at[:, env.box].set(jnp.zeros(6)),
        )
    )
    rng = np.random.RandomState(0)
    obs, rew, term, trunc, info = env.step(env.sample_action(rng) * 0.0)
    assert bool(np.asarray(info["success"])[0])
    assert bool(np.asarray(term)[0])
