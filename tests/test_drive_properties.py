"""Runtime joint drive properties (reference parity:
ArticulationJoint.set_drive_property, articulation_joint.py:25)."""
import jax.numpy as jnp
import numpy as np

import maniskill_tpu as mst


def test_set_drive_properties_changes_behavior():
    env = mst.make("PickCube-v1", num_envs=2, control_mode="pd_joint_pos")
    env.reset(seed=0)
    q0 = np.asarray(env._state.sim.qpos)
    hold = q0[:, :8].copy()
    hold[:, 1] += 0.4  # command a shoulder move
    # env 1 gets its arm drives zeroed -> it cannot track the target
    env.set_drive_properties(stiffness=0.0, damping=0.0,
                             env_idx=np.array([1]))
    for _ in range(20):
        env.step(jnp.asarray(hold))
    q = np.asarray(env._state.sim.qpos)
    err = np.abs(q[:, 1] - hold[:, 1])
    assert err[0] < 0.1, err          # driven env tracks
    assert err[1] > 3 * err[0], err   # un-driven env lags far behind


def test_reset_restores_config_gains():
    env = mst.make("PickCube-v1", num_envs=1)
    env.reset(seed=0)
    kp0 = np.asarray(env._state.cmd.kp).copy()
    env.set_drive_properties(stiffness=5.0)
    assert np.allclose(np.asarray(env._state.cmd.kp), 5.0)
    env.reset(seed=1)
    np.testing.assert_allclose(np.asarray(env._state.cmd.kp), kp0)


def test_joint_subset_targeting():
    env = mst.make("PickCube-v1", num_envs=1)
    env.reset(seed=0)
    names = list(env.model.robot.joint_names)
    kp0 = np.asarray(env._state.cmd.kp).copy()
    env.set_drive_properties(stiffness=123.0, joint_names=[names[2]])
    kp = np.asarray(env._state.cmd.kp)
    assert kp[0, 2] == 123.0
    mask = np.ones_like(kp0, bool)
    mask[0, 2] = False
    np.testing.assert_allclose(kp[mask], kp0[mask])
