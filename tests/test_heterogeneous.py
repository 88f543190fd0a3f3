"""Heterogeneous batches phase 2: per-env free-body mass/inertia as state
(VERDICT round-2 item 4; reference PickSingleYCB per-scene variation,
pick_single_ycb.py:28,81-124)."""
import jax
import jax.numpy as jnp
import numpy as np

import maniskill_tpu as mst


def test_pick_single_object_samples_per_env():
    env = mst.make("PickSingleObject-v1", num_envs=4)
    env.reset(seed=0)
    gidx = env.model.geom_indices("cube")[0]
    halves = np.asarray(env._state.sim.geom_size[:, gidx])
    masses = np.asarray(env._state.sim.free_mass[:, 0])
    assert len(np.unique(halves[:, 2].round(5))) > 1
    assert len(np.unique(masses.round(5))) > 1
    for t in range(4):
        a = np.random.default_rng(t).uniform(
            -1, 1, (4, env.action_dim)).astype(np.float32)
        obs, rew, *_ = env.step(a)
    assert np.isfinite(np.asarray(obs)).all()
    # each object rests at its own half height
    z = np.asarray(env._state.sim.free_pose[:, 0, 2])
    np.testing.assert_allclose(z, halves[:, 2], atol=2e-3)


def test_reconfiguration_freq_keeps_object_across_resets():
    env = mst.make("PickSingleObject-v1", num_envs=2,
                   reconfiguration_freq=100)
    env.reset(seed=0)
    gidx = env.model.geom_indices("cube")[0]
    h0 = np.asarray(env._state.sim.geom_size[:, gidx])
    env.reset()  # episode 2: same object (freq=100)
    h1 = np.asarray(env._state.sim.geom_size[:, gidx])
    np.testing.assert_allclose(h0, h1)


def test_per_env_inertia_drives_gyroscopics():
    """Per-env free_inertia must be LIVE state: a tumbling body with
    asymmetric inertia precesses (gyro torque ω x Iω != 0) while an
    isotropic one spins steadily — same initial ω, different envs."""
    env = mst.make("PickCube-v1", num_envs=2)
    env.reset(seed=0)
    st = env._state
    iso = 1e-4 * jnp.eye(3)
    aniso = jnp.diag(jnp.asarray([1e-4, 4e-4, 9e-4]))
    fp = st.sim.free_pose.at[:, 0, 2].set(0.5)  # mid-air, no contacts
    fv = st.sim.free_vel.at[:, 0, 3:].set(jnp.asarray([3.0, 3.0, 0.0]))
    sim = st.sim.replace(
        free_pose=fp, free_vel=fv,
        free_inertia=jnp.stack([iso[None], aniso[None]]),
    )
    env._state = st.replace(sim=sim)
    a = np.zeros((2, env.action_dim), np.float32)
    for _ in range(5):
        env.step(a)
    w = np.asarray(env._state.sim.free_vel[:, 0, 3:])
    # isotropic: ω unchanged; anisotropic: precession changed ω direction
    assert np.allclose(w[0], [3.0, 3.0, 0.0], atol=5e-2), w[0]
    assert np.abs(w[1] - np.array([3.0, 3.0, 0.0])).max() > 0.3, w[1]
