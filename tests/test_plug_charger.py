"""PlugCharger-v1: fine-tolerance insertion task.

Mirrors the reference task contract (mani_skill/envs/tasks/tabletop/
plug_charger.py): a two-pronged charger inserted into a wall receptacle,
success = charger pose within 5 mm / 0.2 rad of the inserted goal pose.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import maniskill_tpu as mst


@pytest.fixture(scope="module")
def env():
    return mst.make("PlugCharger-v1", num_envs=2)


def test_random_actions_finite(env):
    obs, _ = env.reset(seed=0)
    rng = np.random.default_rng(0)
    for _ in range(5):
        a = rng.uniform(-1, 1, (2, env.action_dim)).astype(np.float32)
        obs, rew, term, trunc, info = env.step(a)
    assert np.isfinite(np.asarray(rew)).all()
    assert np.isfinite(np.asarray(obs)).all()
    assert not np.asarray(info["success"]).any()  # random flailing can't plug
    s = env._state.sim
    assert np.isfinite(np.asarray(s.free_pose)).all()


def test_inserted_goal_pose_is_stable_and_successful(env):
    """Teleport the charger to the goal pose: the prongs must rest in the
    receptacle slots (wedge contact manifold) and evaluate() must report
    success after the state settles — i.e. the goal pose is physically
    consistent with the receptacle geometry."""
    env.reset(seed=0)
    gp = jnp.asarray(env._goal_pose)
    st = env._state
    sim = st.sim.replace(
        free_pose=st.sim.free_pose.at[:, env.charger].set(gp),
        free_vel=st.sim.free_vel * 0.0,
        contact_lam=st.sim.contact_lam * 0.0,
        contact_lam_t=st.sim.contact_lam_t * 0.0,
    )
    env._state = st.replace(sim=sim)
    for _ in range(8):
        obs, rew, term, trunc, info = env.step(
            np.zeros((2, env.action_dim), np.float32))
    assert np.asarray(info["success"]).all(), (
        np.asarray(info["obj_to_goal_dist"]),
        np.asarray(info["obj_to_goal_angle"]))
    # settled, not drifting
    vel = np.asarray(env._state.sim.free_vel[:, env.charger])
    assert np.all(np.abs(vel[:, :3]) < 0.05), vel


def test_charger_rests_on_table(env):
    """After reset the charger lies on the tabletop in front of the robot,
    not inside the receptacle."""
    env.reset(seed=1)
    p = np.asarray(env._state.sim.free_pose[:, env.charger, :3])
    assert np.all(p[:, 2] < 0.05), p  # on the table, below the receptacle
    assert np.all(p[:, 0] < 0.0), p  # spawn region is behind the wall
    d = np.asarray(env._goal_pose)[:3] - p
    assert np.all(np.linalg.norm(d, axis=-1) > 0.05)
