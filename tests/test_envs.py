"""Env API tests — mirrors the reference test matrix
(``tests/test_envs.py``: instantiate + N random steps, obs-space agreement,
seeded-reset determinism, state round-trips, partial reset)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import maniskill_tpu as mst

ENV_IDS = ["PushCube-v1", "PickCube-v1", "StackCube-v1", "PullCube-v1"]


@pytest.fixture(scope="module", params=ENV_IDS)
def env4(request):
    return mst.make(request.param, num_envs=4)


def random_actions(env, seed=0, n=3):
    rng = np.random.RandomState(seed)
    return [
        rng.uniform(-1, 1, (env.num_envs, env.action_dim)).astype(np.float32)
        for _ in range(n)
    ]


def test_env_runs_random_steps(env4):
    obs, info = env4.reset(seed=0)
    assert obs.shape[0] == 4
    for a in random_actions(env4):
        obs, rew, term, trunc, info = env4.step(a)
        assert obs.shape[0] == 4
        assert rew.shape == (4,)
        assert bool(jnp.isfinite(obs).all())
        assert bool(jnp.isfinite(rew).all())


def test_seeded_reset_deterministic(env4):
    """Same seed ⇒ identical obs (reference test_env_seeded_reset :151)."""
    obs1, _ = env4.reset(seed=2022)
    obs2, _ = env4.reset(seed=2022)
    assert np.array_equal(np.asarray(obs1), np.asarray(obs2))
    obs3, _ = env4.reset(seed=2023)
    assert not np.array_equal(np.asarray(obs1), np.asarray(obs3))


def test_seeded_sequence_deterministic(env4):
    """Same seed ⇒ identical trajectories under the same actions."""
    acts = random_actions(env4, seed=1)
    env4.reset(seed=5)
    tr1 = [np.asarray(env4.step(a)[0]) for a in acts]
    env4.reset(seed=5)
    tr2 = [np.asarray(env4.step(a)[0]) for a in acts]
    for a, b in zip(tr1, tr2):
        assert np.array_equal(a, b)


def test_partial_reset(env4):
    obs0, _ = env4.reset(seed=11)
    for a in random_actions(env4, seed=2, n=2):
        env4.step(a)
    stepped = np.asarray(env4._state.sim.qpos).copy()
    env4.reset(seed=12, options={"env_idx": [1, 3]})
    after = np.asarray(env4._state.sim.qpos)
    # envs 0, 2 untouched; 1, 3 reinitialized
    assert np.array_equal(after[0], stepped[0])
    assert np.array_equal(after[2], stepped[2])
    assert not np.array_equal(after[1], stepped[1])
    el = np.asarray(env4._state.elapsed_steps)
    assert el[0] == 2 and el[1] == 0


def test_state_dict_roundtrip(env4):
    """set_state_dict restores exact behavior (reference
    tests/test_sim_state.py contract)."""
    env4.reset(seed=3)
    sd = jax.tree.map(np.asarray, env4.get_state_dict())
    a = random_actions(env4, seed=3, n=1)[0]
    obs_a = np.asarray(env4.step(a)[0])
    env4.set_state_dict(sd)
    obs_b = np.asarray(env4.step(a)[0])
    assert np.allclose(obs_a, obs_b, atol=1e-6)


def test_state_dict_shapes(env4):
    env4.reset(seed=0)
    sd = env4.get_state_dict()
    for name, v in sd["actors"].items():
        assert v.shape == (4, 13)
    for name, v in sd["articulations"].items():
        assert v.shape == (4, 13 + 2 * env4.model.nq)


def test_obs_modes():
    for mode in ["state", "state_dict", "none"]:
        env = mst.make("PushCube-v1", num_envs=2, obs_mode=mode)
        obs, _ = env.reset(seed=0)
        if mode == "state":
            assert obs.ndim == 2
        elif mode == "state_dict":
            assert "agent" in obs and "extra" in obs
        else:
            assert obs.shape[-1] == 0


def test_reward_modes():
    for mode in ["dense", "normalized_dense", "sparse", "none"]:
        env = mst.make("PushCube-v1", num_envs=2, reward_mode=mode)
        env.reset(seed=0)
        obs, rew, *_ = env.step(np.zeros((2, env.action_dim), np.float32))
        assert rew.shape == (2,)
        if mode == "normalized_dense":
            assert float(jnp.abs(rew).max()) <= 1.0


def test_control_modes():
    for cm in ["pd_joint_delta_pos", "pd_joint_pos", "pd_ee_delta_pos",
               "pd_ee_delta_pose", "pd_joint_vel", "pd_joint_pos_vel",
               "pd_joint_delta_pos_vel"]:
        env = mst.make("PushCube-v1", num_envs=2, control_mode=cm)
        env.reset(seed=0)
        obs, rew, *_ = env.step(np.zeros((2, env.action_dim), np.float32))
        assert bool(jnp.isfinite(obs).all()), cm


def test_pos_vel_controller_tracks_velocity_target():
    """pd_joint_delta_pos_vel: zero position delta + a velocity target on
    joint 0 makes the joint move in the commanded direction (the velocity
    half reaches the drive), while zeroed velocity targets hold still."""
    env = mst.make("PushCube-v1", num_envs=1,
                   control_mode="pd_joint_delta_pos_vel")
    env.reset(seed=0)
    q0 = float(np.asarray(env._state.sim.qpos[0, 0]))
    a = np.zeros((1, env.action_dim), np.float32)
    a[0, 7] = 1.0  # qvel target for joint 0 (scaled to vel_upper = 1 rad/s)
    for _ in range(5):
        env.step(a)
    q1 = float(np.asarray(env._state.sim.qpos[0, 0]))
    assert q1 - q0 > 0.05, (q0, q1)  # moved with the velocity command
    env.reset(seed=0)
    a = np.zeros((1, env.action_dim), np.float32)
    for _ in range(5):
        env.step(a)
    q2 = float(np.asarray(env._state.sim.qpos[0, 0]))
    assert abs(q2 - q0) < 0.02, (q0, q2)  # zero targets hold position


def test_truncation():
    env = mst.make("PushCube-v1", num_envs=2)
    env.reset(seed=0)
    a = np.zeros((2, env.action_dim), np.float32)
    for i in range(50):
        obs, rew, term, trunc, info = env.step(a)
    assert bool(np.asarray(trunc).all())


def test_nan_action_isolated():
    """A NaN action corrupts nothing (sanitized), unlike reference which
    rejects on CPU only (base_agent.py:321-323)."""
    env = mst.make("PushCube-v1", num_envs=2)
    env.reset(seed=0)
    a = np.zeros((2, env.action_dim), np.float32)
    a[0, 0] = np.nan
    obs, *_ = env.step(a)
    assert bool(jnp.isfinite(obs).all())


@pytest.mark.slow  # one build+compile per registered env (51 envs)
def test_all_registered_envs_run():
    """Every registered env instantiates and survives 5 random steps with
    finite obs/rewards (reference test_envs.py:21-137 runs every env x obs
    mode x 5 steps; the obs-mode axis runs on PushCube/PickCube below)."""
    import maniskill_tpu as mst

    rng = np.random.RandomState(0)
    for eid in sorted(mst.REGISTERED_ENVS):
        env = mst.make(eid, num_envs=2)
        obs, _ = env.reset(seed=0)
        for _ in range(5):
            a = rng.uniform(-1, 1, (2, env.action_dim)).astype(np.float32)
            obs, rew, term, trunc, info = env.step(a)
        assert bool(jnp.isfinite(jnp.asarray(obs)).all()), eid
        assert bool(jnp.isfinite(jnp.asarray(rew)).all()), eid
        # partial reset of env 0 only
        obs, _ = env.reset(options=dict(env_idx=np.array([0])))
        assert bool(jnp.isfinite(jnp.asarray(obs)).all()), eid


@pytest.mark.parametrize("env_id", ["PushCube-v1", "PickCube-v1"])
@pytest.mark.parametrize(
    "obs_mode", ["state", "state_dict", "none", "depth", "pointcloud",
                 "sensor_data"]
)
def test_obs_mode_matrix(env_id, obs_mode):
    """Env x obs-mode matrix, 3 steps each (reference test_envs.py:21-137
    OBS_MODES axis)."""
    import maniskill_tpu as mst

    env = mst.make(env_id, num_envs=2, obs_mode=obs_mode)
    obs, _ = env.reset(seed=0)
    for t in range(3):
        a = np.random.RandomState(t).uniform(
            -1, 1, (2, env.action_dim)).astype(np.float32)
        obs, rew, term, trunc, info = env.step(a)
    leaves = jax.tree_util.tree_leaves(obs)
    assert all(
        bool(jnp.isfinite(jnp.asarray(l)).all())
        for l in leaves
        if jnp.asarray(l).dtype.kind == "f"
    ), (env_id, obs_mode)


def test_scene_builder_registry():
    """Scene builders register by name and swap into tasks (reference
    utils/scene_builder registration framework)."""
    from maniskill_tpu.envs.scene_builders import REGISTERED_SCENE_BUILDERS

    assert {"table", "ground", "kitchen_counter"} <= set(
        REGISTERED_SCENE_BUILDERS)
    import maniskill_tpu as mst

    env = mst.make("PushCubeKitchen-v1", num_envs=2)
    obs, _ = env.reset(seed=0)
    a = np.random.RandomState(0).uniform(
        -1, 1, (2, env.action_dim)).astype(np.float32)
    obs, rew, term, trunc, info = env.step(a)
    assert bool(jnp.isfinite(jnp.asarray(obs)).all())


def test_link_view_api():
    """Per-link struct view (reference utils/structs/link.py surface)."""
    import jax as _jax

    from maniskill_tpu.envs.base_env import TaskContext

    env = mst.make("PushCube-v1", num_envs=1)
    env.reset(seed=0)
    st = _jax.tree.map(lambda x: x[0], env._state)
    ctx = TaskContext(env, st)
    link = ctx.link(env.agent.ee_link_name)
    p = np.asarray(link.pose.p)
    assert p.shape == (3,) and np.all(np.isfinite(p))
    lv = np.asarray(link.linear_velocity)
    av = np.asarray(link.angular_velocity)
    assert lv.shape == (3,) and av.shape == (3,)
    half = link.collision_aabb_half()
    assert half.shape == (3,)
