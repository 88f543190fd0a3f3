"""MJCF loader + control-suite locomotion envs (VERDICT round-2 item 5)."""
import jax.numpy as jnp
import numpy as np
import pytest

import maniskill_tpu as mst
from maniskill_tpu.kinematics.mjcf import load_mjcf
from maniskill_tpu.utils.assets import ASSET_DIR

pytestmark = pytest.mark.slow  # long locomotion rollouts


def test_mjcf_hopper_structure():
    m = load_mjcf(str(ASSET_DIR / "control/hopper.xml"))
    s = m.spec
    assert s.nb == 7  # rootx, rootz, rooty(torso), pelvis, thigh, calf, heel
    assert s.joint_names[3:] == ["waist", "hip", "knee", "ankle"]
    # degrees converted: waist range ±30° -> ±0.524 rad
    np.testing.assert_allclose(s.qlim[3], [-0.5236, 0.5236], atol=1e-3)
    # root joints unlimited, undamped, no armature
    assert s.qlim[0, 1] > 1e5 and s.joint_damping[0] == 0.0
    assert s.armature[3] == pytest.approx(0.2)
    # masses from geom volume x density (torso capsule ~4.8 kg at rho=1000)
    assert 3.0 < s.mass[2] < 7.0
    assert [a["joint"] for a in m.actuators] == [
        "waist", "hip", "knee", "ankle"]
    assert m.actuators[1]["gear"] == 40.0
    # the welded foot_toe was fused into foot_heel
    assert "foot_toe" not in s.link_index or (
        s.link_index["foot_toe"] == s.link_index["foot_heel"])
    assert any(g["type"] == "plane" for g in m.world_geoms)


def test_mjcf_ant_freejoint_expansion():
    m = load_mjcf(str(ASSET_DIR / "control/ant.xml"))
    s = m.spec
    assert s.nb == 14  # 6 root dofs + 4x(hip, ankle)
    assert sum("root" in n for n in s.joint_names) == 6
    # chain intermediates carry (regularizing) near-zero mass
    assert s.mass[0] < 1e-3 and s.mass[5] > 0.1


@pytest.mark.parametrize(
    "env_id", ["MS-HopperStand-v1", "MS-HopperHop-v1", "MS-AntWalk-v1",
               "MS-AntRun-v1", "MS-HumanoidStand-v1", "MS-HumanoidWalk-v1"]
)
def test_control_env_random_steps(env_id):
    env = mst.make(env_id, num_envs=2)
    obs, info = env.reset(seed=0)
    for t in range(8):
        a = np.random.default_rng(t).uniform(
            -1, 1, (2, env.action_dim)).astype(np.float32)
        obs, rew, term, trunc, si = env.step(a)
        assert np.isfinite(np.asarray(obs)).all(), (env_id, t)
        r = np.asarray(rew)
        assert np.all(r >= -1e-6) and np.all(r <= 1.0 + 1e-6), (env_id, r)


def test_hopper_stand_reward_when_upright():
    env = mst.make("MS-HopperStand-v1", num_envs=2)
    env.reset(seed=0)
    st = env._state
    st = st.replace(sim=st.sim.replace(
        qpos=jnp.zeros_like(st.sim.qpos),
        qvel=jnp.zeros_like(st.sim.qvel)))
    env._state = st
    obs, rew, term, trunc, si = env.step(
        np.zeros((2, env.action_dim), np.float32))
    assert np.all(np.asarray(rew) > 0.9), np.asarray(rew)


def test_humanoid_head_height_and_upright():
    import jax
    from maniskill_tpu.envs.base_env import TaskContext

    env = mst.make("MS-HumanoidStand-v1", num_envs=1)
    env.reset(seed=0)
    ctx = TaskContext(env, jax.tree.map(lambda x: x[0], env._state))
    h = float(env._head_height(ctx))
    assert 1.2 < h < 1.6, h  # spawned standing
    u = float(env._torso_upright(ctx))
    assert u > 0.9, u
