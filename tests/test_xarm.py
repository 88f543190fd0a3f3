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


def test_rotate_cube_in_hand_rests():
    """The cube must settle into the allegro cradle and survive small
    finger motions (also regression for the swapped-pair narrowphase fix:
    box-capsule pairs previously called capsule_box with reversed args)."""
    env = mst.make("RotateCubeInHandAllegro-v1", num_envs=2)
    env.reset(seed=0)
    a = np.zeros((2, env.action_dim), np.float32)
    for _ in range(25):
        obs, rew, term, trunc, info = env.step(a)
    assert not np.asarray(info["fail"]).any()
    z = np.asarray(env._state.sim.free_pose[:, 0, 2])
    assert np.all(z > 0.2)


def test_cum_angle_tracks_rotation():
    import jax.numpy as jnp

    env = mst.make("RotateCubeInHandAllegro-v1", num_envs=1)
    env.reset(seed=0)
    st = env._state
    # free-flying cube spinning about +z (no contact: angle integrates)
    fp = st.sim.free_pose.at[:, 0, 2].set(0.6)
    fv = st.sim.free_vel.at[:, 0, 5].set(2.0)
    env._state = st.replace(sim=st.sim.replace(free_pose=fp, free_vel=fv))
    for _ in range(4):
        obs, rew, term, trunc, info = env.step(
            np.zeros((1, env.action_dim), np.float32))
    # ~2 rad/s * 0.05 s * 4 steps = 0.4 rad accumulated
    assert float(np.asarray(info["cum_angle"])[0]) > 0.25


def test_floating_panda_gripper():
    """Floating Panda gripper: 6-dof position-controlled root chain +
    fingers, hand frames intact (reference robots/floating_panda_gripper)."""
    import jax
    import jax.numpy as jnp
    from maniskill_tpu.physics.model import (
        SceneSpecBuilder, SimParams, plane_geom)
    from maniskill_tpu.physics.engine import make_step_fn, robot_fk, \
        robot_frame_pose

    a = REGISTERED_AGENTS["floating_panda_gripper"](control_mode=None)
    assert a.nq == 8 and a.controller.action_dim == 7
    b = SceneSpecBuilder(SimParams(dt=0.01))
    a.install(b, np.array([0, 0, 0, 1, 0, 0, 0], np.float32))
    b.add_static_body("ground", np.array([0, 0, 0, 1, 0, 0, 0], np.float32),
                      [plane_geom()])
    model = b.build()
    step = make_step_fn(model)
    st = model.initial_state()
    cmd = a.controller.reset(st.qpos)
    sf = jax.jit(lambda s, c: step(s, c, 5))
    for _ in range(20):
        st = sf(st, cmd)
    # the floating root PD holds the keyframe hover pose against gravity
    assert abs(float(st.qpos[2]) - 0.3) < 1e-2
    bp, bq, ax = robot_fk(model, st.qpos)
    p, q = robot_frame_pose(model, bp, bq, "panda_hand_tcp")
    assert 0.05 < float(p[2]) < 0.15  # fingers-down tcp under the hand


def test_xarm7_ability_pushcube_runs():
    """xArm7 + Ability right hand (17 dof) drives PushCube without NaNs and
    with the full arm+hand action space."""
    env = mst.make("PushCube-v1", num_envs=2, robot_uids="xarm7_ability")
    env.reset(seed=0)
    assert env.model.nq == 17
    assert env.action_dim == 17
    rng = np.random.default_rng(0)
    for _ in range(4):
        a = rng.uniform(-1, 1, (2, env.action_dim)).astype(np.float32)
        obs, rew, term, trunc, info = env.step(a)
    assert np.isfinite(np.asarray(rew)).all()
    assert np.isfinite(np.asarray(env._state.sim.qpos)).all()
