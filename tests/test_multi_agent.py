"""MultiAgent: several robots in one scene (VERDICT round-2 item 8;
reference mani_skill/agents/multi_agent.py:11)."""
import jax
import numpy as np

import maniskill_tpu as mst


def test_two_robot_env_runs():
    env = mst.make("TwoRobotPushCube-v1", num_envs=2)
    assert env.model.nq == 18 and env.action_dim == 16
    obs, _ = env.reset(seed=0)
    for t in range(5):
        a = np.random.default_rng(t).uniform(
            -1, 1, (2, env.action_dim)).astype(np.float32)
        obs, rew, term, trunc, info = env.step(a)
    assert np.isfinite(np.asarray(obs)).all()
    pro = env.agent.proprioception(env._state.sim.qpos, env._state.sim.qvel)
    assert set(pro) == {"panda-0", "panda-1"}
    assert pro["panda-0"]["qpos"].shape == (2, 9)


def test_agents_act_independently():
    """Commanding only agent 0's action slice must leave agent 1 at rest."""
    env = mst.make("TwoRobotPushCube-v1", num_envs=1)
    env.reset(seed=0)
    q0 = np.asarray(env._state.sim.qpos).copy()
    a = np.zeros((1, env.action_dim), np.float32)
    a[0, :4] = 1.0   # agent 0 arm joints
    a[0, 15] = 1.0   # agent 1 gripper: action +1 = keep open (its rest)
    for _ in range(5):
        env.step(a)
    q1 = np.asarray(env._state.sim.qpos)
    dq = np.abs(q1 - q0)[0]
    assert dq[:9].max() > 0.05, dq[:9]     # agent 0 moved
    assert dq[9:].max() < 5e-3, dq[9:]     # agent 1 held still


def test_cross_robot_collision_candidates_exist():
    """The two robots must have contact candidates against EACH OTHER
    (same-tree self-collision stays off)."""
    from maniskill_tpu.physics.model import BodyKind

    env = mst.make("TwoRobotPushCube-v1", num_envs=1)
    model = env.model
    cross = 0
    for (i, j) in model.pairs:
        gi, gj = model.geoms[i], model.geoms[j]
        if gi.kind == BodyKind.ROBOT_LINK and gj.kind == BodyKind.ROBOT_LINK:
            ti = model.tree_id[gi.body] if gi.body >= 0 else -1
            tj = model.tree_id[gj.body] if gj.body >= 0 else -1
            cross += 1
    assert cross > 0


def test_two_robot_stack_cubes_collide_and_success_semantics():
    """ADVICE r3 (high): the stack task must let cube A rest on cube B
    (no exclude_pair) and success requires BOTH cubes released. Also a
    regression guard for the box-box impact bounce (a dropped cube must
    settle, not launch)."""
    import jax.numpy as jnp

    env = mst.make("TwoRobotStackCube-v1", num_envs=1)
    env.reset(seed=0)
    s = env._state
    ia = env.model.free_index["cube_a"]
    ib = env.model.free_index["cube_b"]
    goal = np.asarray(s.sim.kin_pose[0, env.model.kin_index["goal_region"], :2])
    fp = s.sim.free_pose
    # drop A straight onto B at the goal position
    fp = fp.at[:, ia, :3].set(jnp.asarray([[goal[0], goal[1], 0.075]]))
    fp = fp.at[:, ia, 3:].set(jnp.asarray([[1.0, 0, 0, 0]]))
    fp = fp.at[:, ib, :3].set(jnp.asarray([[goal[0], goal[1], 0.02]]))
    fp = fp.at[:, ib, 3:].set(jnp.asarray([[1.0, 0, 0, 0]]))
    env._state = s.replace(
        sim=s.sim.replace(free_pose=fp, free_vel=s.sim.free_vel * 0.0))
    a = np.zeros((1, env.action_dim), np.float32)
    info = None
    for _ in range(25):
        _, _, _, _, info = env.step(a)
    pa = np.asarray(env._state.sim.free_pose[0, ia, :3])
    pb = np.asarray(env._state.sim.free_pose[0, ib, :3])
    # cube A rests ON cube B (would interpenetrate with the old exclude)
    assert pa[2] > pb[2] + 0.03, (pa, pb)
    assert pb[2] < 0.035, pb  # B still on the table, not launched
    assert bool(np.asarray(info["success"])[0])
    assert not bool(np.asarray(info["is_cubeA_grasped"])[0])
