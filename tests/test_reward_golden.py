"""Golden-value dense-reward tests (VERDICT r4 item 7).

Each test re-derives the REFERENCE's staged dense-reward formula in plain
numpy (coefficients, stage gates, and success clamps transcribed from the
reference source, cited per test) and checks the env's reward on real
rollout states against it. A flipped sign, wrong coefficient, or broken
stage gate in any env's reward shows up as a mismatch here even though the
"runs 5 steps finite" smoke tests would pass.

The grasp / evaluate intermediates (is_grasped, angle_diff, ...) are taken
from the env's own ``evaluate`` — these tests pin the reward STRUCTURE on
top of them; the evaluate semantics have their own teleport tests
(test_task_tail.py, test_envs.py).
"""
import jax
import numpy as np
import pytest

import maniskill_tpu as mst
from maniskill_tpu.envs.base_env import TaskContext


def _states_and_ctx(env_id, n_steps=(0, 3, 8), seed=0, **kwargs):
    """Reset + random-step an env; yield (state, ctx, info, action) at the
    requested step counts (single env)."""
    env = mst.make(env_id, num_envs=1, obs_mode="none", reward_mode="dense",
                   **kwargs)
    env.reset(seed=seed)
    key = jax.random.PRNGKey(seed)
    out = []
    for t in range(max(n_steps) + 1):
        if t in n_steps:
            st = jax.tree.map(lambda x: x[0], env._state)
            ctx = TaskContext(env, st)
            info = env.evaluate(st, ctx)
            action = np.zeros(env.action_dim, np.float32)
            out.append((env, st, ctx, info, action))
        key, k = jax.random.split(key)
        a = jax.random.uniform(k, (1, env.action_dim), minval=-1.0,
                               maxval=1.0)
        env.step(a)
    return out


def _num(x):
    return float(np.asarray(x))


def _vec(x):
    return np.asarray(x, np.float64)


def _reward_of(env, st, ctx, info, action):
    import jax.numpy as jnp

    return _num(env.compute_dense_reward(
        st, jnp.asarray(action), info, ctx))


def test_push_cube_reward_golden():
    """reference push_cube.py:209-232: reach + place*reached, success->3."""
    for env, st, ctx, info, action in _states_and_ctx("PushCube-v1"):
        obj = _vec(ctx.actor_pose("cube").p)
        goal = _vec(ctx.actor_pose("goal_region").p)
        tcp = _vec(ctx.tcp_pose.p)
        push = obj + np.array([-env.cube_half_size - 0.005, 0, 0])
        d = np.linalg.norm(push - tcp)
        expected = 1 - np.tanh(5 * d)
        if d < 0.01:
            expected += 1 - np.tanh(5 * np.linalg.norm(obj[:2] - goal[:2]))
        if _num(info["success"]):
            expected = 3.0
        assert abs(_reward_of(env, st, ctx, info, action) - expected) < 1e-4


def test_pull_cube_reward_golden():
    """reference pull_cube.py: reach(front)+place*reached, success->3."""
    for env, st, ctx, info, action in _states_and_ctx("PullCube-v1"):
        obj = _vec(ctx.actor_pose("cube").p)
        goal = _vec(ctx.actor_pose("goal_region").p)
        tcp = _vec(ctx.tcp_pose.p)
        pull = obj + np.array([env.cube_half_size + 2 * 0.005, 0, 0])
        d = np.linalg.norm(pull - tcp)
        expected = 1 - np.tanh(5 * d)
        if d < 0.01:
            expected += 1 - np.tanh(5 * np.linalg.norm(obj[:2] - goal[:2]))
        if _num(info["success"]):
            expected = 3.0
        assert abs(_reward_of(env, st, ctx, info, action) - expected) < 1e-4


def test_pick_cube_reward_golden():
    """reference pick_cube.py:128-153: reach + grasp + place*grasped +
    static*placed, success->5."""
    for env, st, ctx, info, action in _states_and_ctx("PickCube-v1"):
        obj = _vec(ctx.actor_pose("cube").p)
        goal = _vec(ctx.actor_pose("goal_site").p)
        tcp = _vec(ctx.tcp_pose.p)
        qvel = _vec(st.sim.qvel)
        grasped = _num(info["is_grasped"])
        expected = 1 - np.tanh(5 * np.linalg.norm(obj - tcp))
        expected += grasped
        expected += (1 - np.tanh(5 * np.linalg.norm(goal - obj))) * grasped
        static = 1 - np.tanh(5 * np.linalg.norm(qvel[:-2]))
        expected += static * _num(info["is_obj_placed"])
        if _num(info["success"]):
            expected = 5.0
        assert abs(_reward_of(env, st, ctx, info, action) - expected) < 1e-4


def test_stack_cube_reward_golden():
    """reference stack_cube.py:160-196: 2*reach -> 4+place (grasped) ->
    6+(ungrasp+static)/2 (on top) -> 8 (success)."""
    for env, st, ctx, info, action in _states_and_ctx("StackCube-v1"):
        a_p = _vec(ctx.actor_pose("cubeA").p)
        b_p = _vec(ctx.actor_pose("cubeB").p)
        tcp = _vec(ctx.tcp_pose.p)
        half = env.cube_half_size
        expected = 2 * (1 - np.tanh(5 * np.linalg.norm(tcp - a_p)))
        if _num(info["is_cubeA_grasped"]):
            goal = np.array([b_p[0], b_p[1], b_p[2] + 2 * half])
            expected = 4 + 1 - np.tanh(5 * np.linalg.norm(goal - a_p))
        if _num(info["is_cubeA_on_cubeB"]):
            gw = 2 * 0.04  # panda finger qlim 0.04 * 2 (reference :181)
            ungrasp = (float(np.asarray(st.sim.qpos)[-2:].sum()) / gw
                       if _num(info["is_cubeA_grasped"]) else 1.0)
            vel = _vec(ctx.actor_vel("cubeA"))
            static = 1 - np.tanh(10 * np.linalg.norm(vel[:3])
                                 + np.linalg.norm(vel[3:]))
            expected = 6 + (ungrasp + static) / 2
        if _num(info["success"]):
            expected = 8.0
        assert abs(_reward_of(env, st, ctx, info, action) - expected) < 1e-3


def test_poke_cube_reward_golden():
    """reference poke_cube.py: 2*reach -> 4+close+align (grasped&reached)
    -> 7+place (fit) -> +static (placed), success->10."""
    for env, st, ctx, info, action in _states_and_ctx("PokeCube-v1"):
        tcp = _vec(ctx.tcp_pose.p)
        peg = _vec(ctx.actor_pose("peg").p)
        cube = _vec(ctx.actor_pose("cube").p)
        goal = _vec(ctx.actor_pose("goal_region").p)
        qvel = _vec(st.sim.qvel)
        d = np.linalg.norm(tcp - peg)
        reached = d < 0.01
        expected = 2 * (1 - np.tanh(5 * d))
        grasped = _num(info["is_peg_grasped"]) and reached
        if grasped:
            align = 1 - np.tanh(5 * _num(info["angle_diff"]))
            close = 1 - np.tanh(5 * _num(info["head_to_cube_dist"]))
            expected = 4 + close + align
        if _num(info["is_peg_cube_fit"]) and grasped:
            expected = 7 + 1 - np.tanh(5 * np.linalg.norm(goal - cube))
        if _num(info["is_cube_placed"]):
            expected += 1 - np.tanh(5 * np.linalg.norm(qvel[:-2]))
        if _num(info["success"]):
            expected = 10.0
        assert abs(_reward_of(env, st, ctx, info, action) - expected) < 1e-4


def test_lift_peg_upright_reward_golden():
    """reference lift_peg_upright.py: |x_axis . z| + (1-tanh 5*z_dist) +
    reach/5, success->3."""
    from maniskill_tpu.math.rotations import quat_apply
    import jax.numpy as jnp

    for env, st, ctx, info, action in _states_and_ctx("LiftPegUpright-v1"):
        peg_pose = ctx.actor_pose("peg")
        x_w = _vec(quat_apply(peg_pose.q, jnp.array([1.0, 0, 0])))
        expected = abs(x_w[2])
        z_dist = abs(_vec(peg_pose.p)[2] - env.peg_half_length)
        expected += 1 - np.tanh(5 * z_dist)
        to_grip = np.linalg.norm(_vec(peg_pose.p) - _vec(ctx.tcp_pose.p))
        grasped = _num(env._is_grasping_peg(
            ctx.body_quat, ctx.contact_forces()))
        reaching = 1.0 if grasped else 1 - np.tanh(5 * to_grip)
        expected += reaching / 5
        if _num(info["success"]):
            expected = 3.0
        assert abs(_reward_of(env, st, ctx, info, action) - expected) < 1e-4


def test_roll_ball_reward_golden():
    """reference roll_ball.py: reaching/(reached latch) + 20*reached_rew,
    success->30. The latch (reached_status) is episode state; here we
    recompute it from the env's extras."""
    for env, st, ctx, info, action in _states_and_ctx("RollBall-v1"):
        ball = _vec(ctx.actor_pose("ball").p)
        goal = _vec(ctx.actor_pose("goal_region").p)
        tcp = _vec(ctx.tcp_pose.p)
        unit = ball - goal
        unit = unit / np.linalg.norm(unit)
        hit = ball + unit * (env.ball_radius + 0.05)
        d = np.linalg.norm(hit - tcp)
        reached = _num(st.extras["reached"])
        reaching = 1 - np.tanh(2 * d)
        reached_rew = 1 - np.tanh(np.linalg.norm(ball[:2] - goal[:2]))
        expected = 20 * reached_rew * reached + reaching * (1 - reached) \
            + reached
        if _num(info["success"]):
            expected = 30.0
        assert abs(_reward_of(env, st, ctx, info, action) - expected) < 1e-3


def test_peg_insertion_reward_golden():
    """reference peg_insertion_side.py:300-355: reach+grasp ->
    +3*pre-insertion (grasped) -> +5*insertion (pre-inserted), success->10."""
    for env, st, ctx, info, action in _states_and_ctx("PegInsertionSide-v1"):
        from maniskill_tpu.math.pose import Pose
        import jax.numpy as jnp

        tcp = _vec(ctx.tcp_pose.p)
        peg_pose = ctx.actor_pose("peg")
        tgt = _vec((peg_pose * Pose.create(p=jnp.array([-0.06, 0, 0]))).p)
        reach = 1 - np.tanh(4.0 * np.linalg.norm(tcp - tgt))
        f_pt = ctx.contact_forces()
        grasped = _num(env._is_grasping_peg(ctx.body_quat, f_pt))
        expected = reach + grasped
        goal = env._goal_pose(ctx)
        head = _vec((goal.inv() * env._peg_head_pose(ctx)).p)
        center = _vec((goal.inv() * peg_pose).p)
        d_head = np.linalg.norm(head[1:])
        d_center = np.linalg.norm(center[1:])
        pre = 3 * (1 - np.tanh(0.5 * (d_head + d_center)
                               + 4.5 * max(d_head, d_center)))
        expected += pre * grasped
        pre_inserted = (d_head < 0.01) and (d_center < 0.01)
        head_in = _vec((env._box_hole_pose(ctx).inv()
                        * env._peg_head_pose(ctx)).p)
        if grasped and pre_inserted:
            expected += 5 * (1 - np.tanh(5 * np.linalg.norm(head_in)))
        if _num(info["success"]):
            expected = 10.0
        assert abs(_reward_of(env, st, ctx, info, action) - expected) < 1e-3


def test_pull_cube_tool_reward_golden():
    """reference pull_cube_tool.py:~compute_dense_reward: 2*reach + 2*grasp
    + 1.5*positioning*grasp + 3*progress*positioned*grasp - 2*pushed_away
    + 5*success."""
    for env, st, ctx, info, action in _states_and_ctx("PullCubeTool-v1"):
        tcp = _vec(ctx.tcp_pose.p)
        cube = _vec(ctx.actor_pose("cube").p)
        tool = _vec(ctx.actor_pose("l_shape_tool").p)
        base = np.append(np.asarray(env._base_xy, np.float64), 0.0)
        grasp_pos = tool + np.array([0.02, 0, 0])
        reach = 2 * (1 - np.tanh(5 * np.linalg.norm(tcp - grasp_pos)))
        grasping = _num(env._is_grasping_tool(
            ctx.body_quat, ctx.contact_forces()))
        expected = reach + 2 * grasping
        ideal = cube + np.array(
            [-(env.hook_length + env.cube_half), -0.067, 0])
        pos_dist = np.linalg.norm(tool - ideal)
        positioned = pos_dist < 0.05
        positioning = 1.5 * (1 - np.tanh(3 * pos_dist))
        target = base + np.array([0.05, 0, 0])
        d_ws = np.linalg.norm(cube - target)
        initial = np.linalg.norm(
            np.array([env.arm_reach + 0.1, 0, env.cube_half]) - target)
        progress = (initial - d_ws) / initial
        expected += (positioning + 3 * progress * positioned) * grasping
        if cube[0] > env.arm_reach + 0.15:
            expected -= 2.0
        if _num(info["success"]):
            expected += 5.0
        assert abs(_reward_of(env, st, ctx, info, action) - expected) < 1e-3


def test_pick_single_hull_reward_golden():
    """reference pick_single_ycb.py:238-262 (NOT PickCube's formula):
    reach + grasped + place*grasped + placed*grasped +
    static*placed*grasped, success -> 6."""
    for env, st, ctx, info, action in _states_and_ctx("PickSingleHull-v1"):
        tcp = _vec(ctx.tcp_pose.p)
        obj = _vec(ctx.actor_pose("cube").p)
        goal = _vec(ctx.actor_pose("goal_site").p)
        grasped = _num(info["is_grasped"])
        expected = 1 - np.tanh(5 * np.linalg.norm(obj - tcp))
        expected += grasped
        expected += (1 - np.tanh(5 * np.linalg.norm(goal - obj))) * grasped
        placed = _num(info["is_obj_placed"])
        expected += placed * grasped
        qvel_arm = _vec(st.sim.qvel[:-2])
        expected += (1 - np.tanh(5 * np.linalg.norm(qvel_arm))) * (
            placed * grasped)
        if _num(info["success"]):
            expected = 6.0
        assert abs(_reward_of(env, st, ctx, info, action) - expected) < 1e-3
