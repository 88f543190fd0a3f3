"""Scripted task solutions for demo generation.

The TPU-native analogue of the reference's motion-planning solution scripts
(``mani_skill/examples/motionplanning/panda/solutions/``): closed-loop
Cartesian servo policies under ``pd_ee_delta_pos`` that solve tasks from
state, used to generate demonstration trajectories (pair with
``maniskill_tpu.trajectory.RecordEpisode``).

All solutions run on the batched env: every sub-env is solved simultaneously.
"""
from __future__ import annotations

from typing import Tuple

import jax
import numpy as np

from ...envs.base_env import TaskContext


def _tcp_and_actor(env, actor: str) -> Tuple[np.ndarray, np.ndarray]:
    s = env._state
    tcp = np.asarray(jax.vmap(lambda st: TaskContext(env, st).tcp_pose.p)(s))
    idx = env.model.free_index[actor]
    pos = np.asarray(s.sim.free_pose[:, idx, :3])
    return tcp, pos


def _servo(env, target_fn, steps: int, gain: float = 3.0, grip: float = 1.0,
           recorder=None, clip: float = 0.4):
    stepper = recorder if recorder is not None else env
    B = env.num_envs
    for _ in range(steps):
        tcp, obj = _tcp_and_actor(env, target_fn.__defaults__[0] if False else "cube")
        tgt = target_fn(tcp, obj)
        a = np.zeros((B, env.action_dim), np.float32)
        a[:, :3] = np.clip((tgt - tcp) * gain, -clip, clip)
        a[:, 3] = grip
        stepper.step(a)


def solve_pick_cube(env, recorder=None, lift_height: float = 0.25):
    """Closed-loop pick-and-lift for PickCube-v1 (pd_ee_delta_pos):
    hover → descend → close → move to goal. Returns final success mask."""
    assert env.control_mode == "pd_ee_delta_pos"
    stepper = recorder if recorder is not None else env
    B = env.num_envs

    def act(dxyz, grip):
        a = np.zeros((B, env.action_dim), np.float32)
        a[:, :3] = dxyz
        a[:, 3] = grip
        return stepper.step(a)

    def servo(target_fn, steps, gain=3.0, grip=1.0):
        out = None
        for _ in range(steps):
            tcp, cube = _tcp_and_actor(env, "cube")
            tgt = target_fn(tcp, cube)
            out = act(np.clip((tgt - tcp) * gain, -0.4, 0.4), grip)
        return out

    # 1) hover above the cube
    servo(lambda tcp, cube: np.concatenate(
        [cube[:, :2], np.full((B, 1), 0.10)], axis=1), steps=30)
    # 2) descend to grasp height (closed loop compensates tracking error)
    servo(lambda tcp, cube: np.concatenate(
        [cube[:, :2], np.full((B, 1), 0.05)], axis=1), steps=25)
    servo(lambda tcp, cube: np.concatenate(
        [cube[:, :2], np.full((B, 1), 0.022)], axis=1), steps=25, gain=2.0)
    # 3) close the gripper
    out = None
    for _ in range(8):
        out = act(np.zeros((B, 3), np.float32), grip=-1.0)
    # 4) carry to the goal site (track the cube onto the goal, then settle)
    goal = np.asarray(env._state.sim.kin_pose[:, env.model.kin_index["goal_site"], :3])
    for _ in range(60):
        tcp, cube = _tcp_and_actor(env, "cube")
        out = act(np.clip((goal - cube) * 3.0, -0.4, 0.4), grip=-1.0)
    # settle: hold position so the arm becomes static (success requires
    # qvel < 0.2, reference pick_cube.py:119)
    for _ in range(6):
        out = act(np.zeros((B, 3), np.float32), grip=-1.0)
    info = out[-1]
    return np.asarray(info.get("success"))


def solve_push_cube(env, recorder=None):
    """Closed-loop push for PushCube-v1: get behind the cube, push forward."""
    assert env.control_mode == "pd_ee_delta_pos"
    stepper = recorder if recorder is not None else env
    B = env.num_envs

    def act(dxyz, grip=-1.0):
        a = np.zeros((B, env.action_dim), np.float32)
        a[:, :3] = dxyz
        a[:, 3] = grip
        return stepper.step(a)

    out = None
    # behind and above the cube
    for _ in range(14):
        tcp, cube = _tcp_and_actor(env, "cube")
        tgt = cube + np.array([-0.06, 0.0, 0.06])
        out = act(np.clip((tgt - tcp) * 3.0, -0.4, 0.4))
    # drop behind it
    for _ in range(8):
        tcp, cube = _tcp_and_actor(env, "cube")
        tgt = np.concatenate([cube[:, :2] + [-0.055, 0.0], np.full((B, 1), 0.02)], 1)
        out = act(np.clip((tgt - tcp) * 3.0, -0.4, 0.4))
    # push toward the goal
    goal = np.asarray(
        env._state.sim.kin_pose[:, env.model.kin_index["goal_region"], :3]
    )
    for _ in range(22):
        tcp, cube = _tcp_and_actor(env, "cube")
        direction = goal[:, :2] - cube[:, :2]
        n = np.linalg.norm(direction, axis=1, keepdims=True).clip(1e-6)
        tgt_xy = cube[:, :2] - direction / n * 0.045
        tgt = np.concatenate([tgt_xy + direction * 0.6, np.full((B, 1), 0.02)], 1)
        out = act(np.clip((tgt - tcp) * 3.0, -0.3, 0.3))
    info = out[-1]
    return np.asarray(info.get("success"))


def solve_pull_cube(env, recorder=None):
    """Closed-loop pull for PullCube-v1: hook the far side of the cube and
    drag it back to the goal region (reference solutions/pull_cube.py)."""
    assert env.control_mode == "pd_ee_delta_pos"
    stepper = recorder if recorder is not None else env
    B = env.num_envs

    def act(dxyz, grip=-1.0):
        a = np.zeros((B, env.action_dim), np.float32)
        a[:, :3] = dxyz
        a[:, 3] = grip
        return stepper.step(a)

    out = None
    goal = np.asarray(
        env._state.sim.kin_pose[:, env.model.kin_index["goal_region"], :3]
    )
    # above the far side (away from the goal)
    for _ in range(30):
        tcp, cube = _tcp_and_actor(env, "cube")
        d = cube[:, :2] - goal[:, :2]
        n = np.linalg.norm(d, axis=1, keepdims=True).clip(1e-6)
        tgt = np.concatenate([cube[:, :2] + d / n * 0.06,
                              np.full((B, 1), 0.08)], 1)
        out = act(np.clip((tgt - tcp) * 3.0, -0.4, 0.4))
    # drop to table height beyond the cube
    for _ in range(14):
        tcp, cube = _tcp_and_actor(env, "cube")
        d = cube[:, :2] - goal[:, :2]
        n = np.linalg.norm(d, axis=1, keepdims=True).clip(1e-6)
        tgt = np.concatenate([cube[:, :2] + d / n * 0.05,
                              np.full((B, 1), 0.02)], 1)
        out = act(np.clip((tgt - tcp) * 3.0, -0.4, 0.4))
    # drag toward the goal
    for _ in range(40):
        tcp, cube = _tcp_and_actor(env, "cube")
        d = goal[:, :2] - cube[:, :2]
        tgt = np.concatenate([cube[:, :2] + d * 0.8,
                              np.full((B, 1), 0.02)], 1)
        out = act(np.clip((tgt - tcp) * 2.5, -0.3, 0.3))
    info = out[-1]
    return np.asarray(info.get("success"))


def solve_stack_cube(env, recorder=None):
    """Pick cube A, place it on cube B, release and retreat (reference
    solutions/stack_cube.py)."""
    assert env.control_mode == "pd_ee_delta_pos"
    stepper = recorder if recorder is not None else env
    B = env.num_envs

    def act(dxyz, grip):
        a = np.zeros((B, env.action_dim), np.float32)
        a[:, :3] = dxyz
        a[:, 3] = grip
        return stepper.step(a)

    def servo_xyz(name, xy_of, z, steps, gain=3.0, grip=1.0, clip=0.4):
        out = None
        for _ in range(steps):
            tcp, obj = _tcp_and_actor(env, name)
            tgt = np.concatenate([xy_of(obj), np.full((B, 1), z)], 1)
            out = act(np.clip((tgt - tcp) * gain, -clip, clip), grip)
        return out

    # hover over cube A, descend, grasp (solve_pick_cube schedule)
    servo_xyz("cubeA", lambda o: o[:, :2], 0.10, 30)
    servo_xyz("cubeA", lambda o: o[:, :2], 0.05, 25)
    servo_xyz("cubeA", lambda o: o[:, :2], 0.022, 25, gain=2.0)
    out = None
    for _ in range(8):
        out = act(np.zeros((B, 3), np.float32), grip=-1.0)
    # lift straight up, traverse above cube B, lower to stack height
    servo_xyz("cubeB", lambda o: o[:, :2], 0.12, 35, grip=-1.0)
    servo_xyz("cubeB", lambda o: o[:, :2], 0.085, 20, gain=2.0, grip=-1.0)
    # release + retreat
    for _ in range(6):
        out = act(np.zeros((B, 3), np.float32), grip=1.0)
    for _ in range(12):
        out = act(np.tile(np.array([0, 0, 0.3], np.float32), (B, 1)),
                  grip=1.0)
    info = out[-1]
    return np.asarray(info.get("success"))


def solve_roll_ball(env, recorder=None):
    """Push the ball toward the goal region (reference
    solutions/roll_ball-style hit servo)."""
    assert env.control_mode == "pd_ee_delta_pos"
    stepper = recorder if recorder is not None else env
    B = env.num_envs

    def act(dxyz, grip=-1.0):
        a = np.zeros((B, env.action_dim), np.float32)
        a[:, :3] = dxyz
        a[:, 3] = grip
        return stepper.step(a)

    out = None
    goal = np.asarray(
        env._state.sim.kin_pose[:, env.model.kin_index["goal_region"], :3]
    )
    for _ in range(35):
        tcp, ball = _tcp_and_actor(env, "ball")
        d = goal[:, :2] - ball[:, :2]
        n = np.linalg.norm(d, axis=1, keepdims=True).clip(1e-6)
        tgt = np.concatenate([ball[:, :2] - d / n * 0.07,
                              np.full((B, 1), 0.05)], 1)
        out = act(np.clip((tgt - tcp) * 3.0, -0.4, 0.4))
    for _ in range(45):
        tcp, ball = _tcp_and_actor(env, "ball")
        d = goal[:, :2] - ball[:, :2]
        n = np.linalg.norm(d, axis=1, keepdims=True).clip(1e-6)
        tgt = np.concatenate([ball[:, :2] - d / n * 0.03 + d * 0.5,
                              np.full((B, 1), 0.035)], 1)
        out = act(np.clip((tgt - tcp) * 3.0, -0.35, 0.35))
    info = out[-1]
    return np.asarray(info.get("success"))


SOLUTIONS = {
    "PickCube-v1": solve_pick_cube,
    "PushCube-v1": solve_push_cube,
    "PullCube-v1": solve_pull_cube,
    "StackCube-v1": solve_stack_cube,
}
