"""Scripted-solution regression tests: the framework's grasping and pushing
physics must support complete task executions (the strongest end-to-end
fidelity check; reference analogue: motionplanning solution tests)."""
import numpy as np
import pytest

import maniskill_tpu as mst
from maniskill_tpu.examples.motionplanning.solutions import (
    solve_pick_cube,
    solve_push_cube,
)


@pytest.mark.slow
def test_scripted_pick_cube_succeeds():
    env = mst.make("PickCube-v1", num_envs=2, control_mode="pd_ee_delta_pos",
                   robot_init_qpos_noise=0.0)
    env.reset(seed=0)
    succ = solve_pick_cube(env)
    assert succ.all(), succ


@pytest.mark.slow
def test_scripted_push_cube_succeeds():
    env = mst.make("PushCube-v1", num_envs=2, control_mode="pd_ee_delta_pos",
                   robot_init_qpos_noise=0.0)
    env.reset(seed=1)
    succ = solve_push_cube(env)
    assert succ.all(), succ
