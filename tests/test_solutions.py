"""Scripted-solution regression tests: the framework's grasping and pushing
physics must support complete task executions (the strongest end-to-end
fidelity check; reference analogue: motionplanning solution tests)."""
import json
import os

import numpy as np
import pytest

import maniskill_tpu as mst
from maniskill_tpu.examples.motionplanning.solutions import (
    solve_pick_cube,
    solve_push_cube,
)

# Committed-artifact bars (tools/validate_solutions.py, VERDICT r4 #4):
# every solution listed here must meet its bar in SOLUTIONS_RESULTS.json.
# Solutions NOT listed are documented as unsolved in the artifact itself —
# parity claims (PARITY.md) count only the barred ones.
SOLUTION_BARS = {
    "PickSingleHull-v1": 0.6,
    "DrawTriangle-v1": 0.9,
    "DrawSVG-v1": 0.9,
    "PullCubeTool-v1": 0.6,
    "FoldSuitcase-v1": 0.7,
}


def test_committed_solution_results_meet_bars():
    path = os.path.join(os.path.dirname(__file__), "..",
                        "SOLUTIONS_RESULTS.json")
    with open(path) as f:
        res = json.load(f)
    for env_id, bar in SOLUTION_BARS.items():
        row = res.get(env_id)
        assert row is not None, f"{env_id} missing from SOLUTIONS_RESULTS"
        assert "error" not in row, (env_id, row)
        assert row["success"] >= bar, (env_id, row, bar)


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
