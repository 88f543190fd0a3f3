"""Stompy humanoid (simplified 26-dof primitive model).

Parity: reference agents/robots/stompy/stompy.py (floating root,
gripper links link_*_arm_*_hand_1_gripper_*, pd_joint_pos kp=100 kd=10)."""
import jax
import numpy as np

from maniskill_tpu.agents.base_agent import REGISTERED_AGENTS
from maniskill_tpu.physics.engine import make_step_fn
from maniskill_tpu.physics.model import (
    SceneSpecBuilder,
    SimParams,
    plane_geom,
)


def test_stompy_spec():
    a = REGISTERED_AGENTS["stompy"](control_mode="pd_joint_pos")
    assert a.nq == 32  # 6 float root + 26 body dof
    assert a.controller.action_dim == 26
    # reference gripper link names survive the simplification
    for nm in (
        "link_left_arm_2_hand_1_gripper_1",
        "link_left_arm_2_hand_1_gripper_2",
        "link_right_arm_1_hand_1_gripper_1",
        "link_right_arm_1_hand_1_gripper_2",
        "link_head_1_head_1",
    ):
        assert nm in a.robot_spec.link_index, nm
    q = a.keyframes["standing"].qpos
    assert abs(q[2] - 0.82) < 1e-6


def test_stompy_simulates_finite():
    a = REGISTERED_AGENTS["stompy"](control_mode="pd_joint_pos")
    b = SceneSpecBuilder(SimParams(dt=0.01, substeps=2))
    a.install(b, np.array([0, 0, 0, 1, 0, 0, 0], np.float32),
              init_qpos=a.keyframes["standing"].qpos)
    b.add_static_body("floor", np.array([0, 0, 0, 1, 0, 0, 0], np.float32),
                      [plane_geom(friction=1.0)])
    model = b.build()
    step = make_step_fn(model)
    st = model.initial_state()
    cmd = a.controller.reset(st.qpos)
    sf = jax.jit(lambda s, c: step(s, c, 5))
    for _ in range(40):
        st = sf(st, cmd)
    assert np.all(np.isfinite(np.asarray(st.qpos)))
    # root stays above the floor (did not fall through / blow up)
    assert 0.2 < float(st.qpos[2]) < 1.5
