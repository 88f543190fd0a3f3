"""Unitree G1 humanoid (floating root via kinematics.urdf.float_base).

Parity: reference agents/robots/unitree_g1/g1.py (37 body dof,
fix_root_link=False, standing keyframe, body kp=50 kd=1)."""
import jax
import jax.numpy as jnp
import numpy as np

from maniskill_tpu.agents.base_agent import REGISTERED_AGENTS
from maniskill_tpu.physics.engine import make_step_fn
from maniskill_tpu.physics.model import (
    SceneSpecBuilder,
    SimParams,
    plane_geom,
)


def _stand(agent_cls, steps=60):
    a = agent_cls(control_mode="pd_joint_delta_pos")
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
    for _ in range(steps):
        st = sf(st, cmd)
    return a, st


def test_g1_spec_and_floating_root():
    a = REGISTERED_AGENTS["unitree_g1"](control_mode="pd_joint_delta_pos")
    assert a.nq == 43  # 6 float root + 37 body dof (reference g1.py)
    assert a.controller.action_dim == 37  # root dofs are passive
    assert a.robot_spec.joint_names[:6] == [
        "root_x", "root_y", "root_z", "root_rz", "root_ry", "root_rx"]
    # pelvis (old fixed base) inertials promoted onto the root body
    assert a.robot_spec.mass[5] > 1.0
    q = a.keyframes["standing"].qpos
    assert abs(q[2] - 0.755) < 1e-6  # standing pelvis height


def test_g1_simulates_finite_at_reference_gains():
    """kp=50 kd=1 (reference gains) cannot statically hold a 35 kg
    humanoid — it folds, like the reference without a policy — but the
    sim must stay finite with the robot on the floor."""
    a, st = _stand(REGISTERED_AGENTS["unitree_g1"])
    assert bool(jnp.isfinite(st.qpos).all())
    assert float(st.qpos[2]) > -0.05  # on the floor, not through it


def test_g1_stands_with_stiff_gains():
    """With joint gains strong enough to hold the pose, the standing
    keyframe is statically stable on the box foot soles for 3 s."""
    class StiffG1(REGISTERED_AGENTS["unitree_g1"]):
        uid = "unitree_g1_stiff_test"
        body_stiffness = 800
        body_damping = 40
        body_force_limit = 300

    a, st = _stand(StiffG1)
    assert abs(float(st.qpos[2]) - 0.755) < 0.03, float(st.qpos[2])
    assert bool(jnp.isfinite(st.qpos).all())
