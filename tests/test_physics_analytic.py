"""Physics accuracy vs closed-form solutions — the engine's 'oracle' tests
(complement to the reference's PhysX-CPU determinism checks, SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maniskill_tpu.kinematics.urdf import (
    JOINT_REVOLUTE,
    JOINT_PRISMATIC,
    RobotSpec,
)
from maniskill_tpu.physics.engine import make_step_fn
from maniskill_tpu.physics.model import (
    DriveCmd,
    SceneSpecBuilder,
    SimParams,
    box_geom,
    plane_geom,
)


def _pendulum_spec(length=0.5, mass=1.0):
    # point mass at (0,0,-L): I_origin = m(|c|^2 E - c c^T) = mL^2 diag(1,1,0)
    I_origin = mass * length**2 * np.diag([1.0, 1.0, 0.0])
    return RobotSpec(
        name="pendulum", nb=1,
        parent=np.array([-1], np.int32),
        joint_type=np.array([JOINT_REVOLUTE], np.int32),
        joint_pos=np.zeros((1, 3)), joint_quat=np.array([[1.0, 0, 0, 0]]),
        axis=np.array([[0.0, 1.0, 0.0]]),
        mass=np.array([mass]), com=np.array([[0.0, 0.0, -length]]),
        inertia=np.array([I_origin]),
        qlim=np.array([[-10.0, 10.0]]), effort=np.array([100.0]),
        vel_limit=np.array([np.inf]), joint_damping=np.zeros(1),
        joint_friction=np.zeros(1), frames={}, link_index={"rod": 0},
        joint_names=["hinge"], link_names=["rod"],
    )


def test_pendulum_period():
    """Small-angle pendulum: T = 2π sqrt(L/g)."""
    L = 0.5
    spec = _pendulum_spec(length=L)
    b = SceneSpecBuilder(SimParams(dt=0.002, substeps=1))
    b.add_robot(spec, np.array([0, 0, 1.0, 1, 0, 0, 0]), collision_geoms=[],
                init_qpos=np.array([0.05]), balance_passive_force=False)
    b.set_drive_properties(kp=0.0, kd=0.0, force_limit=0.0)
    model = b.build()
    step = make_step_fn(model)
    cmd = DriveCmd(target_qpos=jnp.zeros(1), target_qvel=jnp.zeros(1),
                   qf=jnp.zeros(1))
    f = jax.jit(lambda s: step(s, cmd, 1))
    state = model.initial_state()
    qs = []
    for _ in range(1500):  # 3 s at dt=2ms
        state = f(state)
        qs.append(float(state.qpos[0]))
    qs = np.asarray(qs)
    # measure the period from zero crossings (rising)
    sign = qs > 0
    crossings = np.nonzero(~sign[:-1] & sign[1:])[0]
    assert len(crossings) >= 2
    period = np.diff(crossings).mean() * 0.002
    expected = 2 * np.pi * np.sqrt(L / 9.81)
    assert abs(period - expected) / expected < 0.02, (period, expected)


def test_projectile_parabola():
    """Free body ballistic flight matches the closed-form parabola."""
    b = SceneSpecBuilder(SimParams(dt=0.002, substeps=1))
    m = 0.1
    b.add_free_body("ball", m, 1e-5 * np.eye(3), [])
    model = b.build()
    step = make_step_fn(model)
    cmd = DriveCmd(target_qpos=jnp.zeros(0), target_qvel=jnp.zeros(0),
                   qf=jnp.zeros(0))
    state = model.initial_state()
    v0 = jnp.array([1.0, 0.5, 2.0])
    state = state.replace(
        free_vel=state.free_vel.at[0, :3].set(v0),
        free_pose=state.free_pose.at[0, 2].set(1.0),
    )
    f = jax.jit(lambda s: step(s, cmd, 1))
    T = 250  # 0.5 s
    for _ in range(T):
        state = f(state)
    t = T * 0.002
    expect = np.array([1.0 * t, 0.5 * t, 1.0 + 2.0 * t - 0.5 * 9.81 * t * t])
    got = np.asarray(state.free_pose[0, :3])
    # semi-implicit Euler's O(dt) bias over 250 steps is ~g*dt*t/2 ≈ 5mm
    assert np.allclose(got[:2], expect[:2], atol=1e-4)
    assert abs(got[2] - expect[2]) < 0.01


def test_spinning_box_momentum():
    """Torque-free rigid body: angular momentum magnitude is conserved."""
    b = SceneSpecBuilder(SimParams(dt=0.002, substeps=1,
                                   gravity=(0.0, 0.0, 0.0)))
    m = 0.5
    I = np.diag([0.01, 0.02, 0.03])
    b.add_free_body("box", m, I, [])
    model = b.build()
    step = make_step_fn(model)
    cmd = DriveCmd(target_qpos=jnp.zeros(0), target_qvel=jnp.zeros(0),
                   qf=jnp.zeros(0))
    state = model.initial_state()
    w0 = np.array([3.0, 0.1, 2.0])  # excites the unstable middle axis
    state = state.replace(free_vel=state.free_vel.at[0, 3:].set(jnp.asarray(w0)))
    f = jax.jit(lambda s: step(s, cmd, 1))

    def ang_mom(state):
        from maniskill_tpu.math.rotations import quat_to_matrix

        R = np.asarray(quat_to_matrix(state.free_pose[0, 3:7]))
        w = np.asarray(state.free_vel[0, 3:])
        return R @ I @ R.T @ w

    L0 = ang_mom(state)
    for _ in range(500):
        state = f(state)
    L1 = ang_mom(state)
    assert np.linalg.norm(L1 - L0) / np.linalg.norm(L0) < 0.05
