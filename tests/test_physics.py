"""Physics engine tests: resting contact, energy behavior, PD drives, limits
(reference analogue: PhysX is the oracle; here we assert physical invariants,
cf. SURVEY.md §4 test strategy)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maniskill_tpu.kinematics.urdf import parse_urdf
from maniskill_tpu.physics.engine import make_step_fn, robot_fk
from maniskill_tpu.physics.model import (
    DriveCmd,
    SceneSpecBuilder,
    SimParams,
    box_geom,
    plane_geom,
    sphere_geom,
)

from maniskill_tpu.utils.assets import ASSET_DIR
PANDA = str(ASSET_DIR / "robots/panda/panda_v2.urdf")
Q0 = np.array([0.0, -np.pi / 8, 0, -np.pi * 5 / 8, 0, np.pi * 3 / 4,
               np.pi / 4, 0.04, 0.04], np.float32)


def cube_scene():
    b = SceneSpecBuilder(SimParams())
    b.add_static_body("ground", np.array([0, 0, 0, 1, 0, 0, 0]), [plane_geom()])
    m, half = 0.064, 0.02
    b.add_free_body("cube", m, (2 / 3) * m * half * half * np.eye(3),
                    [box_geom([half] * 3)])
    return b.build()


def empty_cmd(n):
    return DriveCmd(target_qpos=jnp.zeros(n), target_qvel=jnp.zeros(n),
                    qf=jnp.zeros(n))


def run(model, state, cmd, steps):
    step_fn = make_step_fn(model)
    step = jax.jit(lambda s, c: step_fn(s, c, sim_steps=steps))
    return step(state, cmd)


def test_cube_rests_on_plane():
    model = cube_scene()
    state = model.initial_state()
    state = state.replace(free_pose=state.free_pose.at[0, 2].set(0.1))
    out = run(model, state, empty_cmd(0), 150)
    z = float(out.free_pose[0, 2])
    assert abs(z - 0.02) < 2e-3, z
    assert float(jnp.abs(out.free_vel).max()) < 1e-2


def test_cube_no_energy_gain():
    """Dropped cube must not bounce higher than its drop height."""
    model = cube_scene()
    state = model.initial_state()
    state = state.replace(free_pose=state.free_pose.at[0, 2].set(0.3))
    step = jax.jit(lambda s, c: make_step_fn(model)(s, c, sim_steps=1))
    max_z = 0.0
    cmd = empty_cmd(0)
    for i in range(120):
        state = step(state, cmd)
        if i > 40:  # after first impact
            max_z = max(max_z, float(state.free_pose[0, 2]))
    assert max_z < 0.31


def test_drop_zero_restitution():
    """Velocity-level contact (default, substeps=1, h=10ms) must kill impact
    energy by construction: after a 10cm drop the cube never rises above its
    rest height (PhysX-TGS parity — the reference solver is restitution-free
    at default material settings, types.py:36-59)."""
    model = cube_scene()
    assert model.params.substeps == 1 and model.params.contact_mode == "velocity"
    state = model.initial_state()
    state = state.replace(free_pose=state.free_pose.at[0, 2].set(0.1))
    step = jax.jit(lambda s, c: make_step_fn(model)(s, c, sim_steps=1))
    cmd = empty_cmd(0)
    zs = []
    for _ in range(150):
        state = step(state, cmd)
        zs.append(float(state.free_pose[0, 2]))
    zs = np.asarray(zs)
    impact = int(np.argmax(zs < 0.0205))
    assert zs[impact:].max() < 0.021, zs[impact:].max()  # no rebound > 1mm
    assert abs(zs[-1] - 0.02) < 2e-3  # rests at the surface (pen < 2mm)
    assert float(jnp.abs(state.free_vel).max()) < 1e-3


def test_friction_holds_on_slope():
    """Cube on a 10-degree slope with mu=0.3 (tan10 = 0.18 < 0.3) should
    stay put (slow creep from regularized friction allowed)."""
    ang = np.deg2rad(10)
    q = np.array([np.cos(ang / 2), 0, np.sin(ang / 2), 0], np.float32)
    b = SceneSpecBuilder(SimParams())
    b.add_static_body("slope", np.concatenate([[0, 0, 0], q]), [plane_geom()])
    m, half = 0.064, 0.02
    b.add_free_body("cube", m, (2 / 3) * m * half * half * np.eye(3),
                    [box_geom([half] * 3)])
    model = b.build()
    state = model.initial_state()
    # place on the slope surface
    from maniskill_tpu.math.rotations import quat_apply

    normal = np.asarray(quat_apply(jnp.asarray(q), jnp.array([0.0, 0, 1.0])))
    state = state.replace(
        free_pose=state.free_pose.at[0].set(
            jnp.concatenate([jnp.asarray(normal * half, jnp.float32), jnp.asarray(q)])
        )
    )
    out = run(model, state, empty_cmd(0), 100)
    drift = float(jnp.linalg.norm(out.free_pose[0, :2] - state.free_pose[0, :2]))
    assert drift < 0.02, drift


def panda_scene(extra=None):
    spec = parse_urdf(PANDA)
    b = SceneSpecBuilder(SimParams())
    b.add_robot(spec, np.array([0, 0, 0, 1, 0, 0, 0]), collision_geoms=extra or [],
                init_qpos=Q0)
    b.set_drive_properties(kp=1e3, kd=1e2, force_limit=100)
    return b.build()


def test_pd_hold():
    model = panda_scene()
    state = model.initial_state()
    cmd = DriveCmd(target_qpos=jnp.asarray(Q0), target_qvel=jnp.zeros(9),
                   qf=jnp.zeros(9))
    out = run(model, state, cmd, 100)
    # steady-state gravity sag at kp=1e3 is a few hundredths of a rad
    assert float(jnp.abs(out.qpos - jnp.asarray(Q0)).max()) < 0.05
    assert float(jnp.abs(out.qvel).max()) < 1e-3


def test_pd_reach():
    model = panda_scene()
    state = model.initial_state()
    tgt = jnp.asarray(Q0) + jnp.array([0.3, 0.2, -0.2, 0.3, 0.1, -0.2, 0.4, 0, 0])
    cmd = DriveCmd(target_qpos=tgt, target_qvel=jnp.zeros(9), qf=jnp.zeros(9))
    out = run(model, state, cmd, 200)
    assert float(jnp.abs(out.qpos - tgt).max()) < 0.05


def test_joint_limits_hold():
    model = panda_scene()
    state = model.initial_state()
    crazy = jnp.asarray(Q0) + 100.0
    cmd = DriveCmd(target_qpos=crazy, target_qvel=jnp.zeros(9), qf=jnp.zeros(9))
    out = run(model, state, cmd, 300)
    hi = jnp.asarray(model.robot_qlim[:, 1])
    assert bool(jnp.isfinite(out.qpos).all())
    assert float(jnp.max(out.qpos - hi)) < 0.1  # small penalty overshoot ok


def test_batched_determinism():
    """Identical batched envs stay bitwise identical (the GPU-vs-CPU contract
    of the reference, test_envs.py:151, becomes batch-invariance here)."""
    model = panda_scene()
    state = model.batch_state(model.initial_state(), 4)
    cmd = DriveCmd(
        target_qpos=jnp.broadcast_to(jnp.asarray(Q0), (4, 9)),
        target_qvel=jnp.zeros((4, 9)),
        qf=jnp.zeros((4, 9)),
    )
    step = jax.jit(jax.vmap(lambda s, c: make_step_fn(model)(s, c, sim_steps=20)))
    out = step(state, cmd)
    q = np.asarray(out.qpos)
    assert np.array_equal(q[0], q[1]) and np.array_equal(q[0], q[3])


def test_sphere_box_contact():
    b = SceneSpecBuilder(SimParams())
    b.add_static_body("ground", np.array([0, 0, 0, 1, 0, 0, 0]), [plane_geom()])
    m = 0.05
    b.add_free_body("ball", m, 0.4 * m * 0.03 ** 2 * np.eye(3),
                    [sphere_geom(0.03)])
    model = b.build()
    state = model.initial_state()
    state = state.replace(free_pose=state.free_pose.at[0, 2].set(0.2))
    out = run(model, state, empty_cmd(0), 150)
    assert abs(float(out.free_pose[0, 2]) - 0.03) < 2e-3


def test_stacked_cubes_rest():
    """Two identical axis-aligned cubes stacked flush must come to rest —
    regression for the box-box corner-on-face-plane degeneracy (corners of
    each cube land exactly on the other's lateral planes; without face-
    center samples the top cube falls straight through) and for the
    ±g·h/2 resting-velocity limit cycle (the implicit-impedance gate must
    keep stored-load points in the LHS)."""
    half = 0.02
    m = 1000.0 * (2 * half) ** 3
    inertia = (2.0 / 3.0) * m * half * half * np.eye(3)
    b = SceneSpecBuilder(SimParams())
    b.add_static_body(
        "table", np.array([0, 0, -0.05, 1, 0, 0, 0], np.float32),
        [box_geom([0.6, 0.7, 0.05], friction=0.5)],
    )
    ib = b.add_free_body("B", m, inertia, [box_geom([half] * 3)])
    ia = b.add_free_body("A", m, inertia, [box_geom([half] * 3)])
    model = b.build()
    state = model.initial_state()
    state = state.replace(
        free_pose=state.free_pose
        .at[ib].set(jnp.asarray([0.0, 0.0, half, 1, 0, 0, 0]))
        .at[ia].set(jnp.asarray([0.0, 0.0, 4 * half, 1, 0, 0, 0]))
    )
    out = run(model, state, empty_cmd(0), 60)
    # A rests ON B (did not tunnel), B still on the table (did not launch)
    assert abs(float(out.free_pose[ia, 2]) - 3 * half) < 2e-3, out.free_pose[ia]
    assert abs(float(out.free_pose[ib, 2]) - half) < 2e-3, out.free_pose[ib]
    # velocities converge to genuine rest (is_static-grade: < 1e-2)
    assert float(jnp.max(jnp.abs(out.free_vel))) < 1e-2
