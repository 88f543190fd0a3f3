"""Actor-pair drives (PairDrive — reference structs/drive.py +
ManiSkillScene.create_drive, scene.py:469): 6-DoF translational
spring-damper glue between free bodies, robot links, statics, and world
anchors, folded implicitly into the monolithic velocity solve."""
import jax
import jax.numpy as jnp
import numpy as np

from maniskill_tpu.kinematics.articulation import ArticulationBuilder
from maniskill_tpu.physics.engine import make_step_fn
from maniskill_tpu.physics.model import (
    DriveCmd,
    SceneSpecBuilder,
    SimParams,
    box_geom,
    plane_geom,
)


def _cmd(nq):
    return DriveCmd(target_qpos=jnp.zeros(nq), target_qvel=jnp.zeros(nq),
                    qf=jnp.zeros(nq))


def _roll(model, state, steps):
    step = make_step_fn(model)
    cmd = _cmd(model.nq)
    stepj = jax.jit(lambda s: step(s, cmd, 1))
    for _ in range(steps):
        state = stepj(state)
    return state


def test_free_free_drive_glues_bodies():
    """Box B hangs 10 cm above box A, held only by a drive; A rests on the
    ground carrying B's weight through the spring."""
    b = SceneSpecBuilder(SimParams(dt=0.01, substeps=1))
    b.add_static_body("ground", np.array([0, 0, 0, 1, 0, 0, 0], np.float32),
                      [plane_geom(friction=0.8)])
    half, m = 0.02, 0.1
    inertia = (m / 3) * (2 * half * half) * np.eye(3)
    b.add_free_body("A", m, inertia, [box_geom((half,) * 3, friction=0.8)])
    b.add_free_body("B", m, inertia, [box_geom((half,) * 3, friction=0.8)])
    b.exclude_pair("A", "B")
    b.add_drive(("free", "B"), (0, 0, -0.05), ("free", "A"), (0, 0, 0.05),
                stiffness=2e3, damping=60.0)
    model = b.build()
    assert len(model.drives) == 1

    s = model.initial_state()
    fp = np.asarray(s.free_pose).copy()
    fp[0, :3] = [0.1, 0.0, half]
    fp[1, :3] = [0.1, 0.0, half + 0.1]
    s = s.replace(free_pose=jnp.asarray(fp))
    s = _roll(model, s, 200)
    out = np.asarray(s.free_pose)
    assert np.isfinite(out).all()
    gap = out[1, 2] - out[0, 2]
    assert abs(gap - 0.10) < 0.01, gap  # drive holds the offset (small sag)
    assert abs(out[0, 2] - half) < 2e-3  # A still rests on the ground
    assert np.all(np.abs(np.asarray(s.free_vel)) < 0.05)  # settled


def test_world_anchor_drive_suspends_body():
    """A box with no contacts hangs from a world anchor at its spring
    equilibrium mg/k below the anchor."""
    b = SceneSpecBuilder(SimParams(dt=0.01, substeps=1))
    half, m = 0.02, 0.2
    inertia = (m / 3) * (2 * half * half) * np.eye(3)
    b.add_free_body("box", m, inertia, [box_geom((half,) * 3)])
    k = 1e3
    b.add_drive(("free", "box"), (0, 0, 0), "world", (0, 0, 0.5),
                stiffness=k, damping=30.0)
    model = b.build()
    s = model.initial_state()
    fp = np.asarray(s.free_pose).copy()
    fp[0, :3] = [0, 0, 0.45]
    s = s.replace(free_pose=jnp.asarray(fp))
    s = _roll(model, s, 300)
    out = np.asarray(s.free_pose)
    sag = 0.5 - out[0, 2]
    expect = m * 9.81 / k
    assert abs(sag - expect) < 5e-4, (sag, expect)
    assert np.all(np.abs(np.asarray(s.free_vel)) < 0.01)


def test_robot_link_drive_pins_pendulum():
    """A 1-dof pendulum's tip is pinned by a stiff drive to a world point at
    the horizontal — the drive torque beats gravity and the tip settles at
    the anchor."""
    art = ArticulationBuilder("pend")
    art.add_revolute_link("arm", axis=(0, 1, 0), limits=(-3.0, 3.0),
                          mass=1.0, com=(0, 0, -0.25),
                          inertia=np.eye(3) * 0.02, damping=0.5)
    spec, _bg, _lg, init_q = art.build()
    b = SceneSpecBuilder(SimParams(dt=0.01, substeps=2))
    b.add_robot(spec, np.array([0, 0, 0.5, 1, 0, 0, 0], np.float32),
                collision_geoms=[], init_qpos=init_q,
                balance_passive_force=False)
    b.add_drive(("robot", "pend:arm"), (0, 0, -0.5),
                "world", (0.5, 0, 0.5),
                stiffness=5e3, damping=1e2)
    model = b.build()
    s = model.initial_state()
    s = _roll(model, s, 400)
    q = float(np.asarray(s.qpos)[0])
    # tip world position: R_y(q) @ (0,0,-0.5) + base
    tip = np.array([-0.5 * np.sin(q), 0.0, 0.5 - 0.5 * np.cos(q)])
    assert np.linalg.norm(tip - [0.5, 0, 0.5]) < 0.02, (q, tip)
    assert abs(float(np.asarray(s.qvel)[0])) < 0.05
