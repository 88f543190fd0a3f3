"""Mega-kernel vs XLA-path equivalence.

The Pallas whole-substep kernel (physics/megakernel.py) must reproduce the
XLA engine's trajectories: same velocity-level contact law, split-impulse
integration, and warm-start updates. Run in interpreter mode on CPU with a
small env block so CI needs no TPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import maniskill_tpu as mst
from maniskill_tpu.physics import megakernel
from maniskill_tpu.physics.engine import make_step_fn

pytestmark = pytest.mark.slow  # interpret-mode Pallas equivalence, ~25 min


@pytest.fixture(scope="module")
def pick_env():
    return mst.make("PickCube-v1", num_envs=4, reward_mode="dense")


def test_supports_pickcube(pick_env):
    assert megakernel.supports(pick_env.model)


def test_megakernel_matches_xla_substep(pick_env):
    env = pick_env
    env.reset(seed=0)
    model = env.model
    K = 4
    sim = jax.tree.map(lambda x: x[:K], env._state.sim)
    cmd = jax.tree.map(lambda x: x[:K], env._state.cmd)
    # nudge the target so drives do something + cube falls under gravity
    cmd = cmd.replace(target_qpos=cmd.target_qpos + 0.05)

    xla_step = make_step_fn(model)
    sim_x = sim
    for _ in range(3):
        sim_x = jax.vmap(lambda s, c: xla_step(s, c, 1))(sim_x, cmd)

    k_step = megakernel.make_pallas_step_fn(
        model, sim_steps=3, interpret=True, eb=128
    )
    sim_k, aux = k_step(sim, cmd)

    np.testing.assert_allclose(
        np.asarray(sim_k.qpos), np.asarray(sim_x.qpos), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(sim_k.qvel), np.asarray(sim_x.qvel), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(sim_k.free_pose), np.asarray(sim_x.free_pose), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(sim_k.free_vel), np.asarray(sim_x.free_vel), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(sim_k.contact_lam), np.asarray(sim_x.contact_lam),
        atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(sim_k.contact_lam_t), np.asarray(sim_x.contact_lam_t),
        atol=5e-3
    )
    assert np.isfinite(np.asarray(aux["f_pt"])).all()
    assert aux["body_pos"].shape == (K, model.robot.nb, 3)


def test_megakernel_settles_like_xla(pick_env):
    """Longer horizon: cube must stay resting on the table in both paths."""
    env = pick_env
    env.reset(seed=1)
    model = env.model
    K = 4
    sim = jax.tree.map(lambda x: x[:K], env._state.sim)
    cmd = jax.tree.map(lambda x: x[:K], env._state.cmd)
    k_step = megakernel.make_pallas_step_fn(
        model, sim_steps=10, interpret=True, eb=128
    )
    sim_k, _ = k_step(sim, cmd)
    z = np.asarray(sim_k.free_pose[:, 0, 2])
    assert np.all(z > 0.015) and np.all(z < 0.025), z
    assert np.isfinite(np.asarray(sim_k.qpos)).all()


def test_megakernel_contact_free_model():
    """Contact-free scenes (cartpole: zero candidate pairs) run through the
    kernel and match the XLA path."""
    env = mst.make("MS-CartpoleBalance-v1", num_envs=4)
    env.reset(seed=0)
    model = env.model
    assert model.n_points == 0 and megakernel.supports(model)
    sim = jax.tree.map(lambda x: x[:4], env._state.sim)
    cmd = jax.tree.map(lambda x: x[:4], env._state.cmd)
    k_step = megakernel.make_pallas_step_fn(
        model, sim_steps=2, interpret=True, eb=128)
    sim_k, _ = k_step(sim, cmd)
    xla = make_step_fn(model)
    sim_x = jax.vmap(lambda s, c: xla(s, c, 2))(sim, cmd)
    np.testing.assert_allclose(
        np.asarray(sim_k.qpos), np.asarray(sim_x.qpos), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sim_k.qvel), np.asarray(sim_x.qvel), atol=1e-6)


@pytest.mark.parametrize("env_id", ["RotateCube-v1", "MS-HopperStand-v1"])
def test_megakernel_capsule_models(env_id):
    """Capsule narrowphase in-kernel (trifinger capsules-vs-cube; hopper
    capsules-vs-plane) matches the XLA path."""
    env = mst.make(env_id, num_envs=4)
    env.reset(seed=0)
    model = env.model
    assert megakernel.supports(model), env_id
    sim = jax.tree.map(lambda x: x[:4], env._state.sim)
    cmd = jax.tree.map(lambda x: x[:4], env._state.cmd)
    n = env.sim_steps_per_control
    k_step = megakernel.make_pallas_step_fn(
        model, sim_steps=2, interpret=True, eb=128)
    sim_k, _ = k_step(sim, cmd)
    xla = make_step_fn(model)
    sim_x = jax.vmap(lambda s, c: xla(s, c, 2))(sim, cmd)
    np.testing.assert_allclose(
        np.asarray(sim_k.qpos), np.asarray(sim_x.qpos), atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(sim_k.qvel), np.asarray(sim_x.qvel), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(sim_k.free_pose), np.asarray(sim_x.free_pose),
        atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(sim_k.contact_lam), np.asarray(sim_x.contact_lam),
        atol=1e-2)


@pytest.mark.parametrize("env_id", ["PickSingleHull-v1"])
def test_megakernel_hull_models(env_id):
    """Convex-hull narrowphase in-kernel (per-env padded vertex/face
    tables riding the input plane) matches the XLA path — the
    PickSingleYCB/heterogeneous-object scene class (VERDICT r4 item 3)."""
    env = mst.make(env_id, num_envs=4)
    env.reset(seed=0)
    model = env.model
    from maniskill_tpu.physics.megakernel import _hull_cost

    assert _hull_cost(model) > 0, "scene has no hull pairs?"
    assert megakernel.supports(model), env_id
    sim = jax.tree.map(lambda x: x[:4], env._state.sim)
    cmd = jax.tree.map(lambda x: x[:4], env._state.cmd)
    k_step = megakernel.make_pallas_step_fn(
        model, sim_steps=2, interpret=True, eb=128)
    sim_k, _ = k_step(sim, cmd)
    xla = make_step_fn(model)
    sim_x = jax.vmap(lambda s, c: xla(s, c, 2))(sim, cmd)
    np.testing.assert_allclose(
        np.asarray(sim_k.qpos), np.asarray(sim_x.qpos), atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(sim_k.qvel), np.asarray(sim_x.qvel), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(sim_k.free_pose), np.asarray(sim_x.free_pose),
        atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(sim_k.free_vel), np.asarray(sim_x.free_vel), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(sim_k.contact_lam), np.asarray(sim_x.contact_lam),
        atol=1e-2)


def test_megakernel_chunked_narrowphase_matches_xla(pick_env):
    """Chunked-narrowphase mode (recompute per chunk instead of full-P
    stacks — the VMEM path for large-P scenes within the compile-size
    envelope; see supports()) must produce the same physics as full
    mode."""
    env = pick_env
    env.reset(seed=0)
    model = env.model
    from maniskill_tpu.physics.megakernel import _Plan, _plan_for

    plan = _plan_for(model)
    assert plan.full_stacks  # PickCube fits the full path by default
    sim = jax.tree.map(lambda x: x[:4], env._state.sim)
    cmd = jax.tree.map(lambda x: x[:4], env._state.cmd)
    try:
        plan.full_stacks = False  # force the chunked path
        k_step = megakernel.make_pallas_step_fn(
            model, sim_steps=2, interpret=True, eb=128)
        sim_k, _ = k_step(sim, cmd)
    finally:
        plan.full_stacks = True
    xla = make_step_fn(model)
    sim_x = jax.vmap(lambda s, c: xla(s, c, 2))(sim, cmd)
    np.testing.assert_allclose(
        np.asarray(sim_k.qpos), np.asarray(sim_x.qpos), atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(sim_k.qvel), np.asarray(sim_x.qvel), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(sim_k.free_pose), np.asarray(sim_x.free_pose),
        atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(sim_k.contact_lam), np.asarray(sim_x.contact_lam),
        atol=1e-2)
