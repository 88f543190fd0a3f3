"""Convex-hull collision: narrowphase, dynamics, per-env model selection.

TPU-native analogue of the reference's convex-mesh pipeline
(mani_skill/utils/building/actors/ycb.py + PhysX convex PCM): padded
vertex/face tables as per-env SimState (physics/hulls.py, shapes.py hull
narrowphase). These tests pin the static contracts the PickSingleYCB-class
tasks rely on."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maniskill_tpu.physics.engine import make_step_fn
from maniskill_tpu.physics.hulls import (
    HULL_F,
    HULL_V,
    make_hull,
    pad_library,
    standard_object_library,
    _box_pts,
)
from maniskill_tpu.physics.model import (
    DriveCmd,
    SceneSpecBuilder,
    SimParams,
    box_geom,
    plane_geom,
)


def test_hull_mass_properties_box_exact():
    h = make_hull("box", _box_pts(0.02, 0.03, 0.04))
    vol = 8 * 0.02 * 0.03 * 0.04
    I = vol / 3 * np.diag(
        [0.03**2 + 0.04**2, 0.02**2 + 0.04**2, 0.02**2 + 0.03**2]
    )
    assert abs(h.volume - vol) < 1e-9
    np.testing.assert_allclose(h.inertia_com, I, atol=1e-10)
    assert h.verts.shape == (HULL_V, 3)
    assert h.faces.shape == (HULL_F, 4)


def test_library_hulls_consistent():
    for a in standard_object_library():
        assert a.volume > 0
        # every vertex inside every face plane (outward convention)
        d = a.verts @ a.faces[:, :3].T - a.faces[:, 3]
        assert (d < 1e-5).all()
        w = np.linalg.eigvalsh(a.inertia_com)
        assert (w > 0).all()


@pytest.fixture(scope="module")
def hull_scene():
    lib = standard_object_library()
    b = SceneSpecBuilder(SimParams())
    b.add_static_body(
        "ground", np.array([0, 0, 0, 1, 0, 0, 0], np.float32),
        [plane_geom(friction=0.5)],
    )
    idx = b.add_free_hull("obj", lib[0], density=1000.0)
    return b.build(), idx, lib


def test_hull_rests_on_plane(hull_scene):
    model, idx, lib = hull_scene
    s = model.initial_state()
    s = s.replace(free_pose=s.free_pose.at[idx, 2].set(0.08))
    step = make_step_fn(model)
    cmd = DriveCmd(jnp.zeros(0), jnp.zeros(0), jnp.zeros(0))
    stepj = jax.jit(lambda st: step(st, cmd, 1))
    for _ in range(120):
        s = stepj(s)
    # the "can" rests on its flat bottom at exactly half height
    assert abs(float(s.free_pose[idx, 2]) - 0.045) < 2e-3
    assert float(jnp.linalg.norm(s.free_vel)) < 1e-4


def test_per_env_hull_selection(hull_scene):
    """4 sub-envs hold 4 DIFFERENT hulls in one batch, zero recompiles —
    the Actor.merge / reconfiguration_freq analogue (SURVEY §2.10)."""
    model, idx, lib = hull_scene
    verts_t, faces_t, vol_t, inert_t, aabb_t = pad_library(lib)
    K = 4
    s = model.batch_state(model.initial_state(), K)
    ids = np.array([0, 1, 3, 6])  # can, small_box, frustum_cup, domino
    s = s.replace(
        hull_verts=jnp.asarray(verts_t[ids])[:, None],
        hull_faces=jnp.asarray(faces_t[ids])[:, None],
        free_mass=s.free_mass.at[:, idx].set(jnp.asarray(vol_t[ids] * 1e3)),
        free_inertia=s.free_inertia.at[:, idx].set(
            jnp.asarray(inert_t[ids] * 1e3)
        ),
        free_pose=s.free_pose.at[:, idx, 2].set(0.10),
    )
    step = make_step_fn(model)
    cmd = DriveCmd(
        jnp.zeros((K, 0)), jnp.zeros((K, 0)), jnp.zeros((K, 0))
    )
    stepj = jax.jit(jax.vmap(lambda st, c: step(st, c, 1)))
    for _ in range(150):
        s = stepj(s, cmd)
    z = np.asarray(s.free_pose[:, idx, 2])
    # all four flat-bottomed shapes rest at their own half heights
    np.testing.assert_allclose(z, aabb_t[ids, 2], atol=5e-3)
    assert len(set(np.round(z, 3))) >= 3  # genuinely different objects
    assert np.isfinite(np.asarray(s.free_pose)).all()


def test_hull_on_box_and_hull_on_hull():
    lib = standard_object_library()
    b = SceneSpecBuilder(SimParams())
    b.add_static_body(
        "ground", np.array([0, 0, 0, 1, 0, 0, 0], np.float32),
        [plane_geom(friction=0.5)],
    )
    # a static platform box, a hull on it, another hull on top of that
    b.add_static_body(
        "platform", np.array([0, 0, 0.02, 1, 0, 0, 0], np.float32),
        [box_geom([0.1, 0.1, 0.02], friction=0.6)],
    )
    i1 = b.add_free_hull("lower", lib[7], density=800.0)   # prism6 (flat)
    i2 = b.add_free_hull("upper", lib[1], density=800.0)   # small_box hull
    model = b.build()
    fn_names = {fn.__name__ for (fn, _, _, _, _) in model.pair_groups}
    assert "box_hull" in fn_names and "hull_hull" in fn_names

    s = model.initial_state()
    fp = s.free_pose
    fp = fp.at[i1, 2].set(0.04 + 0.02)           # prism on the platform
    fp = fp.at[i2, 2].set(0.04 + 0.04 + 0.035)   # box stacked on prism
    s = s.replace(free_pose=fp)
    step = make_step_fn(model)
    cmd = DriveCmd(jnp.zeros(0), jnp.zeros(0), jnp.zeros(0))
    stepj = jax.jit(lambda st: step(st, cmd, 1))
    for _ in range(200):
        s = stepj(s)
    z1 = float(s.free_pose[i1, 2])
    z2 = float(s.free_pose[i2, 2])
    assert abs(z1 - (0.04 + 0.02)) < 4e-3, z1           # rests on platform
    assert abs(z2 - (0.04 + 0.04 + 0.035)) < 8e-3, z2   # stays stacked
    assert float(jnp.linalg.norm(s.free_vel)) < 1e-3


def test_pick_single_hull_env():
    """Env-level heterogeneity: 4 sub-envs hold 4 different hull objects
    (reference PickSingleYCB contract, pick_single_ycb.py:81-124)."""
    import maniskill_tpu as mst

    env = mst.make("PickSingleHull-v1", num_envs=4)
    env.reset(seed=0)
    ids0 = np.asarray(env._state.extras["model_id"]).copy()
    assert len(set(ids0.tolist())) >= 2  # different objects sampled
    rng = np.random.RandomState(0)
    for _ in range(5):
        obs, rew, term, trunc, info = env.step(env.sample_action(rng))
    assert np.isfinite(np.asarray(obs)).all()
    assert np.isfinite(np.asarray(rew)).all()
    # partial reset resamples only the chosen envs
    env.reset(options=dict(env_idx=jnp.array([0])))
    ids1 = np.asarray(env._state.extras["model_id"])
    assert (ids1[1:] == ids0[1:]).all()


@pytest.mark.slow  # 5-hull clutter scene: heavy cold compile
def test_pick_clutter_ycb_env():
    """PickClutterYCB-v1 (reference pick_clutter_ycb.py:23,190): per-env
    clutter of 5 hull objects with per-env model selection + per-env
    target choice; default reward mode is 'none' for reference parity."""
    import maniskill_tpu as mst

    env = mst.make("PickClutterYCB-v1", num_envs=4)
    assert env.reward_mode == "none"
    env.reset(seed=0)
    mids0 = np.asarray(env._state.extras["model_ids"]).copy()  # (4, 5)
    tidx0 = np.asarray(env._state.extras["target_idx"]).copy()
    # clutter model selection varies across envs
    assert len({tuple(r) for r in mids0.tolist()}) >= 2
    rng = np.random.RandomState(0)
    for _ in range(5):
        obs, rew, term, trunc, info = env.step(env.sample_action(rng))
    assert np.isfinite(np.asarray(obs)).all()
    assert np.asarray(rew).shape == (4,)  # reward-mode none -> zeros
    assert not np.asarray(info["success"]).any()  # nothing solved randomly
    # partial reset resamples only the chosen envs
    env.reset(options=dict(env_idx=jnp.array([0])))
    mids1 = np.asarray(env._state.extras["model_ids"])
    tidx1 = np.asarray(env._state.extras["target_idx"])
    assert (mids1[1:] == mids0[1:]).all()
    assert (tidx1[1:] == tidx0[1:]).all()
