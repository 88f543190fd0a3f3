"""Heterogeneous batches phase 2: per-env free-body mass/inertia as state
(VERDICT round-2 item 4; reference PickSingleYCB per-scene variation,
pick_single_ycb.py:28,81-124)."""
import jax
import jax.numpy as jnp
import numpy as np

import maniskill_tpu as mst


def test_pick_single_object_samples_per_env():
    env = mst.make("PickSingleObject-v1", num_envs=4)
    env.reset(seed=0)
    gidx = env.model.geom_indices("cube")[0]
    halves = np.asarray(env._state.sim.geom_size[:, gidx])
    masses = np.asarray(env._state.sim.free_mass[:, 0])
    assert len(np.unique(halves[:, 2].round(5))) > 1
    assert len(np.unique(masses.round(5))) > 1
    for t in range(4):
        a = np.random.default_rng(t).uniform(
            -1, 1, (4, env.action_dim)).astype(np.float32)
        obs, rew, *_ = env.step(a)
    assert np.isfinite(np.asarray(obs)).all()
    # each object rests at its own half height
    z = np.asarray(env._state.sim.free_pose[:, 0, 2])
    np.testing.assert_allclose(z, halves[:, 2], atol=2e-3)


def test_reconfiguration_freq_keeps_object_across_resets():
    env = mst.make("PickSingleObject-v1", num_envs=2,
                   reconfiguration_freq=100)
    env.reset(seed=0)
    gidx = env.model.geom_indices("cube")[0]
    h0 = np.asarray(env._state.sim.geom_size[:, gidx])
    env.reset()  # episode 2: same object (freq=100)
    h1 = np.asarray(env._state.sim.geom_size[:, gidx])
    np.testing.assert_allclose(h0, h1)


def test_per_env_inertia_drives_gyroscopics():
    """Per-env free_inertia must be LIVE state: a tumbling body with
    asymmetric inertia precesses (gyro torque ω x Iω != 0) while an
    isotropic one spins steadily — same initial ω, different envs."""
    env = mst.make("PickCube-v1", num_envs=2)
    env.reset(seed=0)
    st = env._state
    iso = 1e-4 * jnp.eye(3)
    aniso = jnp.diag(jnp.asarray([1e-4, 4e-4, 9e-4]))
    fp = st.sim.free_pose.at[:, 0, 2].set(0.5)  # mid-air, no contacts
    fv = st.sim.free_vel.at[:, 0, 3:].set(jnp.asarray([3.0, 3.0, 0.0]))
    sim = st.sim.replace(
        free_pose=fp, free_vel=fv,
        free_inertia=jnp.stack([iso[None], aniso[None]]),
    )
    env._state = st.replace(sim=sim)
    a = np.zeros((2, env.action_dim), np.float32)
    for _ in range(5):
        env.step(a)
    w = np.asarray(env._state.sim.free_vel[:, 0, 3:])
    # isotropic: ω unchanged; anisotropic: precession changed ω direction
    assert np.allclose(w[0], [3.0, 3.0, 0.0], atol=5e-2), w[0]
    assert np.abs(w[1] - np.array([3.0, 3.0, 0.0])).max() > 0.3, w[1]


def test_geom_offsets_are_state():
    """Round-3: geom-in-body offsets are per-env SimState (geom_pos/quat) —
    two envs with the same model hold DIFFERENTLY-PLACED geoms."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from maniskill_tpu.physics.engine import make_step_fn
    from maniskill_tpu.physics.model import (
        DriveCmd, SceneSpecBuilder, SimParams, box_geom, plane_geom,
    )

    b = SceneSpecBuilder(SimParams())
    b.add_static_body("ground", np.array([0, 0, 0, 1, 0, 0, 0], np.float32),
                      [plane_geom()])
    bi = b.add_free_body(
        "obj", 0.1, 0.1 * 0.02**2 * 2 / 3 * np.eye(3),
        [box_geom([0.02, 0.02, 0.02])],
    )
    model = b.build()
    gidx = model.geom_indices("obj")[0]
    K = 2
    s = model.batch_state(model.initial_state(), K)
    # env 1 carries its box geom 4 cm above the body origin
    s = s.replace(
        free_pose=s.free_pose.at[:, bi, 2].set(0.1),
        geom_pos=s.geom_pos.at[1, gidx, 2].set(0.04),
    )
    step = make_step_fn(model)
    cmd = DriveCmd(jnp.zeros((K, 0)), jnp.zeros((K, 0)), jnp.zeros((K, 0)))
    stepj = jax.jit(jax.vmap(lambda st, c: step(st, c, 1)))
    for _ in range(120):
        s = stepj(s, cmd)
    z = np.asarray(s.free_pose[:, bi, 2])
    # env 0 rests with body origin at 0.02; env 1's geom sits 4 cm high, so
    # its body origin rests 4 cm LOWER (at -0.02)
    np.testing.assert_allclose(z, [0.02, -0.02], atol=2e-3)


def test_fold_suitcase_models_heterogeneous():
    import numpy as np
    import maniskill_tpu as mst

    env = mst.make("FoldSuitcaseModels-v1", num_envs=4)
    env.reset(seed=0)
    mids = np.asarray(env._state.extras["model_id"])
    sizes = np.asarray(env._state.sim.geom_size[:, env._lid_geom, 0])
    assert len(set(mids.tolist())) >= 2
    # per-env lid length follows the selected model
    lh = np.array([m[2][0] for m in env.MODELS])
    np.testing.assert_allclose(sizes, lh[mids], atol=1e-6)
