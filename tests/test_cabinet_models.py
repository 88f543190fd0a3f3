"""OpenCabinetDrawerModels-v1: per-env cabinet model variety + per-env
target-drawer selection (the reference's PartNet per-env sampling +
Articulation.merge/max_dof analogue, open_cabinet_drawer.py:64-137)."""
import numpy as np
import pytest

import maniskill_tpu as mst


@pytest.fixture(scope="module")
def env():
    e = mst.make("OpenCabinetDrawerModels-v1", num_envs=4)
    e.reset(seed=3)
    return e


def test_model_and_target_variety(env):
    ids = np.asarray(env._state.extras["model_id"])
    tgt = np.asarray(env._state.extras["target_link"])
    # 4 envs sampling 4 models x 2 targets: expect at least two distinct
    # models and the target field to be a valid drawer index
    assert len(set(ids.tolist())) >= 2
    assert set(tgt.tolist()) <= {0, 1}
    # per-env tray geometry actually differs between different model ids
    gs = np.asarray(env._state.sim.geom_size)
    g0 = env._tray_geoms[0]
    i, j = 0, int(np.argmax(ids != ids[0]))
    if ids[i] != ids[j]:
        assert not np.allclose(gs[i, g0], gs[j, g0])


def test_steps_and_eval_keys(env):
    a = np.zeros((4, env.action_dim), np.float32)
    for _ in range(3):
        obs, r, te, tr, info = env.step(a)
    assert np.all(np.isfinite(np.asarray(r)))
    for k in ("success", "open_enough", "open_frac", "target_link"):
        assert k in info
    # both drawers start closed -> nobody starts successful
    assert not np.any(np.asarray(info["success"]))


def test_target_dof_selection(env):
    # opening the TARGET drawer flips open_enough; opening the other
    # drawer does not
    s = env._state
    d0, d1 = env._dofs
    tgt = np.asarray(s.extras["target_link"])
    qpos = np.array(s.sim.qpos)
    # manually open the NON-target drawer in env 0
    other = d1 if tgt[0] == 0 else d0
    target = d0 if tgt[0] == 0 else d1
    qpos[0, other] = env.target_qpos + 0.01
    import jax.numpy as jnp

    env._state = s.replace(sim=s.sim.replace(qpos=jnp.asarray(qpos)))
    a = np.zeros((4, env.action_dim), np.float32)
    _, _, _, _, info = env.step(a)
    assert not bool(np.asarray(info["open_enough"])[0])
    # now open the target drawer
    s = env._state
    qpos = np.array(s.sim.qpos)
    qpos[0, target] = env.target_qpos + 0.02
    env._state = s.replace(sim=s.sim.replace(qpos=jnp.asarray(qpos)))
    _, _, _, _, info = env.step(a)
    assert bool(np.asarray(info["open_enough"])[0])
