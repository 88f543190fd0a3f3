"""Mega-kernel vs XLA-path equivalence on the big scenes.

Round 3 lifted the kernel's P<=220 / n_all<=24 size gate by chunking the
per-point pipeline (physics/megakernel.py). These tests pin the newly
covered scene classes — many-point box stacks (StackCube P=248,
PegInsertionSide P=328, PlugCharger P=453 with capsules), articulation
forests (OpenCabinetDrawer P=320 nq=16), and high-dof trees (humanoid
nq=27) — to the XLA reference trajectories in interpreter mode on CPU.

Marked slow: each env is a fresh trace of a large unrolled kernel.
"""
import jax
import numpy as np
import pytest

import maniskill_tpu as mst
from maniskill_tpu.physics import megakernel
from maniskill_tpu.physics.engine import make_step_fn

BIG_ENVS = [
    "StackCube-v1",
    "PegInsertionSide-v1",
    "PlugCharger-v1",
    "OpenCabinetDrawer-v1",
    "MS-HumanoidWalk-v1",
]


@pytest.mark.slow
@pytest.mark.parametrize("env_id", BIG_ENVS)
def test_megakernel_matches_xla_big(env_id):
    env = mst.make(env_id, num_envs=4)
    assert megakernel.supports(env.model), f"{env_id} must be kernel-covered"
    env.reset(seed=0)
    model = env.model
    K = 4
    sim = jax.tree.map(lambda x: x[:K], env._state.sim)
    cmd = jax.tree.map(lambda x: x[:K], env._state.cmd)
    # nudge drive targets so the robot moves and contacts evolve
    if model.nq:
        cmd = cmd.replace(target_qpos=cmd.target_qpos + 0.03)

    xla_step = make_step_fn(model)
    sim_x = sim
    for _ in range(3):
        sim_x = jax.vmap(lambda s, c: xla_step(s, c, 1))(sim_x, cmd)

    k_step = megakernel.make_pallas_step_fn(
        model, sim_steps=3, interpret=True, eb=128
    )
    sim_k, aux = k_step(sim, cmd)

    np.testing.assert_allclose(
        np.asarray(sim_k.qpos), np.asarray(sim_x.qpos), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(sim_k.qvel), np.asarray(sim_x.qvel), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(sim_k.free_pose), np.asarray(sim_x.free_pose), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(sim_k.free_vel), np.asarray(sim_x.free_vel), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(sim_k.contact_lam), np.asarray(sim_x.contact_lam),
        atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(sim_k.contact_lam_t), np.asarray(sim_x.contact_lam_t),
        atol=5e-3,
    )
    assert np.isfinite(np.asarray(aux["f_pt"])).all()
