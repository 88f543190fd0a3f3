"""Sharding correctness: identical results on 1 device vs an 8-device mesh.

The TPU test-plan analogue of the reference's GPU-batch-vs-CPU-oracle
contract (SURVEY §4): the same seeded MPPI solve must produce the same
nominal control sequence whether the rollout batch lives on one device or
is sharded over a (dcn × ici) virtual mesh — sharding may only reorder
reductions (float-level tolerance), never change semantics.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import maniskill_tpu as mst
from maniskill_tpu.parallel import hierarchical_mesh
from maniskill_tpu.planners import MPPI, MPPIConfig


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mppi_solve_matches_across_meshes():
    env = mst.make("PushCube-v1", num_envs=1, reward_mode="dense",
                   robot_init_qpos_noise=0.0)
    env.reset(seed=0)
    env_state = jax.tree.map(lambda x: x[0], env._state)
    cfg = MPPIConfig(horizon=8, num_samples=64, sigma=0.5)

    mesh1 = Mesh(np.array(jax.devices()[:1]), ("rollout",))
    p1 = MPPI(env, cfg, mesh=mesh1)
    ps1 = p1.init(seed=0)
    ps1, info1 = p1.solve(ps1, env_state)

    mesh8 = hierarchical_mesh(("dcn", "ici"), dcn_size=2,
                              devices=jax.devices()[:8])
    p8 = MPPI(env, cfg, mesh=mesh8, rollout_axis=("dcn", "ici"))
    ps8 = p8.init(seed=0)
    ps8, info8 = p8.solve(ps8, env_state)

    np.testing.assert_allclose(
        np.asarray(ps1.nominal), np.asarray(ps8.nominal), atol=2e-5
    )
    assert abs(float(info1["best_return"]) - float(info8["best_return"])) < 1e-4


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_env_step_matches_single_device():
    from jax.sharding import NamedSharding, PartitionSpec as P

    B = 16
    env = mst.make("PushCube-v1", num_envs=B)
    env.reset(seed=3)
    state = env._state
    act = jnp.linspace(-1, 1, B * env.action_dim).reshape(B, env.action_dim)

    step = jax.jit(lambda s, a: jax.vmap(env._step_one)(s, a))
    _, obs_ref, rew_ref, *_ = step(state, act)

    mesh = hierarchical_mesh(("dcn", "ici"), dcn_size=2,
                             devices=jax.devices()[:8])

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == B:
            return jax.device_put(
                x, NamedSharding(
                    mesh, P(("dcn", "ici"), *([None] * (x.ndim - 1)))
                )
            )
        return x

    state_s = jax.tree.map(put, state)
    act_s = put(act)
    _, obs_s, rew_s, *_ = step(state_s, act_s)
    np.testing.assert_allclose(
        np.asarray(obs_ref), np.asarray(obs_s), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(rew_ref), np.asarray(rew_s), atol=1e-5
    )
