"""Planner tests: MPPI/CEM improve returns and run sharded on a multi-device
CPU mesh (BASELINE.json: MPPI/CEM + pjit-sharded rollouts)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import maniskill_tpu as mst
from maniskill_tpu.planners import CEM, CEMConfig, MPPI, MPPIConfig


@pytest.fixture(scope="module")
def push_env():
    return mst.make("PushCube-v1", num_envs=1, reward_mode="dense",
                    robot_init_qpos_noise=0.0)


@pytest.fixture(scope="module")
def env_state0(push_env):
    push_env.reset(seed=0)
    return jax.tree.map(lambda x: x[0], push_env._state)


def test_mppi_improves(push_env, env_state0):
    planner = MPPI(push_env, MPPIConfig(horizon=8, num_samples=32, sigma=0.6,
                                        temperature=0.3))
    ps = planner.init(seed=0)
    ps, info1 = planner.solve(ps, env_state0)
    ps, info2 = planner.solve(ps, env_state0)
    ps, info3 = planner.solve(ps, env_state0)
    assert float(info3["mean_return"]) > float(info1["mean_return"])
    assert np.isfinite(float(info3["best_return"]))


def test_cem_improves(push_env, env_state0):
    planner = CEM(push_env, CEMConfig(horizon=8, num_samples=32, num_elites=8,
                                      iterations=2))
    ps = planner.init(seed=0)
    ps, info = planner.solve(ps, env_state0)
    assert np.isfinite(float(info["best_return"]))


def test_mppi_sharded_mesh(push_env, env_state0):
    """MPPI rollouts sharded over the 8-device virtual CPU mesh."""
    from jax.sharding import Mesh

    devices = np.array(jax.devices()[:8])
    assert len(devices) == 8, "conftest must force 8 host devices"
    mesh = Mesh(devices, axis_names=("rollout",))
    planner = MPPI(
        push_env,
        MPPIConfig(horizon=3, num_samples=16, sigma=0.5),
        mesh=mesh,
    )
    ps = planner.init(seed=0)
    ps, action, info = planner.plan_step(ps, env_state0)
    assert action.shape == (push_env.action_dim,)
    assert bool(jnp.isfinite(action).all())


def test_graft_entry_dryrun():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    ge.dryrun_multichip(8)
