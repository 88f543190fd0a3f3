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


@pytest.fixture(scope="module")
def push_env_xla():
    """iLQR differentiates the step: needs the pure-XLA physics backend."""
    return mst.make("PushCube-v1", num_envs=1, reward_mode="dense",
                    robot_init_qpos_noise=0.0, sim_backend="xla")


@pytest.fixture(scope="module")
def env_state0_xla(push_env_xla):
    push_env_xla.reset(seed=0)
    return jax.tree.map(lambda x: x[0], push_env_xla._state)


def test_ilqr_reduces_cost(push_env_xla, env_state0_xla):
    """iLQR refinement must strictly reduce its cost from a zero nominal
    (VERDICT round-2 item 8: iLQR was untested)."""
    from maniskill_tpu.planners.ilqr import ILQR, ILQRConfig

    push_env, env_state0 = push_env_xla, env_state0_xla
    planner = ILQR(push_env, ILQRConfig(horizon=6, iterations=3,
                                        line_search_steps=4))
    U, info = planner.solve(env_state0)
    assert U.shape == (6, push_env.action_dim)
    assert np.isfinite(np.asarray(U)).all()
    ic = float(info["initial_cost"])
    fc = float(info["final_cost"])
    assert np.isfinite(ic) and np.isfinite(fc)
    assert fc < ic - 1e-4, (ic, fc)


def test_ilqr_refines_mppi_nominal(push_env_xla, env_state0_xla):
    """iLQR polishing an MPPI nominal should not make it worse (the
    BASELINE 'CEM/MPPI + iLQR refinement' pipeline)."""
    from maniskill_tpu.planners.ilqr import ILQR, ILQRConfig

    push_env, env_state0 = push_env_xla, env_state0_xla
    mppi = MPPI(push_env, MPPIConfig(horizon=6, num_samples=32, sigma=0.6))
    ps = mppi.init(seed=0)
    ps, _ = mppi.solve(ps, env_state0)
    planner = ILQR(push_env, ILQRConfig(horizon=6, iterations=3,
                                        line_search_steps=4))
    U, info = planner.solve(env_state0, ps.nominal)
    assert float(info["final_cost"]) <= float(info["initial_cost"]) + 1e-6


def test_mppi_nominal_init_prior():
    """MPPIConfig.nominal_init seeds the first solve's nominal (behavior
    prior for sparse-gradient scenes, e.g. the cabinet approach)."""
    import numpy as np

    import maniskill_tpu as mst
    from maniskill_tpu.planners.mppi import MPPI, MPPIConfig

    env = mst.make("PushCube-v1", num_envs=1, obs_mode="none")
    env.reset(seed=0)
    prior = np.full((6, env.action_dim), 0.25, np.float32)
    planner = MPPI(env, MPPIConfig(horizon=6, num_samples=16,
                                   nominal_init=prior))
    ps = planner.init(seed=0)
    assert np.allclose(np.asarray(ps.nominal), prior)
