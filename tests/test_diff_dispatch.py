"""Differentiable physics dispatch: gradients flow through sim_backend='auto'.

Round-2 pinned iLQR to sim_backend='xla' because the mega-kernel's
custom_vmap had no JVP rule; the dispatch now carries a custom_jvp whose
tangents ride the XLA step (base_env._build_physics_dispatch). These tests
pin (a) that jacfwd through an 'auto' env works and (b) that its gradients
match the pure-XLA env's.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

import maniskill_tpu as mst
from maniskill_tpu.kinematics import chain


def _grad_of_env(env):
    env.reset(seed=0)
    state = jax.tree.map(lambda x: x[0], env._state)

    def loss(action):
        new_state, obs, reward, term, info = env._step_one(state, action)
        return reward

    a0 = jnp.zeros(env.action_dim)
    return jax.grad(loss)(a0), jax.jacfwd(loss)(a0)


def test_gradients_flow_and_match_xla():
    chain.FORCE_UNROLLED = True  # CPU scan-FK jacfwd lowering bug
    try:
        env_auto = mst.make("PushCube-v1", num_envs=1, reward_mode="dense",
                            sim_backend="auto")
        env_xla = mst.make("PushCube-v1", num_envs=1, reward_mode="dense",
                           sim_backend="xla")
        g_auto, j_auto = _grad_of_env(env_auto)
        g_xla, j_xla = _grad_of_env(env_xla)
        assert np.isfinite(np.asarray(g_auto)).all()
        np.testing.assert_allclose(
            np.asarray(g_auto), np.asarray(g_xla), rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(j_auto), np.asarray(j_xla), rtol=1e-4, atol=1e-6
        )
        assert float(jnp.abs(g_auto).max()) > 0  # not a dead gradient
    finally:
        chain.FORCE_UNROLLED = False


_ILQR_AUTO_SCRIPT = """
import jax, jax.numpy as jnp, numpy as np
import maniskill_tpu as mst
from maniskill_tpu.planners.ilqr import ILQR, ILQRConfig
env = mst.make("PushCube-v1", num_envs=1, reward_mode="dense",
               sim_backend="auto")
planner = ILQR(env, ILQRConfig(horizon=4, iterations=1))
env.reset(seed=0)
state = jax.tree.map(lambda x: x[0], env._state)
controls = jnp.zeros((4, env.action_dim))
new_controls, info = planner.solve(state, controls)
assert np.isfinite(np.asarray(new_controls)).all()
print("ILQR_AUTO_OK")
"""


def test_ilqr_accepts_auto_backend():
    """Runs in a fresh interpreter: compiling this exact program INSIDE a
    long pytest process segfaults XLA:CPU (observed twice at the same
    point, round 5 — an upstream compiler crash that only manifests with
    many live compiled programs; the identical standalone compile passes
    reliably, with and without the 8-device virtual mesh)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-c", _ILQR_AUTO_SCRIPT],
        capture_output=True, text=True, timeout=1500,
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": repo},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ILQR_AUTO_OK" in r.stdout
