"""Breakdown: where does an MPPI solve spend time at K=4096, H=50?

(a) physics-only scan, (b) _rollout_step scan (physics + reward),
(c) full MPPI solve (noise gen + rollouts + weighting).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import maniskill_tpu as mst
from maniskill_tpu.planners import MPPI, MPPIConfig

K = int(os.environ.get("K", 4096))
H = int(os.environ.get("H", 50))

env = mst.make("PickCube-v1", num_envs=1, reward_mode="dense",
               robot_init_qpos_noise=0.0)
env.reset(seed=0)
es = jax.tree.map(lambda x: x[0], env._state)
act = jnp.zeros((K, H, env.action_dim))


def timeit(name, fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt * 1e3:.1f} ms")
    return dt


@jax.jit
def physics_only(es, controls):
    def one(es, ctrl):
        def step(st, a):
            sim = env._physics_step(st.sim, st.cmd, env.sim_steps_per_control)
            return st.replace(sim=sim), jnp.float32(0)

        st, rs = jax.lax.scan(step, es, ctrl)
        return rs.sum()

    return jax.vmap(one, in_axes=(None, 0))(es, controls)


@jax.jit
def rollout_full(es, controls):
    def one(es, ctrl):
        def step(st, a):
            st2, r, _ = env._rollout_step(st, a)
            return st2, r

        st, rs = jax.lax.scan(step, es, ctrl)
        return rs.sum()

    return jax.vmap(one, in_axes=(None, 0))(es, controls)


timeit("physics-only scan (H steps, K rollouts)", physics_only, es, act)
timeit("rollout scan (physics+reward)", rollout_full, es, act)

planner = MPPI(env, MPPIConfig(horizon=H, num_samples=K, sigma=0.6,
                               temperature=0.3))
ps = planner.init(seed=0)
ps, _ = planner.solve(ps, es)
jax.block_until_ready(ps.nominal)
t0 = time.perf_counter()
for _ in range(3):
    ps, _ = planner.solve(ps, es)
jax.block_until_ready(ps.nominal)
print(f"full MPPI solve: {(time.perf_counter() - t0) / 3 * 1e3:.1f} ms")


def scan_variant(name, body):
    @jax.jit
    def run(es, controls):
        def one(es, ctrl):
            st, rs = jax.lax.scan(body, es, ctrl)
            return rs.sum()
        return jax.vmap(one, in_axes=(None, 0))(es, controls)
    timeit(name, run, es, act)


from maniskill_tpu.envs.base_env import TaskContext


def v1(st, a):  # physics + controller
    cmd = env.agent.controller.set_action(st.cmd, st.sim.qpos, a)
    sim = env._physics_step(st.sim, cmd, env.sim_steps_per_control)
    return st.replace(sim=sim, cmd=cmd), jnp.float32(0)


def v2(st, a):  # + TaskContext FK
    st, _ = v1(st, a)
    ctx = TaskContext(env, st)
    return st, ctx.body_pos.sum()


def v3(st, a):  # + contact force query
    st, _ = v1(st, a)
    ctx = TaskContext(env, st)
    return st, ctx.contact_forces().sum()


def v4(st, a):  # + evaluate
    st, _ = v1(st, a)
    ctx = TaskContext(env, st)
    info = env.evaluate(st, ctx)
    return st, info["success"].astype(jnp.float32)


scan_variant("v1 physics+controller", v1)
scan_variant("v2 +TaskContext FK", v2)
scan_variant("v3 +contact_forces", v3)
scan_variant("v4 +evaluate", v4)
