"""Isolate: why does one standalone FK per control step cost ~14.5ms at
K=4096 when the whole physics step (2 substeps, each with FK) costs 0.2ms?"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import maniskill_tpu as mst
from maniskill_tpu.physics.engine import robot_fk

K, H = 4096, 50
env = mst.make("PickCube-v1", num_envs=1, reward_mode="dense",
               robot_init_qpos_noise=0.0)
env.reset(seed=0)
es = jax.tree.map(lambda x: x[0], env._state)
model = env.model
act = jnp.zeros((K, H, env.action_dim))
q0 = es.sim.qpos

def timeit(name, fn, *args, n=3):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.1f} ms")

@jax.jit
def fk_only_scan(q0, controls):
    def one(q0, ctrl):
        def body(q, a):
            q = q + 0.01 * jnp.pad(a, (0, q.shape[0] - a.shape[0]))
            bp, bq, ax = robot_fk(model, q)
            return q, bp.sum()
        q, ys = jax.lax.scan(body, q0, ctrl)
        return ys.sum()
    return jax.vmap(one, in_axes=(None, 0))(q0, controls)

timeit("A: FK-only scan (no physics)", fk_only_scan, q0, act)

@jax.jit
def physics_plus_prefk(es, controls):
    def one(es, ctrl):
        def step(st, a):
            # FK on PRE-step qpos (same value physics' first substep uses)
            bp, _, _ = robot_fk(model, st.sim.qpos)
            cmd = env.agent.controller.set_action(st.cmd, st.sim.qpos, a)
            sim = env._physics_step(st.sim, cmd, env.sim_steps_per_control)
            return st.replace(sim=sim, cmd=cmd), bp.sum()
        st, ys = jax.lax.scan(step, es, ctrl)
        return ys.sum()
    return jax.vmap(one, in_axes=(None, 0))(es, controls)

timeit("B: physics + FK on PRE-step qpos", physics_plus_prefk, es, act)

@jax.jit
def physics_plus_postfk(es, controls):
    def one(es, ctrl):
        def step(st, a):
            cmd = env.agent.controller.set_action(st.cmd, st.sim.qpos, a)
            sim = env._physics_step(st.sim, cmd, env.sim_steps_per_control)
            bp, _, _ = robot_fk(model, sim.qpos)
            return st.replace(sim=sim, cmd=cmd), bp.sum()
        st, ys = jax.lax.scan(step, es, ctrl)
        return ys.sum()
    return jax.vmap(one, in_axes=(None, 0))(es, controls)

timeit("C: physics + FK on POST-step qpos", physics_plus_postfk, es, act)
