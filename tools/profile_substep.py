"""Granular substep cost profile on real hardware.

Builds cut-down variants of the physics substep (FK only, +contacts,
+dynamics, +solve, full) and times each in a 250-iteration scan at K=4096
with the carry folded into the output (the DCE trap — see PLAN.md).

Each variant is CUMULATIVE: variant i includes the work of all variants
before it, so adjacent deltas are the marginal cost of each stage.

Usage:  python tools/profile_substep.py [K]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import maniskill_tpu as mst
from maniskill_tpu.physics import engine as eng


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    env = mst.make("PickCube-v1", num_envs=1, reward_mode="dense",
                   robot_init_qpos_noise=0.0)
    env.reset(seed=0)
    es0 = jax.tree.map(lambda x: x[0], env._state)
    model = env.model
    state0 = es0.sim
    cmd0 = es0.cmd
    nq = model.nq
    n_sub = 250

    tables = eng._assignment_tables(model)
    ref = jnp.asarray(model.robot_base_pose[:3])

    import numpy as np

    from maniskill_tpu.kinematics import chain

    parent_idx = [int(p) for p in model.robot.parent]

    def prefix_sum(x):
        acc = [None] * nq
        for b in range(nq):
            par = parent_idx[b]
            acc[b] = x[b] if par < 0 else acc[par] + x[b]
        return jnp.stack(acc)

    # ---- variants: each takes (sim_state, cmd) -> new sim_state ----------
    full_step = eng.make_step_fn(model)

    def v_fk(state, cmd):
        """FK + joint columns + body velocities only; fake integrate."""
        cols = eng.joint_columns(
            model, *_fk3(state), ref
        )
        v_body = prefix_sum(cols * state.qvel[:, None])
        # fold FK into the state so nothing is DCE'd
        dq = 1e-6 * v_body[-1, :3].sum() * jnp.ones(nq)
        return state.replace(
            qpos=state.qpos + h_ * state.qvel * 0.0 + dq * 0.0 + 1e-9,
            qvel=state.qvel + 1e-9 * cols.sum(),
        )

    def _fk3(state):
        bp, bq, ax = eng.robot_fk(model, state.qpos)
        return bp, ax

    h_ = model.params.dt / model.params.substeps

    def v_fk2(state, cmd):
        bp, bq, ax = eng.robot_fk(model, state.qpos)
        cols = eng.joint_columns(model, bp, ax, ref)
        v_body = prefix_sum(cols * state.qvel[:, None])
        mix = 1e-9 * (bp.sum() + bq.sum() + v_body.sum())
        return state.replace(qpos=state.qpos + 1e-9 + mix * 0.0,
                             qvel=state.qvel * (1.0 + mix))

    def v_contacts(state, cmd):
        bp, bq, ax = eng.robot_fk(model, state.qpos)
        cols = eng.joint_columns(model, bp, ax, ref)
        v_body = prefix_sum(cols * state.qvel[:, None])
        f_vel, f_pos, relam, (cpos, cnrm, cdep, d_n, d_t) = eng.point_forces(
            model, state, bp, bq, v_body, tables
        )
        mix = 1e-9 * (f_vel.sum() + f_pos.sum() + d_n.sum() + d_t.sum())
        return state.replace(qpos=state.qpos + 1e-9,
                             qvel=state.qvel * (1.0 + mix))

    def v_relam(state, cmd):
        bp, bq, ax = eng.robot_fk(model, state.qpos)
        cols = eng.joint_columns(model, bp, ax, ref)
        v_body = prefix_sum(cols * state.qvel[:, None])
        f_vel, f_pos, relam, (cpos, cnrm, cdep, d_n, d_t) = eng.point_forces(
            model, state, bp, bq, v_body, tables
        )
        lam2, lam_t2 = relam(v_body * 1.0001, state.free_vel * 1.0001)
        mix = 1e-9 * (f_vel.sum() + lam2.sum() + lam_t2.sum() + d_t.sum())
        return state.replace(qpos=state.qpos + 1e-9,
                             qvel=state.qvel * (1.0 + mix),
                             contact_lam=lam2, contact_lam_t=lam_t2)

    variants = [
        ("fk+cols+vbody", v_fk2),
        ("(+)contacts", v_contacts),
        ("(+)relam", v_relam),
        ("FULL substep", None),
    ]

    def time_scan(stepper, label):
        @jax.jit
        def run(s0, keys):
            def body(s, k):
                s2 = stepper(s, cmd0)
                return s2, ()
            s, _ = jax.lax.scan(body, s0, keys, length=n_sub)
            return (s.qpos.sum() + s.qvel.sum() + s.free_pose.sum()
                    + s.contact_lam.sum())

        def stepper_full(s, c):
            return full_step(s, c, 1)

        ss = jax.vmap(lambda d: state0.replace(qpos=state0.qpos + d))(
            jax.random.normal(jax.random.key(0), (K, nq)) * 1e-3
        )
        run_v = jax.jit(jax.vmap(lambda s: run(s, None)))
        out = run_v(ss)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = run_v(ss)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 3
        print(f"{label:>16}: {dt*1e3:8.1f} ms total, "
              f"{dt/n_sub*1e3:7.3f} ms/substep", flush=True)
        return dt

    prev = 0.0
    for label, fn in variants:
        if fn is None:
            fn = lambda s, c: full_step(s, c, 1)
        t = time_scan(fn, label)


if __name__ == "__main__":
    main()
