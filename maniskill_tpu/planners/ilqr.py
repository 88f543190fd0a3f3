"""iLQR/DDP trajectory refinement through the differentiable dynamics.

The reference has no analogue (PhysX is not differentiable); this is the
BASELINE.json north-star refinement stage: linearize the *same* jitted
rollout step used by MPPI/CEM with jax.jacfwd (the compliant contact model is
differentiable), run the Riccati backward pass, and line-search the forward
pass — all inside one jitted solve. Used standalone or to polish an MPPI/CEM
nominal sequence (``CEM with iLQR refinement``, BASELINE config #3).

Reduced-state linearization (round 5): the forward rollouts and line search
step the FULL EnvState (contact warm-start impulses, controller command,
episode counters all carried exactly), but the Riccati pass linearizes only
the dynamic coordinates x = (qpos, qvel, free_pose, free_vel) — nx ≈ 44 for
StackCube instead of >1000 when flattening the whole SimState (geom sizes,
hull tables, impulse caches are not *decision-relevant* state; they ride the
nominal trajectory as per-timestep templates). This is what makes per-replan
refinement affordable on contact-rich scenes: jacfwd tangent width nx, and
(nx x nx) Riccati recursions that stay register/VMEM sized.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class ILQRConfig(NamedTuple):
    horizon: int = 30
    iterations: int = 10
    reg_init: float = 1.0
    reg_factor: float = 10.0
    reg_max: float = 1e6
    action_penalty: float = 1e-3
    line_search_steps: int = 5


class ILQR:
    def __init__(self, env, config: ILQRConfig = ILQRConfig()):
        from ..kinematics import chain

        # jacfwd through the CPU scan-FK trips an XLA lowering bug on
        # batched tangents; the unrolled form differentiates cleanly
        chain.FORCE_UNROLLED = True
        # any sim_backend works: the physics dispatch carries a custom_jvp
        # (primal on the mega-kernel fast path, tangents through the XLA
        # step — base_env._build_physics_dispatch)
        self.env = env
        self.config = config
        self.action_dim = env.action_dim

        # -- reduced dynamic state ------------------------------------------
        sim0 = env.model.initial_state()
        nq = sim0.qpos.shape[-1]
        F = sim0.free_pose.shape[-2] if sim0.free_pose.ndim >= 2 else 0
        nx = 2 * nq + 13 * F
        self.nx = nx

        def reduce_(sim):
            return jnp.concatenate([
                sim.qpos, sim.qvel,
                sim.free_pose.reshape(-1), sim.free_vel.reshape(-1),
            ])

        def inject(sim, x):
            return sim.replace(
                qpos=x[:nq],
                qvel=x[nq:2 * nq],
                free_pose=x[2 * nq:2 * nq + 7 * F].reshape(F, 7),
                free_vel=x[2 * nq + 7 * F:].reshape(F, 6),
            )

        cfg = config
        nu = self.action_dim

        def dyn(x, u, template):
            """One control step on the reduced state; ``template`` is the
            FULL EnvState at this point of the nominal trajectory (cmd,
            impulse warm starts, sizes — everything not in x)."""
            st = template.replace(sim=inject(template.sim, x))
            st2, reward, _ = env._rollout_step(st, u)
            return reduce_(st2.sim), reward

        def cost(x, u, template):
            _, reward = dyn(x, u, template)
            return -reward + cfg.action_penalty * jnp.sum(u * u)

        def full_step(st, u):
            st2, reward, _ = env._rollout_step(st, u)
            c = -reward + cfg.action_penalty * jnp.sum(u * u)
            return st2, c

        def solve(env_state, U0):
            """Refine control sequence U0 (H, nu) from env_state."""

            def rollout(U):
                """Full-state rollout; returns the stacked full states
                (the per-t linearization templates) + total cost."""

                def step(st, u):
                    st2, c = full_step(st, u)
                    return st2, (st, c)

                stT, (traj, cs) = jax.lax.scan(step, env_state, U)
                return traj, jnp.sum(cs)

            f_x = jax.jacfwd(lambda x, u, t: dyn(x, u, t)[0], argnums=0)
            f_u = jax.jacfwd(lambda x, u, t: dyn(x, u, t)[0], argnums=1)
            c_x = jax.grad(cost, argnums=0)
            c_u = jax.grad(cost, argnums=1)

            def iteration(carry, _):
                U, reg, best_cost = carry
                traj, _ = rollout(U)
                xs = jax.vmap(lambda st: reduce_(st.sim))(traj)

                # linearize along the trajectory (template = nominal full
                # state at each t)
                A = jax.vmap(f_x)(xs, U, traj)
                B = jax.vmap(f_u)(xs, U, traj)
                cx = jax.vmap(c_x)(xs, U, traj)
                cu = jax.vmap(c_u)(xs, U, traj)

                # backward Riccati with Gauss-Newton Hessians (cx cxᵀ ≈ 0;
                # identity-scaled regularization instead)
                def backward(carry, t):
                    Vx, Vxx = carry
                    At, Bt = A[t], B[t]
                    Qx = cx[t] + At.T @ Vx
                    Qu = cu[t] + Bt.T @ Vx
                    Qxx = At.T @ Vxx @ At
                    Quu = (
                        Bt.T @ Vxx @ Bt
                        + (2 * cfg.action_penalty + reg) * jnp.eye(nu)
                    )
                    Qux = Bt.T @ Vxx @ At
                    Quu_inv = jnp.linalg.inv(Quu)
                    k = -Quu_inv @ Qu
                    K = -Quu_inv @ Qux
                    Vx_new = Qx + K.T @ Quu @ k + K.T @ Qu + Qux.T @ k
                    Vxx_new = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
                    Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)
                    return (Vx_new, Vxx_new), (k, K)

                (Vx, Vxx), (ks, Ks) = jax.lax.scan(
                    backward,
                    (jnp.zeros(nx), jnp.zeros((nx, nx))),
                    jnp.arange(cfg.horizon - 1, -1, -1),
                )
                ks = ks[::-1]
                Ks = Ks[::-1]

                # line search over step sizes: full-state forward, feedback
                # on the reduced deviation from the nominal
                def try_alpha(alpha):
                    def fwd(carry, t):
                        st, cost_acc = carry
                        dx = reduce_(st.sim) - xs[t]
                        u = U[t] + alpha * ks[t] + Ks[t] @ dx
                        u = jnp.clip(u, -1.0, 1.0)
                        st2, c = full_step(st, u)
                        return (st2, cost_acc + c), u

                    (_, total), Us = jax.lax.scan(
                        fwd, (env_state, 0.0), jnp.arange(cfg.horizon)
                    )
                    return total, Us

                alphas = 0.5 ** jnp.arange(cfg.line_search_steps)
                costs, Us_all = jax.vmap(try_alpha)(alphas)
                costs = jnp.where(jnp.isfinite(costs), costs, jnp.inf)
                best = jnp.argmin(costs)
                new_cost = costs[best]
                improved = new_cost < best_cost
                U_new = jnp.where(improved, Us_all[best], U)
                reg_new = jnp.where(
                    improved,
                    jnp.maximum(reg / cfg.reg_factor, 1e-6),
                    jnp.minimum(reg * cfg.reg_factor, cfg.reg_max),
                )
                return (
                    U_new,
                    reg_new,
                    jnp.minimum(new_cost, best_cost),
                ), new_cost

            _, cost0 = rollout(U0)
            (U, _, final_cost), cost_hist = jax.lax.scan(
                iteration,
                (U0, jnp.float32(cfg.reg_init), cost0),
                None,
                length=cfg.iterations,
            )
            return U, dict(initial_cost=cost0, final_cost=final_cost,
                           cost_history=cost_hist)

        self._solve_fn = solve
        self._solve = jax.jit(solve)

    def solve(self, env_state, U0=None):
        if U0 is None:
            U0 = jnp.zeros((self.config.horizon, self.action_dim))
        return self._solve(env_state, U0)
