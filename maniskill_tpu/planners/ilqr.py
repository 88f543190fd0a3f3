"""iLQR/DDP trajectory refinement through the differentiable dynamics.

The reference has no analogue (PhysX is not differentiable); this is the
BASELINE.json north-star refinement stage: linearize the *same* jitted
rollout step used by MPPI/CEM with jax.jacfwd (the compliant contact model is
differentiable), run the Riccati backward pass, and line-search the forward
pass — all inside one jitted solve. Used standalone or to polish an MPPI/CEM
nominal sequence (``CEM with iLQR refinement``, BASELINE config #3).

State is the flattened sim pytree (qpos, qvel, free poses/vels); cost is the
negative task reward plus an action penalty.
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

        # -- state flattening ------------------------------------------------
        sim0 = env.model.initial_state()
        leaves, treedef = jax.tree_util.tree_flatten(sim0)
        sizes = [int(np.prod(l.shape)) for l in leaves]
        shapes = [l.shape for l in leaves]
        nx = sum(sizes)
        self.nx = nx

        def flatten(sim):
            ls = jax.tree_util.tree_leaves(sim)
            return jnp.concatenate([l.reshape(-1) for l in ls])

        def unflatten(x):
            out, off = [], 0
            for s, shp in zip(sizes, shapes):
                out.append(x[off : off + s].reshape(shp))
                off += s
            return jax.tree_util.tree_unflatten(treedef, out)

        cfg = config
        nu = self.action_dim

        def dyn(x, u, template):
            """One control step on the flat state; template carries the
            non-sim parts of EnvState (cmd, rng, extras)."""
            st = template.replace(sim=unflatten(x))
            st2, reward, _ = env._rollout_step(st, u)
            return flatten(st2.sim), reward

        def cost(x, u, template):
            _, reward = dyn(x, u, template)
            return -reward + cfg.action_penalty * jnp.sum(u * u)

        def solve(env_state, U0):
            """Refine control sequence U0 (H, nu) from env_state."""
            template = env_state
            x0 = flatten(env_state.sim)

            def rollout(U):
                def step(x, u):
                    xn, r = dyn(x, u, template)
                    c = -r + cfg.action_penalty * jnp.sum(u * u)
                    return xn, (x, c)

                xT, (xs, cs) = jax.lax.scan(step, x0, U)
                return xs, xT, jnp.sum(cs)

            f_x = jax.jacfwd(lambda x, u: dyn(x, u, template)[0], argnums=0)
            f_u = jax.jacfwd(lambda x, u: dyn(x, u, template)[0], argnums=1)
            c_x = jax.grad(cost, argnums=0)
            c_u = jax.grad(cost, argnums=1)

            def iteration(carry, _):
                U, reg, best_cost = carry
                xs, xT, _ = rollout(U)

                # linearize along the trajectory
                A = jax.vmap(f_x)(xs, U)
                B = jax.vmap(f_u)(xs, U)
                cx = jax.vmap(lambda x, u: c_x(x, u, template))(xs, U)
                cu = jax.vmap(lambda x, u: c_u(x, u, template))(xs, U)

                # backward Riccati with Gauss-Newton Hessians (cx cxᵀ ≈ 0;
                # use identity-scaled regularization instead)
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
                    (jnp.zeros(self.nx), jnp.zeros((self.nx, self.nx))),
                    jnp.arange(cfg.horizon - 1, -1, -1),
                )
                ks = ks[::-1]
                Ks = Ks[::-1]

                # line search over step sizes
                def try_alpha(alpha):
                    def fwd(carry, t):
                        x, cost_acc = carry
                        u = U[t] + alpha * ks[t] + Ks[t] @ (x - xs[t])
                        u = jnp.clip(u, -1.0, 1.0)
                        xn, r = dyn(x, u, template)
                        c = -r + cfg.action_penalty * jnp.sum(u * u)
                        return (xn, cost_acc + c), u

                    (_, total), Us = jax.lax.scan(
                        fwd, (x0, 0.0), jnp.arange(cfg.horizon)
                    )
                    return total, Us

                alphas = 0.5 ** jnp.arange(cfg.line_search_steps)
                costs, Us_all = jax.vmap(try_alpha)(alphas)
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

            _, _, cost0 = rollout(U0)
            (U, _, final_cost), cost_hist = jax.lax.scan(
                iteration,
                (U0, jnp.float32(cfg.reg_init), cost0),
                None,
                length=cfg.iterations,
            )
            return U, dict(initial_cost=cost0, final_cost=final_cost,
                           cost_history=cost_hist)

        self._solve = jax.jit(solve)

    def solve(self, env_state, U0=None):
        if U0 is None:
            U0 = jnp.zeros((self.config.horizon, self.action_dim))
        return self._solve(env_state, U0)
