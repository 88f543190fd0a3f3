"""Mega-kernel roofline artifact (VERDICT r4 item 10; BASELINE.json
"rollout and QP kernels are profiled to speed-of-light per chip").

For each flagship scene, measures the Pallas mega-kernel's wall time per
substep at K=4096 on the real chip and reports it against the two
hardware ceilings:

- HBM bound: the kernel's HBM traffic is EXACTLY its in/out planes
  (R_in + R_out + const rows) x 4 bytes x K per launch — everything else
  lives in VMEM (that is the kernel's design point). time_sol_hbm =
  bytes / HBM_BW.
- VPU bound: an analytic per-substep vector-op count from the plan
  (FK + narrowphase + per-point pipeline + unrolled Cholesky), at 1024
  f32 lanes/cycle.

%-of-peak = max(time_sol_hbm, time_sol_vpu) / measured. The kernel is
elementwise-dominated (no MXU use by design: tiny 3x3/quaternion algebra
lowers worse through dot_general than through VPU elementwise — PLAN.md
"negative results"), so the VPU ceiling is the honest compute bound.

Usage: python tools/roofline.py [env_id ...]   -> KERNEL_ROOFLINE.json
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

# TPU v5e (lite) public per-chip numbers
HBM_BYTES_PER_S = 819e9      # 819 GB/s
VPU_FLOPS = 1024 * 4 * 940e6 * 1.0  # 8x128 lanes x ~4 ALUs x ~0.94 GHz

FLAGSHIPS = [
    "PushCube-v1", "PickCube-v1", "StackCube-v1", "PegInsertionSide-v1",
    "PlugCharger-v1", "PickSingleHull-v1",
]

K = 4096
SIM_STEPS = 5


def analyze(env_id):
    import maniskill_tpu as mst
    from maniskill_tpu.physics import megakernel as mk

    env = mst.make(env_id, num_envs=K, obs_mode="none")
    env.reset(seed=0)
    model = env.model
    row = dict(env_id=env_id, kernel_supported=bool(mk.supports(model)))
    if not row["kernel_supported"]:
        return row
    plan = mk._plan_for(model)
    n_sub = SIM_STEPS * model.params.substeps
    row.update(nq=plan.nq, n_free=plan.F, n_points=plan.P,
               n_all=plan.n_all, R_in=plan.R_in, R_out=plan.R_out)

    # HBM bytes per LAUNCH (plane in + const + plane out), per substep
    const_rows = plan.nq + plan.F + 10
    bytes_launch = (plan.R_in + plan.R_out) * 4 * K + const_rows * 4 * 128
    bytes_substep = bytes_launch / n_sub
    row["hbm_bytes_per_substep_per_env"] = bytes_substep / K

    # analytic VPU op count per substep per env (each op = 1 f32 lane-op):
    # FK ~60/body, point vel+forces ~120/point, C-rows ~ n_active*9/point,
    # LHS accumulation ~ (n_act^2)*4 per chunk-point, Cholesky n_all^3/3,
    # integration ~80/dof+free. Hull SDF: 2 passes x HULL_F x 8 ops.
    nb, P, n_all, nq, F = plan.nb, plan.P, plan.n_all, plan.nq, plan.F
    hull_evals = mk._hull_cost(model)
    ops = (
        nb * 60
        + P * 120
        + P * n_all * 9
        + P * n_all * n_all * 2
        + n_all ** 3 / 3
        + (nq + 6 * F) * 80
        + hull_evals * mk_hull_ops()
    )
    row["vpu_ops_per_substep_per_env"] = ops

    # jit the kernel call: unjitted, every invocation RE-TRACES the
    # Python-unrolled program (~20 s of host tracing per call) and the
    # measurement reads tracing time, not kernel time
    step = jax.jit(mk.make_pallas_step_fn(model, sim_steps=SIM_STEPS))
    sim = env._state.sim
    cmd = env._state.cmd
    out, _ = step(sim, cmd)
    jax.block_until_ready(out.qpos)
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        out, _ = step(sim, cmd)
    jax.block_until_ready(out.qpos)
    wall = (time.perf_counter() - t0) / reps
    t_substep = wall / n_sub
    row["measured_s_per_substep"] = t_substep
    row["measured_substeps_per_s"] = 1.0 / t_substep

    t_hbm = bytes_launch / HBM_BYTES_PER_S / n_sub
    t_vpu = ops * K / VPU_FLOPS
    row["t_sol_hbm_s"] = t_hbm
    row["t_sol_vpu_s"] = t_vpu
    bound = max(t_hbm, t_vpu)
    row["bound"] = "vpu" if t_vpu >= t_hbm else "hbm"
    row["pct_of_peak"] = round(100.0 * bound / t_substep, 1)
    return row


def mk_hull_ops():
    from maniskill_tpu.physics.hulls import HULL_F

    return 2 * HULL_F * 8


def main():
    ids = sys.argv[1:] or FLAGSHIPS
    rows = []
    for env_id in ids:
        try:
            r = analyze(env_id)
        except Exception as e:  # noqa: BLE001
            r = dict(env_id=env_id, error=f"{type(e).__name__}: {e}")
        rows.append(r)
        print(json.dumps(r), flush=True)
    out = dict(
        hardware="TPU v5e (1 chip)",
        hbm_bytes_per_s=HBM_BYTES_PER_S,
        vpu_flops=VPU_FLOPS,
        K=K,
        note=(
            "kernel HBM traffic = in/out planes only (whole substep loop "
            "in VMEM); pct_of_peak vs the binding ceiling. The kernel is "
            "VPU-bound by design (quaternion/3x3 algebra stays elementwise"
            " — dot_general lowers worse for these shapes)."
        ),
        scenes=rows,
    )
    with open("/root/repo/KERNEL_ROOFLINE.json", "w") as f:
        json.dump(out, f, indent=1)
    print("written KERNEL_ROOFLINE.json")


if __name__ == "__main__":
    main()
