"""BASELINE config #5: heterogeneous multi-scene PickSingleYCB-v1,
pod-sharded 64k rollouts (reference env:
/root/reference/mani_skill/envs/tasks/tabletop/pick_single_ycb.py:124 —
per-sub-scene object meshes; here per-env hull tables, sizes-as-state).

Runs on the 8-device virtual CPU mesh (dryrun-style — perf on virtual
devices is meaningless, correctness + the compiled program are real):

1. B=64 envs, EACH with a different object model (heterogeneous hull
   tables), K=1024 MPPI rollouts per env, H=50 -> 65,536 rollouts total,
   sharded over a 2x4 (dcn x ici) mesh on the env axis (the pod layout:
   envs ride hosts, rollouts stay chip-local).
2. Collective profile of the compiled sharded solve: op counts + bytes
   moved per solve, from the optimized HLO.
3. Cross-mesh consistency: the 8-device solve must equal the 1-device
   solve to reduction-reordering tolerance.
4. Analytic scaling model (VERDICT r4 item 9): predicted solves/s
   efficiency at 1/2/4 hosts from measured per-solve collective bytes vs
   ICI/DCN bandwidth and the single-chip solve cadence — the number the
   >=80% BASELINE bar will be validated against the moment multi-host
   hardware exists. The same `timed_weak_scaling` entry point IS that
   validation harness (run it with a real mesh).

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python tools/pod_pick_ycb.py
Merges a "pod_pick_ycb" section into MULTICHIP_STUDY.json.
"""
import json
import re
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COLLECTIVE_OPS = ("all-reduce", "all-gather", "reduce-scatter",
                  "collective-permute", "all-to-all")

B = 64          # heterogeneous env instances (64 distinct object models)
K = 1024        # rollouts per env  -> B * K = 65,536 total
H = 50          # horizon (config #2/#5 planning horizon)

# hardware constants for the analytic model (public TPU v5e specs:
# ICI 1600 Gbps/chip aggregate, DCN ~200 Gbps/host; latencies are
# conservative round-trip floors for small all-reduces)
ICI_BYTES_PER_S = 200e9      # 1600 Gbps / 8
DCN_BYTES_PER_S = 25e9       # 200 Gbps / 8
ICI_LATENCY_S = 10e-6        # per collective hop, small-message floor
DCN_LATENCY_S = 150e-6


def build_batched_solver(mesh, env, rollout_axis):
    """vmap the MPPI solve over a batch of heterogeneous env states,
    sharding the ENV axis over the mesh (pod layout: each chip owns
    B/n_chips envs and all K of their rollouts — rollout reductions stay
    chip-local; only batch-level metrics cross chips)."""
    from maniskill_tpu.planners.mppi import MPPI, MPPIConfig

    cfg = MPPIConfig(horizon=H, num_samples=K,
                     sigma=np.array([0.4] * 7 + [0.1], np.float32),
                     temperature=0.1)
    planner = MPPI(env, cfg)  # per-env solve is unsharded internally

    def batched_solve(ps_batch, env_states):
        ps2, info = jax.vmap(planner._solve.__wrapped__
                             if hasattr(planner._solve, "__wrapped__")
                             else planner.solve)(ps_batch, env_states)
        # batch-level scalar metrics are the only cross-chip reduction
        return ps2, dict(best_return=info["best_return"].max(),
                         mean_return=info["mean_return"].mean())

    shard = NamedSharding(mesh, P(rollout_axis))

    def place(ps_batch, env_states):
        ps_batch = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(
                mesh, P(*( (rollout_axis,) + (None,) * (x.ndim - 1) )))),
            ps_batch)
        env_states = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(
                mesh, P(*( (rollout_axis,) + (None,) * (x.ndim - 1) )))),
            env_states)
        return ps_batch, env_states

    return planner, jax.jit(batched_solve), place, shard


def hlo_collectives(compiled_text):
    counts = {op: len(re.findall(rf"\b{op}\b", compiled_text))
              for op in COLLECTIVE_OPS}
    # bytes moved: parse result shapes of all-reduce/all-gather lines
    bytes_total = 0
    for line in compiled_text.splitlines():
        if not any(f"{op}(" in line or f"{op}-start(" in line
                   for op in COLLECTIVE_OPS):
            continue
        m = re.search(r"(f32|f16|bf16|s32|u32|pred)\[([0-9,]*)\]", line)
        if not m:
            continue
        dtype, dims = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        width = {"f32": 4, "s32": 4, "u32": 4, "f16": 2, "bf16": 2,
                 "pred": 1}[dtype]
        bytes_total += n * width
    return counts, bytes_total


def scaling_model(per_solve_bytes, n_collectives, chip_solve_s):
    """Predicted solves/s scaling efficiency: weak scaling (64 envs x K
    per HOST) at 1/2/4 hosts of 8 chips. Per solve, each host overlaps
    compute (fixed, chip_solve_s) with cross-host all-reduces of the
    batch metrics (DCN) and intra-host reductions (ICI)."""
    rows = {}
    for hosts in (1, 2, 4):
        ici_t = n_collectives * ICI_LATENCY_S + per_solve_bytes / ICI_BYTES_PER_S
        dcn_t = 0.0
        if hosts > 1:
            # cross-host: the same collectives ride DCN once per solve
            dcn_t = (n_collectives * DCN_LATENCY_S
                     + per_solve_bytes / DCN_BYTES_PER_S)
        total = chip_solve_s + ici_t + dcn_t
        eff = chip_solve_s / total
        rows[str(hosts)] = dict(
            predicted_solve_s=total,
            predicted_solves_per_s=1.0 / total,
            predicted_efficiency=eff,
        )
    return rows


def timed_weak_scaling(mesh, env, rollout_axis, n_solves=1):
    """Run + time n_solves batched solves on THIS mesh. On a virtual CPU
    mesh the time is meaningless (keep n_solves=1 there — one 64k solve
    costs ~19 min of shared-thread-pool CPU); on real hardware raise
    n_solves: this is the >=80% validation harness (compare solves/s at
    1 host vs N)."""
    planner, solve, place, _ = build_batched_solver(mesh, env, rollout_axis)
    ps0 = planner.init(seed=0)
    ps_batch = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape)
        if x.ndim else jnp.broadcast_to(x[None], (B,)), ps0)
    # per-env planner RNG: fold in the env index
    ps_batch = ps_batch._replace(
        key=jax.vmap(lambda i: jax.random.fold_in(ps0.key, i))(
            jnp.arange(B)))
    env_states = env._state
    ps_batch, env_states = place(ps_batch, env_states)
    # collective profile from the compiled text (compile once, reused by
    # the execution below)
    lowered = jax.jit(solve.__wrapped__
                      if hasattr(solve, "__wrapped__") else solve).lower(
        ps_batch, env_states)
    hlo = lowered.compile().as_text()
    counts, bytes_total = hlo_collectives(hlo)
    t0 = time.perf_counter()
    ps2 = ps_batch
    for _ in range(max(1, n_solves)):
        ps2, info = solve(ps2, env_states)
    jax.block_until_ready(info["best_return"])
    wall = (time.perf_counter() - t0) / max(1, n_solves)
    return ps2, info, wall, counts, bytes_total


def main():
    import maniskill_tpu as mst

    devs = jax.devices()
    n = min(8, len(devs))
    out = {}

    # heterogeneous batch: every env gets a different object model id
    # (PickSingleHullEnv samples per-env model ids from the library at
    # episode init — seeded reset gives 64 distinct assignments)
    env = mst.make("PickSingleYCB-v1", num_envs=B, obs_mode="none",
                   reward_mode="dense", robot_init_qpos_noise=0.0)
    env.reset(seed=0)
    mids = np.asarray(env._state.extras["model_id"])
    out["n_envs"] = B
    out["rollouts_total"] = B * K
    out["horizon"] = H
    out["distinct_models_in_batch"] = int(len(np.unique(mids)))

    if n >= 8:
        from maniskill_tpu.parallel import hierarchical_mesh
        mesh = hierarchical_mesh(("dcn", "ici"), dcn_size=2,
                                 devices=devs[:8])
        axis = ("dcn", "ici")
    else:
        mesh = Mesh(np.array(devs[:n]), ("rollout",))
        axis = "rollout"

    def write(out):
        try:
            with open("/root/repo/MULTICHIP_STUDY.json") as f:
                study = json.load(f)
        except Exception:
            study = {}
        study["pod_pick_ycb"] = out
        with open("/root/repo/MULTICHIP_STUDY.json", "w") as f:
            json.dump(study, f, indent=1)

    ps2, info, wall, counts, bytes_total = timed_weak_scaling(
        mesh, env, axis)
    nominal8 = np.asarray(ps2.nominal)
    out["mesh"] = f"{mesh.shape}"
    out["collectives"] = counts
    out["collective_bytes_per_solve"] = bytes_total
    out["best_return"] = float(info["best_return"])
    out["virtual_wall_s_per_solve"] = wall
    print("8-dev mesh:", out, flush=True)
    write(out)  # incremental: a timeout below must not lose this phase

    # consistency vs a 1-device run of the same program
    mesh1 = Mesh(np.array(devs[:1]), ("rollout",))
    ps1, info1, _, _, _ = timed_weak_scaling(mesh1, env, "rollout",
                                             n_solves=1)
    diff = float(np.abs(np.asarray(ps1.nominal) - nominal8).max())
    out["max_abs_diff_vs_1dev"] = diff
    out["consistent"] = bool(diff < 1e-4)
    print("consistency vs 1-dev:", diff, flush=True)

    # analytic efficiency model, anchored on the REAL single-chip cadence:
    # MPC_RESULTS PickCube (K=4096, H=30) replan rates put one v5e chip at
    # ~50k rollout-steps... use BENCH rollouts/s to derive the 64k-solve
    # time per 8-chip host: (B*K/8 per chip) * H steps / (rollouts/s * H)
    try:
        with open("/root/repo/BENCH_r04.json") as f:
            bench = json.load(f)
        rps = float(bench.get("value", 48000.0))
    except Exception:
        rps = 48000.0
    chip_solve_s = (B * K / 8) / rps  # per-chip shard of the 64k batch
    out["anchor_rollouts_per_s_chip"] = rps
    out["anchor_chip_solve_s"] = chip_solve_s
    out["scaling_model"] = dict(
        assumptions=dict(
            ici_bytes_per_s=ICI_BYTES_PER_S, dcn_bytes_per_s=DCN_BYTES_PER_S,
            ici_latency_s=ICI_LATENCY_S, dcn_latency_s=DCN_LATENCY_S,
            note="weak scaling: 64 envs x 1k rollouts per 8-chip host; "
                 "rollout reductions chip-local, batch metrics cross-chip",
        ),
        predictions=scaling_model(bytes_total, sum(counts.values()),
                                  chip_solve_s),
    )
    print("scaling model:", json.dumps(out["scaling_model"]["predictions"],
                                       indent=1), flush=True)

    try:
        with open("/root/repo/MULTICHIP_STUDY.json") as f:
            study = json.load(f)
    except Exception:
        study = {}
    study["pod_pick_ycb"] = out
    with open("/root/repo/MULTICHIP_STUDY.json", "w") as f:
        json.dump(study, f, indent=1)
    print("written MULTICHIP_STUDY.json [pod_pick_ycb]")


if __name__ == "__main__":
    main()
