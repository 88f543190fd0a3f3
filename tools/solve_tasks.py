"""Receding-horizon MPC success-rate demonstration (VERDICT item 2).

Runs planners.mpc.solve_task on registered tasks with real MPPI budgets and
writes MPC_RESULTS.json — the committed evidence that the planner stack
takes tasks to success=True end-to-end (reference task-completion analogue:
the scripted motion-planning solutions,
/root/reference/mani_skill/examples/motionplanning/panda/solutions/).

Usage: python tools/solve_tasks.py [task ...]   (default: PushCube, PickCube)
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from maniskill_tpu.planners.mpc import solve_task
from maniskill_tpu.planners.mppi import MPPIConfig

def _cabinet_prior(h):
    """Approach prior: drive the base forward at half speed with the
    shoulder lowering — measured to bring the TCP from 1.0 m to ~0.45 m
    of the handle (inside the tanh reaching gradient) in ~60 steps."""
    nom = np.zeros((h, 13), np.float32)
    nom[:, 11] = 0.5   # base forward
    nom[:, 1] = 0.6    # shoulder lift (arm swings down/forward)
    nom[:, 8] = -0.3   # torso down
    return nom


TASKS = {
    "PushCube-v1": MPPIConfig(horizon=20, num_samples=2048, sigma=0.6,
                              temperature=0.3),
    # per-dim noise: calm gripper channel keeps the grasp closed while the
    # arm explores — 5/5 seeded episodes reach success=True (MPC_RESULTS)
    "PickCube-v1": MPPIConfig(
        horizon=30, num_samples=4096,
        sigma=np.array([0.4] * 7 + [0.1], np.float32), temperature=0.1),
    "PullCube-v1": MPPIConfig(horizon=20, num_samples=2048, sigma=0.6,
                              temperature=0.3),
    "PokeCube-v1": MPPIConfig(horizon=25, num_samples=2048, sigma=0.6,
                              temperature=0.3),
    # cabinet (fetch: arm 7 + gripper 1 + body 3 + base 2 = 13): wide
    # exploration on the arm, calm gripper/torso, mobile base free; the
    # nominal warm start drives the base forward — the reaching reward is
    # flat beyond ~0.4 m, so the approach must come from the prior
    "OpenCabinetDrawer-v1": MPPIConfig(
        horizon=40, num_samples=2048,
        sigma=np.array([0.4] * 7 + [0.15] + [0.1] * 3 + [0.2] * 2,
                       np.float32),
        temperature=0.2,
        nominal_init=_cabinet_prior(40)),
    "TurnFaucet-v1": MPPIConfig(horizon=20, num_samples=2048, sigma=0.5,
                                temperature=0.2),
}


MAX_STEPS = {
    "PickCube-v1": 100,
    "OpenCabinetDrawer-v1": 100,
    "StackCube-v1": 100,
    "PegInsertionSide-v1": 120,
    "PickSingleYCB-v1": 100,
}

# BASELINE.json flagship configs #3-#5 (non-default planner / budgets)
from maniskill_tpu.planners.mpc import CEMILQRConfig
from maniskill_tpu.planners.cem import CEMConfig
from maniskill_tpu.planners.ilqr import ILQRConfig

PLANNERS = {
    # config #3: "StackCube-v1, Panda, CEM with iLQR refinement,
    # contact-rich cost, horizon 60". Split mode (CEM and iLQR as two
    # separate compiled programs, host-sequenced): the fused episode
    # program draws UNAVAILABLE device errors from the remote-compile
    # service on this scene (3/3 repro round 5, kernel and XLA backends
    # alike) — the split programs compile and run.
    "StackCube-v1": ("cem-ilqr-split", CEMILQRConfig(
        cem=CEMConfig(horizon=60, num_samples=1024, num_elites=64,
                      iterations=4, init_sigma=0.5),
        ilqr=ILQRConfig(horizon=60, iterations=3, action_penalty=1e-3),
    )),
    # config #4: "PegInsertionSide-v1, Panda, tight-tolerance contact QP
    # blocks, horizon 80, 16k rollouts"
    "PegInsertionSide-v1": ("mppi", MPPIConfig(
        horizon=80, num_samples=16384,
        sigma=np.array([0.4] * 7 + [0.1], np.float32), temperature=0.1)),
    # config #5 (single-chip shard of the pod-sharded 64k: 8k rollouts/chip;
    # the full 64k sharded program is tools/pod_pick_ycb.py)
    "PickSingleYCB-v1": ("mppi", MPPIConfig(
        horizon=50, num_samples=8192,
        sigma=np.array([0.4] * 7 + [0.1], np.float32), temperature=0.1)),
}


ENV_KWARGS = {
    "StackCube-v1": dict(sim_backend="xla"),
}
# host-loop episodes (run_episode) for planners whose fused episode scan
# exceeds the remote compiler; replan_hz is then the post-compile solve
# rate measured host-side
HOST_LOOP = {"StackCube-v1", "PegInsertionSide-v1"}


def main():
    names = sys.argv[1:] or ["PushCube-v1", "PickCube-v1"]
    results = {}
    try:  # merge into prior chunked runs
        with open("/root/repo/MPC_RESULTS.json") as f:
            results = json.load(f)
    except Exception:
        pass
    for name in names:
        planner, cfg = PLANNERS.get(name) or (
            "mppi", TASKS.get(name, MPPIConfig(horizon=25, num_samples=2048)))
        t0 = time.time()
        # device_loop: plan+step fused in one on-device scan — the replan
        # rate is the real control frequency, not tunnel round-trips.
        # max_steps=2x the registered horizon (grasp-and-place runs need
        # headroom past the TimeLimit; the recorded mean_steps shows which
        # episodes would fit the registered limit)
        r = solve_task(name, planner=planner, config=cfg, episodes=5,
                       seed=0, device_loop=name not in HOST_LOOP,
                       max_steps=MAX_STEPS.get(name),
                       env_kwargs=ENV_KWARGS.get(name))
        wall = time.time() - t0
        base_cfg = cfg.cem if hasattr(cfg, "cem") else cfg
        results[name] = dict(
            success_rate=r["success_rate"],
            mean_steps=r["mean_steps"],
            mean_return=r["mean_return"],
            replan_hz=round(r["replan_hz"], 2),
            planner=planner,
            horizon=base_cfg.horizon,
            num_samples=base_cfg.num_samples,
            episodes=5,
            wall_s=round(wall, 1),
        )
        print(name, results[name], flush=True)
    with open("/root/repo/MPC_RESULTS.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
