"""PickCube MPC hyperparameter sweep (VERDICT r4 item 2: recover >=0.8).

Diagnosis (round 5): failing episodes reach/grasp/carry fine but never
pass is_robot_static — the importance-weighted nominal inherits per-step
noise and the arm keeps chasing a jittering target near the goal.
Candidate fixes are the new runtime-tunable MPPI knobs (ctrl_cost biases
the nominal toward stillness, noise_beta time-correlates exploration) —
sigma/temperature/ctrl_cost/noise_beta all ride MPPIState as operands, so
every combo after the first REUSES the compiled episode program.

Usage: python tools/tune_pickcube.py   (TPU; writes /tmp/tune_pickcube.json)
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from maniskill_tpu.planners.mpc import solve_task
from maniskill_tpu.planners.mppi import MPPIConfig

ARM7 = [0.4] * 7
COMBOS = [
    # (tag, sigma, temperature, ctrl_cost, noise_beta)
    ("r4-baseline", ARM7 + [0.1], 0.1, 0.0, 0.0),
    ("calm", ARM7 + [0.1], 0.1, 0.02, 0.5),
    ("calm+smooth", [0.35] * 7 + [0.08], 0.08, 0.03, 0.7),
    ("sharp", ARM7 + [0.1], 0.05, 0.05, 0.5),
]


def main():
    results = {}
    for tag, sigma, temp, cc, beta in COMBOS:
        cfg = MPPIConfig(horizon=30, num_samples=4096,
                         sigma=np.asarray(sigma, np.float32),
                         temperature=temp, ctrl_cost=cc, noise_beta=beta)
        t0 = time.time()
        r = solve_task("PickCube-v1", planner="mppi", config=cfg,
                       episodes=5, seed=0, device_loop=True, max_steps=100)
        results[tag] = dict(
            success_rate=r["success_rate"], mean_steps=r["mean_steps"],
            replan_hz=round(r.get("replan_hz", 0.0), 2),
            wall_s=round(time.time() - t0, 1),
            sigma=sigma, temperature=temp, ctrl_cost=cc, noise_beta=beta,
        )
        print(tag, results[tag], flush=True)
    with open("/tmp/tune_pickcube.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
