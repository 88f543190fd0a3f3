"""Step-logged runs of the still-failing scripted solutions (round 5).

Usage: python tools/dbg_sol_r5.py <env_id>
Wraps env.step with a logger that prints tcp / object poses / success
every 10 steps so the failing phase is visible.
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import maniskill_tpu as mst
from maniskill_tpu.examples.motionplanning.solutions import (
    CONTROL_MODES, SOLUTIONS, _actor_pose, _tcp_pose)

B = 4


class Logger:
    def __init__(self, env, actors):
        self.env = env
        self.actors = actors
        self.i = 0

    def step(self, a):
        out = self.env.step(a)
        if self.i % 10 == 0:
            tcp, _ = _tcp_pose(self.env)
            msg = [f"t={self.i:3d} tcp0={np.round(tcp[0], 3)}"]
            for name in self.actors:
                try:
                    p, q = _actor_pose(self.env, name)
                    msg.append(f"{name}0={np.round(p[0], 3)}")
                except Exception:
                    pass
            info = out[-1]
            succ = np.asarray(info.get("success")).astype(int)
            msg.append(f"succ={succ}")
            for k, v in info.items():
                v = np.asarray(v)
                if k != "success" and v.ndim <= 1 and v.dtype != object:
                    msg.append(f"{k}={np.round(np.asarray(v, float), 3)}")
            print(" ".join(msg), flush=True)
        self.i += 1
        return out


ACTORS = {
    "PullCubeTool-v1": ["l_shape_tool", "cube"],
    "PlugCharger-v1": ["charger"],
    "PegInsertionSide-v1": ["peg"],
    "FoldSuitcase-v1": [],
    "RollBall-v1": ["ball", "goal_region"],
    "LiftPegUpright-v1": ["peg"],
}


def main():
    env_id = sys.argv[1]
    env = mst.make(env_id, num_envs=B,
                   control_mode=CONTROL_MODES.get(env_id, "pd_ee_delta_pos"),
                   robot_init_qpos_noise=0.0)
    env.reset(seed=0)
    rec = Logger(env, ACTORS.get(env_id, []))
    success = SOLUTIONS[env_id](env, recorder=rec)
    print("FINAL", env_id, np.asarray(success))


if __name__ == "__main__":
    main()
