"""Keyboard teleoperation of EE-controlled tasks.

Parity port of the reference interactive teleop tool
(``mani_skill/examples/teleoperation/interactive_panda.py`` — click+drag
EE control): here a terminal key loop drives ``pd_ee_delta_pos`` deltas
(w/s: ±x, a/d: ±y, q/e: ±z, g: toggle gripper, r: reset, ESC/ctrl-d:
quit). ``--script`` replays a key string non-interactively (CI-testable
and usable for quick scripted demos); with ``--record-dir`` the episode
is saved in the standard trajectory format.

Usage:
  python -m maniskill_tpu.examples.teleop -e PickCube-v1
  python -m maniskill_tpu.examples.teleop -e PushCube-v1 \
      --script "wwwwassdd" --record-dir demos/
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

import maniskill_tpu as mst

KEY_DELTAS = {
    "w": (0, +1.0), "s": (0, -1.0),
    "a": (1, +1.0), "d": (1, -1.0),
    "q": (2, +1.0), "e": (2, -1.0),
}


def _read_keys_interactive():
    """Yield single keypresses from a raw terminal."""
    import termios
    import tty

    fd = sys.stdin.fileno()
    old = termios.tcgetattr(fd)
    try:
        tty.setraw(fd)
        while True:
            ch = sys.stdin.read(1)
            if ch in ("\x1b", "\x04", ""):
                return
            yield ch
    finally:
        termios.tcsetattr(fd, termios.TCSADRAIN, old)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-e", "--env-id", default="PickCube-v1")
    p.add_argument("--script", default=None,
                   help="replay this key string instead of reading stdin")
    p.add_argument("--record-dir", default=None)
    p.add_argument("--step-size", type=float, default=1.0,
                   help="action magnitude per keypress (normalized)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    env = mst.make(args.env_id, num_envs=1,
                   control_mode="pd_ee_delta_pos")
    if args.record_dir:
        from maniskill_tpu.trajectory import RecordEpisode

        env = RecordEpisode(env, args.record_dir, save_obs=False)
    obs, _ = env.reset(seed=args.seed)
    gripper_open = True
    keys = iter(args.script) if args.script is not None \
        else _read_keys_interactive()
    steps = 0
    for ch in keys:
        if ch == "r":
            env.reset()
            continue
        if ch == "g":
            gripper_open = not gripper_open
            ch = None
        act = np.zeros((1, env.action_dim), np.float32)
        if ch in KEY_DELTAS:
            axis, sgn = KEY_DELTAS[ch]
            act[0, axis] = sgn * args.step_size
        act[0, -1] = 1.0 if gripper_open else -1.0
        obs, rew, term, trunc, info = env.step(act)
        steps += 1
        if args.script is None:
            print(f"\rstep {steps}  reward {float(np.asarray(rew)[0]):.3f} "
                  f"success {bool(np.asarray(info['success'])[0])}   ",
                  end="", flush=True)
    if args.record_dir:
        env.close()
    print(f"\nteleop done: {steps} steps")


if __name__ == "__main__":
    main()
