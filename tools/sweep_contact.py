"""Sweep velocity-contact params on the PickCube squeeze: find a chatter-free
(stiffness, beta) operating point. Reports grip-joint oscillation amplitude,
cube drift during an 80-step hold, and grasp retention during a lift."""
import argparse

import jax
import numpy as np

import maniskill_tpu as mst
from maniskill_tpu.examples.motionplanning.solutions import _tcp_and_actor
from maniskill_tpu.physics.model import SimParams


def trial(stiffness, beta, bias_max, vreg, seed=0):
    env = mst.make(
        "PickCube-v1", num_envs=2, control_mode="pd_ee_delta_pos",
        robot_init_qpos_noise=0.0,
        sim_params=SimParams(
            contact_stiffness=stiffness, contact_beta=beta,
            contact_bias_max=bias_max, friction_vreg=vreg,
        ),
    )
    env.reset(seed=seed)
    B = env.num_envs

    def act(dxyz, grip):
        a = np.zeros((B, env.action_dim), np.float32)
        a[:, :3] = dxyz
        a[:, 3] = grip
        return env.step(a)

    def servo(z, steps, gain=3.0, grip=1.0):
        for _ in range(steps):
            tcp, cube = _tcp_and_actor(env, "cube")
            tgt = np.concatenate([cube[:, :2], np.full((B, 1), z)], axis=1)
            act(np.clip((tgt - tcp) * gain, -0.4, 0.4), grip)

    servo(0.10, 30)
    servo(0.05, 25)
    servo(0.022, 25, gain=2.0)
    # close + hold: cube should stay put, grip joints should settle
    qs, cubes = [], []
    for _ in range(40):
        act(np.zeros((B, 3), np.float32), grip=-1.0)
        qs.append(np.asarray(env._state.sim.qpos[:, -2:]))
        cubes.append(np.asarray(
            env._state.sim.free_pose[:, env.model.free_index["cube"], :3]))
    qs, cubes = np.stack(qs), np.stack(cubes)
    q_osc = np.abs(np.diff(qs[8:], axis=0)).max()
    cube_drift = np.linalg.norm(cubes[-1] - cubes[8], axis=-1)
    # lift 1cm/step for 30 steps; grasp retained if cube follows tcp
    for _ in range(30):
        act(np.array([[0, 0, 0.2]] * B, np.float32), grip=-1.0)
    tcp, cube = _tcp_and_actor(env, "cube")
    held = np.abs(tcp[:, 2] - cube[:, 2]) < 0.05
    return dict(q_osc=float(q_osc), cube_drift=cube_drift,
                cube_z=cube[:, 2], held=held)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    combos = [
        (2.0e5, 0.5, 10.0, 0.002),   # current default
        (2.0e4, 0.5, 10.0, 0.002),
        (2.0e5, 0.2, 10.0, 0.002),
        (2.0e4, 0.2, 10.0, 0.002),
        (5.0e4, 0.2, 10.0, 0.002),
        (5.0e4, 0.1, 10.0, 0.002),
    ]
    if args.quick:
        combos = combos[:2]
    for (k, b, bm, vr) in combos:
        r = trial(k, b, bm, vr)
        print(f"k={k:8.0f} beta={b:.2f} bias_max={bm:5.1f} vreg={vr}: "
              f"q_osc={r['q_osc']*1000:6.2f}mm drift={r['cube_drift']} "
              f"held={r['held']} cube_z={r['cube_z']}")


if __name__ == "__main__":
    main()
