"""Instrument solve_pick_cube: where does it fail under velocity contact?"""
import jax
import numpy as np

import maniskill_tpu as mst
from maniskill_tpu.envs.base_env import TaskContext
from maniskill_tpu.examples.motionplanning.solutions import _tcp_and_actor


def main():
    env = mst.make("PickCube-v1", num_envs=2, control_mode="pd_ee_delta_pos",
                   robot_init_qpos_noise=0.0)
    env.reset(seed=0)
    B = env.num_envs

    def act(dxyz, grip):
        a = np.zeros((B, env.action_dim), np.float32)
        a[:, :3] = dxyz
        a[:, 3] = grip
        return env.step(a)

    def servo(target_fn, steps, gain=3.0, grip=1.0):
        out = None
        for _ in range(steps):
            tcp, cube = _tcp_and_actor(env, "cube")
            tgt = target_fn(tcp, cube)
            out = act(np.clip((tgt - tcp) * gain, -0.4, 0.4), grip)
        return out

    servo(lambda tcp, cube: np.concatenate(
        [cube[:, :2], np.full((B, 1), 0.10)], axis=1), steps=30)
    servo(lambda tcp, cube: np.concatenate(
        [cube[:, :2], np.full((B, 1), 0.05)], axis=1), steps=25)
    servo(lambda tcp, cube: np.concatenate(
        [cube[:, :2], np.full((B, 1), 0.022)], axis=1), steps=25, gain=2.0)
    tcp, cube = _tcp_and_actor(env, "cube")
    print("pre-close tcp", tcp[:, 2], "cube", cube[:, 2])
    out = None
    for i in range(8):
        out = act(np.zeros((B, 3), np.float32), grip=-1.0)
        tcp, cube = _tcp_and_actor(env, "cube")
        print(f"close {i}: tcp_z={tcp[:,2]} cube_z={cube[:,2]} "
              f"q_grip={np.asarray(env._state.sim.qpos[:, -2:])}")
    goal = np.asarray(
        env._state.sim.kin_pose[:, env.model.kin_index["goal_site"], :3])
    print("goal", goal)
    for t in range(60):
        tcp, cube = _tcp_and_actor(env, "cube")
        out = act(np.clip((goal - cube) * 3.0, -0.4, 0.4), grip=-1.0)
        if t % 10 == 0 or t > 54:
            info = out[-1]
            d = np.linalg.norm(goal - cube, axis=1)
            print(f"carry {t}: d_goal={d} placed={np.asarray(info['is_obj_placed'])} "
                  f"static={np.asarray(info['is_robot_static'])} "
                  f"grasped={np.asarray(info['is_grasped'])}")
    for t in range(20):
        out = act(np.zeros((B, 3), np.float32), grip=-1.0)
        info = out[-1]
        tcp, cube = _tcp_and_actor(env, "cube")
        d = np.linalg.norm(goal - cube, axis=1)
        qv = np.asarray(env._state.sim.qvel)
        rel = cube - tcp
        print(f"settle {t}: d_goal={d} tcp={tcp[0]} rel={rel[0]} "
              f"|qvel|={np.linalg.norm(qv, axis=-1)} "
              f"success={np.asarray(info['success'])}")
        if t % 5 == 0:
            np.set_printoptions(precision=4, suppress=True)
            print("   qvel0:", qv[0])
            print("   cubev0:", np.asarray(
                env._state.sim.free_vel[0, env.model.free_index['cube']]))


if __name__ == "__main__":
    main()
